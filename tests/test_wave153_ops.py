"""Wave-153 ops: condensation DAG layering — closed forms, layer
semantics, cycle contraction, Jacobi fixed-round convergence."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.condensation import condensation_layers


def test_chain_layers():
    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    out = condensation_layers(edges).set_index("scc_id")
    assert list(out["layer"]) == [0, 1, 2, 3]
    assert (out["scc_size"] == 1).all()
    assert out.loc[0, "n_preds"] == 0 and out.loc[3, "n_succs"] == 0


def test_cycle_contracts_to_one_layer_node():
    # cycle {1,2,3} feeding node 9: condensation is 1 -> 9
    edges = pd.DataFrame({"src": [1, 2, 3, 3], "dst": [2, 3, 1, 9]})
    out = condensation_layers(edges).set_index("scc_id")
    assert list(out.index) == [1, 9]
    assert out.loc[1, "scc_size"] == 3 and out.loc[1, "layer"] == 0
    assert out.loc[9, "layer"] == 1
    assert out.loc[1, "n_succs"] == 1 and out.loc[9, "n_preds"] == 1


def test_diamond_longest_path():
    # 0->1->3, 0->2->3 plus long arm 0->4->5->3: layer(3) = 3
    edges = pd.DataFrame(
        {"src": [0, 1, 0, 2, 0, 4, 5], "dst": [1, 3, 2, 3, 4, 5, 3]}
    )
    out = condensation_layers(edges).set_index("scc_id")
    assert out.loc[3, "layer"] == 3
    assert out.loc[3, "n_preds"] == 3


def test_random_layer_invariants():
    rng = np.random.RandomState(153)
    for _ in range(10):
        m = int(rng.randint(5, 30))
        src = rng.randint(0, 10, m)
        dst = rng.randint(0, 10, m)
        keep = src != dst
        edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        if not len(edges):
            continue
        out = condensation_layers(edges)
        lay = dict(zip(out["scc_id"], out["layer"]))
        # rebuild condensation edges and check layer(b) >= layer(a)+1
        from ocr_service_ray.ops.scc import tarjan_scc

        scc = tarjan_scc(edges)
        comp = dict(zip(scc["node"], scc["scc_id"]))
        for a, b in zip(edges["src"], edges["dst"]):
            ca, cb = comp[int(a)], comp[int(b)]
            if ca != cb:
                assert lay[cb] >= lay[ca] + 1
        # sources are exactly layer 0
        for _, r in out.iterrows():
            assert (r["layer"] == 0) == (r["n_preds"] == 0)
