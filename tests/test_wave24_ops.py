"""Wave-24 ops: bounded-round BFS reach and intra-class scatter — vs
brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def test_khop_reach_path_graph():
    from ocr_service_ray.ops.graph import khop_reach

    # path 1-2-3-4-5 plus an isolated edge 10-11
    lo = [1, 2, 3, 4, 10]
    hi = [2, 3, 4, 5, 11]
    out = (
        khop_reach(_ds({"lo": lo, "hi": hi}), [1], hops=3)
        .set_index("hop")["n_nodes"]
        .to_dict()
    )
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}  # 1 -> 2 -> 3 -> 4
    # star: seed reaches all leaves in one hop, nothing at hop 2
    star = (
        khop_reach(
            _ds({"lo": [0, 0, 0], "hi": [7, 8, 9]}), [0], hops=2
        )
        .set_index("hop")["n_nodes"]
        .to_dict()
    )
    assert star == {0: 1, 1: 3, 2: 0}


def test_khop_reach_multi_seed_dedup():
    from ocr_service_ray.ops.graph import khop_reach

    # triangle 1-2-3; seeds {1, 2} -> hop1 = {3} only (1, 2 visited)
    out = (
        khop_reach(
            _ds({"lo": [1, 2, 1], "hi": [2, 3, 3]}), [1, 2], hops=2
        )
        .set_index("hop")["n_nodes"]
        .to_dict()
    )
    assert out == {0: 2, 1: 1, 2: 0}


def test_label_dispersion_matches_pairwise():
    from ocr_service_ray.ops.vector import label_dispersion

    rng = np.random.RandomState(17)
    emb = rng.randn(60, 6).astype(np.float32)
    lab = rng.randint(0, 3, 60)
    out = label_dispersion(
        _ds({"label": lab.tolist(), "embedding": emb.tolist()}), "label"
    ).set_index("label")
    q = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(object)
    for L in np.unique(lab):
        sub = q[lab == L]
        n = len(sub)
        # brute-force pairwise sum of squared distances / 2
        d = 0
        for i in range(n):
            for j in range(i + 1, n):
                diff = sub[i] - sub[j]
                d += int((diff * diff).sum())
        assert out.loc[L, "scatter_num"] == d
        assert out.loc[L, "n"] == n
        assert out.loc[L, "mean_pd2_micro"] == (2 * d) // (n * n * 1_000_000)
    # a label whose vectors are identical has zero scatter
    same = label_dispersion(
        _ds({"label": [9, 9], "embedding": [[1.0, 2.0], [1.0, 2.0]]}), "label"
    )
    assert same["scatter_num"].iloc[0] == 0
