"""Wave-68 ops: trigram novelty vs train (ops/novelty.py) and
integer-exact PageRank (ops/pagerank.py) — hand-computed identities,
layout invariance, dangling/edge-case behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_novelty_hand_computed_and_edge_cases():
    import ray.data as rd

    from ocr_service_ray.ops.novelty import novelty_report

    train = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c d", "b c d e"], pa.string()),
        }
    )
    val = pa.table(
        {
            "doc_id": pa.array([3, 4, 5], pa.int64()),
            # doc 3: grams {a b c (seen), b c x (new)} → 500000
            # doc 4: ONE distinct gram {z z z} (new) → 1000000
            # doc 5: too short for a trigram → vacuous novelty
            "text": pa.array(["a b c x", "z z z z", "hi there"], pa.string()),
        }
    )
    out = novelty_report(rd.from_arrow(train), rd.from_arrow(val), n=3)
    assert list(out["doc_id"]) == [3, 4, 5]
    assert list(out["n_grams"]) == [2, 1, 0]
    assert list(out["n_seen"]) == [1, 0, 0]
    assert list(out["novelty_ppm"]) == [500000, 1000000, 1000000]


def test_novelty_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.novelty import novelty_report

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 20)))
        for _ in range(120)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(120), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    tr, va = tbl.slice(0, 80), tbl.slice(80)
    o1 = novelty_report(rd.from_arrow(tr), rd.from_arrow(va))
    o2 = novelty_report(
        rd.from_arrow(tr).repartition(7), rd.from_arrow(va).repartition(5)
    )
    assert o1.equals(o2)


def _pr_reference(edges: pd.DataFrame, iters: int) -> pd.DataFrame:
    """One-process reference implementing the identical integer
    arithmetic (floor-div per edge, then sum)."""
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    outw = edges.groupby("src")["w"].sum().to_dict()
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for _, e in edges.iterrows():
            inflow[e["dst"]] += (rank[e["src"]] * e["w"]) // outw[e["src"]]
        rank = {n: 150_000 + (85 * inflow[n]) // 100 for n in nodes}
    return pd.DataFrame(
        {"node": nodes, "rank_ppm": [rank[n] for n in nodes]}
    ).astype("int64")


def test_pagerank_matches_reference_and_layout_invariant():
    import ray.data as rd

    from ocr_service_ray.ops.pagerank import pagerank

    rng = np.random.default_rng(3)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 20, 200),
            "dst": rng.integers(0, 20, 200),
            "w": rng.integers(1, 5, 200),
        }
    ).astype("int64")
    ref = _pr_reference(edges, iters=3)
    got = pagerank(rd.from_pandas(edges), weight_col="w", iters=3)
    assert got.astype("int64").equals(ref)
    got2 = pagerank(
        rd.from_pandas(edges).repartition(9), weight_col="w", iters=3
    )
    assert got2.astype("int64").equals(ref)


def test_pagerank_dangling_and_source_nodes():
    import ray.data as rd

    from ocr_service_ray.ops.pagerank import pagerank

    # 0 -> 1 -> 2 ; 2 has no out-edges (dangling: mass leaks),
    # 0 has no in-edges (sits at the damping floor)
    edges = pd.DataFrame({"src": [0, 1], "dst": [1, 2]}).astype("int64")
    out = pagerank(rd.from_pandas(edges), iters=2)
    r = dict(zip(out["node"], out["rank_ppm"]))
    assert r[0] == 150_000  # damping floor after round 1
    # round1: r1 = 150000+850000 = 1000000 for nodes 1,2
    # round2: node1 inflow = r0'=150000 → 150000 + 127500 = 277500
    #         node2 inflow = r1'=1000000 → 150000 + 850000 = 1000000
    assert r[1] == 277_500
    assert r[2] == 1_000_000
