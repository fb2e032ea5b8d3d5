"""Connected components / canonical-keep (ops/graph.py): exact labels
vs a union-find oracle, multi-round convergence on chains, empty and
string-id edges, canonical survivor filtering."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_service_ray.ops.graph import connected_components, keep_canonical


def _uf_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    return {x: find(x) for x in list(parent)}


def _run(pairs, **kw):
    import ray.data as rd

    t = pa.table(
        {
            "id_a": pa.array([p[0] for p in pairs]),
            "id_b": pa.array([p[1] for p in pairs]),
        }
    )
    ds = connected_components(rd.from_arrow(t), **kw)
    assert ds.schema().names == ["node", "cluster_id"]
    out = ds.to_pandas()
    if out.empty:  # Ray's to_pandas drops columns on zero-row datasets
        return {}
    return dict(zip(out["node"], out["cluster_id"]))


def test_matches_union_find(ray_session):
    # two cliques, one chain, one isolated pair
    pairs = [
        (1, 2), (2, 3), (1, 3),          # clique {1,2,3}
        (10, 11), (11, 12), (12, 13),    # chain 10-11-12-13
        (20, 21),                        # pair
        (5, 3),                          # attaches 5 to the clique
    ]
    assert _run(pairs) == _uf_oracle(pairs)


def test_deep_chain_needs_multiple_rounds(ray_session):
    # a 12-node path through the DISTRIBUTED loop: min label must
    # propagate the full diameter
    pairs = [(i + 1, i) for i in range(11)]
    got = _run(pairs, driver_threshold=0)
    assert set(got.values()) == {0}
    assert len(got) == 12


def test_driver_and_distributed_paths_agree(ray_session):
    rng = np.random.default_rng(21)
    pairs = [tuple(map(int, rng.integers(0, 40, 2))) for _ in range(60)]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run(pairs) == _run(pairs, driver_threshold=0)


def test_string_ids(ray_session):
    for kw in ({}, {"driver_threshold": 0}):
        got = _run([("b", "a"), ("b", "c"), ("x", "y")], **kw)
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_empty_pairs(ray_session):
    assert _run([]) == {}


def test_random_graph_matches_oracle(ray_session):
    rng = np.random.default_rng(7)
    pairs = [tuple(map(int, rng.integers(0, 60, 2))) for _ in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    # distributed path (driver_threshold=0) against the pure-Python oracle
    assert _run(pairs, driver_threshold=0) == _uf_oracle(pairs)


def test_keep_canonical(ray_session):
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(8)]),
        }
    )
    pairs = pa.table(
        {
            "id_a": pa.array([1, 2, 5], pa.int64()),
            "id_b": pa.array([2, 3, 6], pa.int64()),
        }
    )
    kept = (
        keep_canonical(rd.from_arrow(docs), rd.from_arrow(pairs))
        .to_pandas()["doc_id"]
        .tolist()
    )
    # cluster {1,2,3} keeps 1; {5,6} keeps 5; untouched docs survive
    assert sorted(kept) == [0, 1, 4, 5, 7]


def test_keep_canonical_no_pairs(ray_session):
    import ray.data as rd

    docs = pa.table({"doc_id": pa.array(range(4), pa.int64())})
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    kept = keep_canonical(rd.from_arrow(docs), rd.from_arrow(empty)).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [0, 1, 2, 3]


def test_deep_chain_converges_logarithmically(ray_session):
    """A 200-node path must converge well under max_iters thanks to
    per-round pointer jumping (VERDICT r2: plain min-propagation needs
    ~diameter rounds and used to RAISE here)."""
    pairs = [(i + 1, i) for i in range(199)]
    got = _run(pairs, driver_threshold=0, max_iters=12)  # ~log2(200)+slack
    assert set(got.values()) == {0}
    assert len(got) == 200


def test_nonconvergence_guard(ray_session):
    import ray.data as rd

    pairs = pa.table(
        {
            "id_a": pa.array([1, 2], pa.int64()),
            "id_b": pa.array([2, 3], pa.int64()),
        }
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_arrow(pairs), max_iters=0, driver_threshold=0)


@pytest.mark.parametrize("nblocks,threshold", [(1, 1_000_000), (4, 0)])
def test_pagerank_int_matches_reference(ray_session, nblocks, threshold):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.graph import pagerank_int

    # undirected triangle + pendant: 1-2, 2-3, 1-3, 3-4
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = pd.DataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und],
        columns=["src", "dst"],
    ).astype("int64")
    ds = rd.from_arrow(pa.Table.from_pandas(edges, preserve_index=False)).repartition(
        nblocks
    )
    # threshold=0 forces the distributed loop; both paths must agree
    out = (
        pagerank_int(ds, "src", "dst", iters=4, driver_threshold=threshold)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    # integer reference: identical floor-division arithmetic
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    deg = edges.groupby("src").size().to_dict()
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(4):
        contrib = {n: 0 for n in nodes}
        for _, row in edges.iterrows():
            contrib[row["dst"]] += rank[row["src"]] // deg[row["src"]]
        rank = {n: 150_000 + (85 * contrib[n]) // 100 for n in nodes}
    ref = pd.DataFrame(
        {"node": nodes, "rank_micro": [rank[n] for n in nodes]}
    ).astype({"node": "int64", "rank_micro": "int64"})
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # the hub (node 3, degree 3) outranks the pendant (node 4)
    r = dict(zip(out["node"], out["rank_micro"]))
    assert r[3] > r[1] > r[4]
