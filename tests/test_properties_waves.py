"""Property-based invariants for the session-2 operator waves.

Hypothesis drives the INPUT shapes; the properties are algebraic
(conservation / reassembly / bounds), so they hold for any data:

- chunking with stride == chunk_size partitions the token list
  exactly (concatenation round-trips);
- span corruption conserves tokens (corrupted slots + target tokens
  rebuild the original);
- integer CUME_DIST is monotone in value, ends at exactly 1e6, and
  ties share a value;
- triangle counting is invariant under edge duplication/reversal.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

TOKEN = st.text(alphabet="abcxyz", min_size=1, max_size=4)
TEXT = st.lists(TOKEN, min_size=1, max_size=40).map(" ".join)


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(TEXT, min_size=1, max_size=6), size=st.integers(1, 7))
def test_chunking_partitions_exactly(ray_session, texts, size):
    from ocr_service_ray.ops.chunking import chunk_tokens

    out = (
        chunk_tokens(
            _ds({"doc_id": list(range(len(texts))), "text": texts}),
            chunk_size=size,
            stride=size,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    for i, t in enumerate(texts):
        rebuilt = " ".join(out[out["doc_id"] == i]["chunk_text"])
        assert rebuilt == t


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(TEXT, min_size=1, max_size=6),
    every=st.integers(2, 6),
    phase=st.integers(0, 5),
)
def test_span_corruption_conserves_tokens(ray_session, texts, every, phase):
    from ocr_service_ray.ops.chunking import span_corruption

    phase = phase % every
    out = (
        span_corruption(
            _ds({"doc_id": list(range(len(texts))), "text": texts}),
            every=every,
            phase=phase,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, t in enumerate(texts):
        corr = out.loc[i, "corrupted"].split(" ")
        targ = out.loc[i, "target"].split(" ") if out.loc[i, "target"] else []
        orig = t.split(" ")
        assert len(corr) == len(orig)
        it = iter(targ)
        rebuilt = [next(it) if c == "<mask>" else c for c in corr]
        assert rebuilt == orig
        assert out.loc[i, "n_masked"] == len(targ)


@settings(max_examples=10, deadline=None)
@given(vals=st.lists(st.integers(-100, 100), min_size=1, max_size=50))
def test_cume_dist_micro_bounds_and_monotone(ray_session, vals):
    from ocr_service_ray.ops.window import cume_dist_micro

    out = (
        cume_dist_micro(
            _ds({"k": ["g"] * len(vals), "i": list(range(len(vals))), "v": vals}),
            "k",
            "v",
            "i",
        )
        .to_pandas()
        .set_index("i")
        .sort_index()
    )
    cume = out["cume_micro"].to_numpy()
    v = np.asarray(vals)
    assert cume.max() == 1_000_000
    assert (cume >= 1_000_000 // len(vals)).all()
    order = np.argsort(v, kind="mergesort")
    assert (np.diff(cume[order]) >= 0).all()
    # ties share a cume value
    for x in set(vals):
        assert len(set(cume[v == x])) == 1


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=60
    )
)
def test_triangles_invariant_to_dup_and_reversal(ray_session, edges):
    from ocr_service_ray.ops.triangles import triangle_count

    a = triangle_count(
        _ds({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    )
    noisy = edges + [(b, a_) for a_, b in edges] + edges[:3]
    b = triangle_count(
        _ds({"src": [e[0] for e in noisy], "dst": [e[1] for e in noisy]})
    )
    assert a.iloc[0].tolist() == b.iloc[0].tolist()


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(TEXT, min_size=2, max_size=8),
    dup_idx=st.integers(0, 1),
    t_pct=st.sampled_from([30, 50, 70]),
)
def test_jaccard_pair_join_lossless_vs_brute_force(
    ray_session, texts, dup_idx, t_pct
):
    """Prefix filtering must be LOSSLESS: for any corpus and
    threshold, the PPJoin result equals the all-pairs brute force
    (no false negatives from the prefix prune, no false positives
    from candidate generation). A near-duplicate of one doc is
    planted so the non-empty path is exercised too."""
    from ocr_service_ray.ops.similarity import jaccard_pair_join

    texts = list(texts) + [texts[dup_idx] + " zz"]
    ids = list(range(len(texts)))
    t_ppm = t_pct * 10_000
    got = jaccard_pair_join(
        _ds({"doc_id": ids, "text": texts}),
        "doc_id",
        "text",
        ngram=2,
        threshold_ppm=t_ppm,
    ).to_pandas()
    if len(got) == 0:
        # ray 2.49 to_pandas drops the schema for zero-row datasets
        got = pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in
             ("id_a", "id_b", "n_inter", "jac_ppm")}
        )
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    sets = {}
    for i, t in zip(ids, texts):
        ws = t.split()
        sets[i] = {" ".join(ws[j : j + 2]) for j in range(len(ws) - 1)}
    expect = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            if not a or not b:
                continue
            ni = len(a & b)
            jp = (1_000_000 * ni) // (len(a) + len(b) - ni)
            if jp >= t_ppm:
                expect.append((ids[x], ids[y], ni, jp))
    got_t = [
        tuple(int(v) for v in row)
        for row in got[["id_a", "id_b", "n_inter", "jac_ppm"]].to_numpy()
    ]
    assert got_t == sorted(expect)
