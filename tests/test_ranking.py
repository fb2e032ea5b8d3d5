"""TF-IDF / BM25 (ops/ranking.py): df combiner vs Counter reference,
top-k term selection with tie rules, BM25 score vs a straight-line
Python implementation, tf token-boundary correctness."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from ocr_service_ray.ops.ranking import (
    _rational_idf,
    bm25_search,
    term_doc_freq,
    tfidf_topk_terms,
)

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cat dog cat dog cat",
    "unique words only here",
    "the the the the",
]


def _tbl():
    return pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS),
        }
    )


def test_term_doc_freq(ray_session):
    import ray.data as rd

    got = term_doc_freq(rd.from_arrow(_tbl())).to_pandas()
    ref = Counter()
    for d in DOCS:
        ref.update(set(d.split(" ")))
    assert dict(zip(got["term"], got["df"])) == dict(ref)


def test_tfidf_topk(ray_session):
    import ray.data as rd

    out = tfidf_topk_terms(rd.from_arrow(_tbl()), k=2).to_pandas()
    n = len(DOCS)
    ref_df = Counter()
    for d in DOCS:
        ref_df.update(set(d.split(" ")))

    for doc_id, d in enumerate(DOCS):
        counts = Counter(d.split(" "))
        ranked = sorted(
            ((-tf * _rational_idf(n, np.float64(ref_df[t])), t) for t, tf in counts.items())
        )[:2]
        got = out[out["doc_id"] == doc_id].sort_values(
            ["score", "term"], ascending=[False, True]
        )
        assert list(got["term"]) == [t for _, t in ranked]
        assert np.allclose(list(got["score"]), [-s for s, _ in ranked])


def test_bm25_matches_reference(ray_session):
    import ray.data as rd

    q = ["cat", "dog", "mat"]
    out = bm25_search(rd.from_arrow(_tbl()), q, k=5).to_pandas()

    # straight-line reference
    k1, b = 1.2, 0.75
    toks = [d.split(" ") for d in DOCS]
    dls = [len(t) for t in toks]
    avgdl = sum(dls) / len(DOCS)
    n = len(DOCS)
    dfs = {t: sum(1 for tk in toks if t in tk) for t in q}
    ref = []
    for i, tk in enumerate(toks):
        s = 0.0
        for t in q:
            tf = float(tk.count(t))
            idf = (n - dfs[t] + 0.5) / (dfs[t] + 0.5)
            s = s + idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dls[i] / avgdl)))
        ref.append((s, i))
    ref.sort(key=lambda x: (-x[0], x[1]))

    assert list(out["doc_id"]) == [i for _, i in ref[:5]]
    # bit-exact float contract (the oracle-parity requirement)
    assert list(out["score"]) == [s for s, _ in ref[:5]]


def test_tfidf_broadcast_equals_shuffle(ray_session):
    """The two strategies must return IDENTICAL rows — same pairing
    contract as ngrams broadcast/shuffle. Includes an empty doc (the
    '' term) and heavy repetition."""
    import ray.data as rd

    docs = DOCS + ["", "cat cat cat", "the mat"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    cols = ["doc_id", "term", "tf", "score"]
    a = (
        tfidf_topk_terms(rd.from_arrow(t), k=2, strategy="broadcast")
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    b = (
        tfidf_topk_terms(rd.from_arrow(t), k=2, strategy="shuffle")
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    # bit-exact equality, scores included (same IEEE ops in both paths)
    assert a.equals(b)
    # every doc present in both
    assert set(a["doc_id"]) == set(range(len(docs)))


def test_tfidf_unknown_strategy(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        tfidf_topk_terms(rd.from_arrow(_tbl()), strategy="nope")


def test_bm25_stats_path_tier(ray_session, tmp_path):
    """stats_path writes the int projection as parquet and reads it
    back — identical result to the object-store pin."""
    import ray.data as rd

    q = ["cat", "dog", "mat"]
    a = bm25_search(rd.from_arrow(_tbl()), q, k=5).to_pandas()
    b = bm25_search(
        rd.from_arrow(_tbl()), q, k=5, stats_path=str(tmp_path / "bm25_stats")
    ).to_pandas()
    assert a.equals(b)
    # the tier actually wrote the projection
    import os

    assert any(
        f.endswith(".parquet") for f in os.listdir(tmp_path / "bm25_stats")
    )


def test_bm25_token_boundaries(ray_session):
    # "cat" must not match "catalog" or "concat"
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["catalog concat scatter", "cat"]),
        }
    )
    out = bm25_search(rd.from_arrow(t), ["cat"], k=2).to_pandas()
    by = dict(zip(out["doc_id"], out["score"]))
    assert by[1] > 0.0 and by[0] == 0.0
