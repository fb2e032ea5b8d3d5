"""Duplicate n-gram span detection (ops/ngrams.py): strategy
equivalence, planted-boilerplate behavior, coverage arithmetic."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_service_ray.ops.ngrams import (
    _coverage,
    _doc_grams,
    duplicate_ngram_stats,
    strip_duplicate_spans,
)

BOILER = "all rights reserved contact us at example dot com"
DOCS = pa.table(
    {
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(
            [
                f"unique document zero about rivers {BOILER}",
                f"{BOILER} unique document one about mountains",
                "a short one",  # < n tokens: no grams at n=5? (3 < 5)
                "totally unique text with no shared spans at all here",
                f"middle text {BOILER} trailing words here",
                "another clean document with its own words only",
            ]
        ),
    }
)


def _run(ray_session, strategy):
    import ray.data as rd

    out = (
        duplicate_ngram_stats(rd.from_arrow(DOCS), n=5, min_df=2, strategy=strategy)
        .to_pandas()[
            ["doc_id", "n_tokens", "hot_gram_occurrences", "dup_token_count"]
        ]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


def test_strategies_agree_and_find_boilerplate(ray_session):
    a = _run(ray_session, "broadcast")
    b = _run(ray_session, "shuffle")
    assert a.equals(b.astype(a.dtypes.to_dict()))

    by_id = a.set_index("doc_id")
    # the three boilerplate carriers are flagged, the clean docs are not
    assert (by_id.loc[[0, 1, 4], "dup_token_count"] >= 9).all()
    assert (by_id.loc[[2, 3, 5], "dup_token_count"] == 0).all()
    assert (by_id.loc[[2, 3, 5], "hot_gram_occurrences"] == 0).all()
    # every doc present, n_tokens = single-space split length
    assert by_id.loc[2, "n_tokens"] == 3


def test_strip_removes_shared_span(ray_session):
    import ray.data as rd

    out = (
        strip_duplicate_spans(rd.from_arrow(DOCS), n=5, min_df=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert BOILER not in out.loc[0, "clean_text"]
    assert BOILER not in out.loc[1, "clean_text"]
    assert "unique document zero" in out.loc[0, "clean_text"]
    # clean docs untouched
    assert out.loc[3, "clean_text"] == out.loc[3, "text"]
    assert out.loc[5, "clean_text"] == out.loc[5, "text"]


def test_doc_grams_edges():
    assert len(_doc_grams("a b", 3)) == 0
    assert len(_doc_grams("a b c d", 3)) == 2
    # key = int64 of the first 15 md5 hex chars of the joined gram
    # (the DuckDB-parity contract via _hex_bigint_sql)
    import hashlib

    assert _doc_grams("x y z", 3).tolist() == [
        int(hashlib.md5(b"x y z").hexdigest()[:15], 16)
    ]


def test_doc_grams_fast_mode():
    """Fast keys: 60-bit range, positionally aligned with oracle keys,
    same-gram → same-key across documents."""
    g1 = _doc_grams("a b c d", 3, hash="fast")
    assert len(g1) == 2 and g1.dtype == np.int64 and (g1 >= 0).all()
    g2 = _doc_grams("x a b c d", 3, hash="fast")
    # the "a b c" and "b c d" grams hash identically wherever they occur
    assert g1[0] == g2[1] and g1[1] == g2[2]
    assert len(_doc_grams("a b", 3, hash="fast")) == 0


def test_stats_fast_equals_oracle(ray_session):
    """hash="fast" must produce IDENTICAL statistics to the md5 oracle
    mode (only the internal key values differ) — both strategies."""
    import ray.data as rd

    for strategy in ("broadcast", "shuffle"):
        a = (
            duplicate_ngram_stats(
                rd.from_arrow(DOCS), n=5, min_df=2, strategy=strategy, hash="oracle"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            duplicate_ngram_stats(
                rd.from_arrow(DOCS), n=5, min_df=2, strategy=strategy, hash="fast"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        cols = ["doc_id", "n_tokens", "hot_gram_occurrences", "dup_token_count"]
        assert a[cols].equals(b[cols].astype(a[cols].dtypes.to_dict())), strategy


def test_strip_fast_equals_oracle(ray_session):
    import ray.data as rd

    a = (
        strip_duplicate_spans(rd.from_arrow(DOCS), n=5, min_df=2, hash="oracle")
        .to_pandas()
        .set_index("doc_id")["clean_text"]
    )
    b = (
        strip_duplicate_spans(rd.from_arrow(DOCS), n=5, min_df=2, hash="fast")
        .to_pandas()
        .set_index("doc_id")["clean_text"]
    )
    assert a.sort_index().equals(b.sort_index())


@pytest.mark.parametrize(
    "starts,n,n_tokens,expect",
    [
        ([], 3, 10, 0),
        ([1], 3, 10, 3),
        ([1, 2], 3, 10, 4),       # overlap merges
        ([1, 5], 3, 10, 6),       # disjoint
        ([1, 4], 3, 10, 6),       # touching
        ([9], 3, 10, 2),          # clipped at the end
        ([1], 5, 3, 3),           # interval longer than doc
    ],
)
def test_coverage_union(starts, n, n_tokens, expect):
    assert _coverage(np.array(starts, dtype=np.int64), n, n_tokens) == expect
