"""Tests for the round-3 curation wave: repetition quality rules,
pattern redaction, percentile banding, embedding quantization, and
the deterministic weighted interleave."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_repetition_stats_values(rd):
    from ocr_service_ray.ops.quality_rules import repetition_stats

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b a b a", "x y z", "q"],
        }
    )
    df = (
        repetition_stats(rd.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc1: words [a b a b a] → 5 words, 2 distinct, top=3;
    # bigrams [a b, b a, a b, b a] → 4, 2 distinct.
    assert df.loc[0, ["n_words", "n_distinct_words", "top_word_count"]].tolist() == [5, 2, 3]
    assert df.loc[0, ["n_bigrams", "n_distinct_bigrams"]].tolist() == [4, 2]
    assert not df.loc[0, "keep_top_word"]  # 10*3 > 3*5
    assert not df.loc[0, "keep_dup_bigram"]  # 10*2 > 2*4
    # doc3: single word → 0 bigrams, dup-bigram rule vacuously true.
    assert df.loc[2, "n_bigrams"] == 0
    assert bool(df.loc[2, "keep_dup_bigram"])


def test_repetition_stats_matches_python_reference(rd):
    """Block-layout-invariant equality with a per-doc Counter reference."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_service_ray.ops.quality_rules import repetition_stats

    raw = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    out = (
        repetition_stats(rd.from_arrow(pa.Table.from_pandas(raw)).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(raw)
    for _, row in out.head(50).iterrows():
        text = raw.loc[raw["doc_id"] == row["doc_id"], "text"].iloc[0]
        words = text.split(" ")
        wc = Counter(words)
        bc = Counter(" ".join(p) for p in zip(words, words[1:]))
        assert row["n_words"] == len(words)
        assert row["n_distinct_words"] == len(wc)
        assert row["top_word_count"] == max(wc.values())
        assert row["n_bigrams"] == sum(bc.values())
        assert row["n_distinct_bigrams"] == len(bc)


def test_redact_patterns_order_and_counts(rd):
    from ocr_service_ray.ops.quality_rules import redact_patterns

    t = pa.table({"id": [1, 2], "s": ["ab 1234 c 7 d 56", "no digits"]})
    df = (
        redact_patterns(
            rd.from_arrow(t),
            "s",
            [("num", "[0-9]{2,}", "<NUM>"), ("digit", "[0-9]", "#")],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # rule order matters: 1234 and 56 go first, THEN the lone 7.
    assert df.loc[0, "s"] == "ab <NUM> c # d <NUM>"
    assert df.loc[0, "n_num"] == 2
    assert df.loc[0, "n_digit"] == 1
    assert df.loc[1, "s"] == "no digits"
    assert df.loc[1, "n_num"] == 0 and df.loc[1, "n_digit"] == 0


def test_percentile_buckets_exact_and_layout_invariant(rd):
    from ocr_service_ray.ops.sketch import percentile_buckets

    vals = [5, 1, 3, 3, 7, 9, 1, 5, 5, 2]
    t = pa.table({"id": list(range(10)), "v": vals})
    for parts in (1, 4):
        df = (
            percentile_buckets(rd.from_arrow(t).repartition(parts), "v", 4, ["id"])
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        arr = np.array(vals)
        for i, v in enumerate(vals):
            n_less = int((arr < v).sum())
            assert df.loc[i, "n_less"] == n_less
            assert df.loc[i, "bucket"] == min(n_less * 4 // 10, 3)


def test_percentile_buckets_empty(rd):
    from ocr_service_ray.ops.sketch import percentile_buckets

    t = pa.table({"id": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    df = percentile_buckets(rd.from_arrow(t), "v", 4, ["id"]).to_pandas()
    assert len(df) == 0


def test_quantize_embeddings_exact(rd):
    from ocr_service_ray.ops.vector import quantize_embeddings

    e = pa.table(
        {
            "vec_id": [1, 2, 3],
            "embedding": pa.array(
                [[0.0, 1.0, 2.0], [0.5, 3.0, 2.0], [1.0, 2.0, 2.0]],
                pa.list_(pa.float32()),
            ),
        }
    )
    df = (
        quantize_embeddings(rd.from_arrow(e))
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    # dim1 span [0,1]: 0→0, 0.5→127, 1→255. dim2 span [1,3]:
    # 1→0, 3→255, 2→127. dim3 constant → all 0.
    assert df["q"].tolist() == [0, 0, 0, 127, 255, 0, 255, 127, 0]
    assert df["dim"].tolist() == [1, 2, 3] * 3  # 1-based dims


def test_interleave_by_weight_schedule(rd):
    from ocr_service_ray.ops.mix import interleave_by_weight

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "source": ["a", "a", "a", "b", "b", "c", "zz"],
        }
    )
    df = (
        interleave_by_weight(rd.from_arrow(t), {"a": 3, "b": 2, "c": 1})
        .to_pandas()
        .sort_values(["mix_key", "source"])
        .reset_index(drop=True)
    )
    # lcm=6 → strides a:2 b:3 c:6; keys a:1,3,5·2 → 2,6,10; b: 3,9; c: 6.
    assert df["doc_id"].tolist() == [1, 4, 2, 6, 5, 3]
    assert "zz" not in set(df["source"])  # out-of-mix source dropped
    # weight proportion holds over the first lcm window: a twice as
    # dense as b within keys ≤ 6 is a:2 (2,6) b:1 (3)… spot-check done
    # above via exact key list.


def test_interleave_rejects_bad_weights(rd):
    from ocr_service_ray.ops.mix import interleave_by_weight

    t = pa.table({"doc_id": [1], "source": ["a"]})
    with pytest.raises(ValueError):
        interleave_by_weight(rd.from_arrow(t), {"a": 0})
    with pytest.raises(ValueError):
        interleave_by_weight(rd.from_arrow(t), {})


def test_percentile_buckets_null_rows_dropped(rd):
    from ocr_service_ray.ops.sketch import percentile_buckets

    t = pa.table(
        {"id": [1, 2, 3, 4], "v": pa.array([10, None, 20, 10], pa.int64())}
    )
    df = (
        percentile_buckets(rd.from_arrow(t), "v", 2, ["id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # the null row (id 2) drops, matching the SQL inner CDF join
    assert df["id"].tolist() == [1, 3, 4]
    assert df["n_less"].tolist() == [0, 2, 0]
