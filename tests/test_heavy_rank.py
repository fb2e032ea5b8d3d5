"""Tests for global_rank, heavy_hitters, and the bloom decontam tier."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_global_rank_matches_window(rd):
    from ocr_service_ray.ops.scan import global_rank

    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    for parts in (1, 7):
        out = (
            global_rank(rd.from_arrow(raw).repartition(parts), ["n_chars", "doc_id"])
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        ref = (
            raw.to_pandas()
            .sort_values(["n_chars", "doc_id"])
            .reset_index(drop=True)
        )
        assert (out["doc_id"].to_numpy() == ref["doc_id"].to_numpy()).all()
        assert (out["rank"].to_numpy() == np.arange(len(ref))).all()


def test_global_rank_equal_keys_stay_valid(rd):
    """Ray's range partitioner co-locates equal sort keys in one
    block, so an all-equal column still yields a valid dense 0..n-1
    rank; if a future Ray ever splits equal first-keys across blocks,
    the op's uniqueness assert fires instead of emitting ambiguous
    ranks (that path is unreachable deterministically here)."""
    from ocr_service_ray.ops.scan import global_rank

    t = pa.table({"v": [1] * 5000})
    out = global_rank(rd.from_arrow(t).repartition(8), ["v"]).to_pandas()
    assert sorted(out["rank"].tolist()) == list(range(5000))


def test_heavy_hitters_exact_topk(rd):
    from ocr_service_ray.ops.heavy import heavy_hitters

    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = heavy_hitters(
        rd.from_arrow(raw).repartition(5),
        None,
        k=15,
        capacity=4096,
        explode_tokens=True,
    )
    # exact reference
    words = pd.Series(
        " ".join(raw["text"].to_pylist()).split(" ")
    ).value_counts()
    ref = (
        words.rename_axis("value")
        .reset_index(name="n")
        .sort_values(["n", "value"], ascending=[False, True], kind="stable")
        .head(15)
        .reset_index(drop=True)
    )
    assert out["value"].tolist() == ref["value"].tolist()
    assert out["n"].tolist() == ref["n"].tolist()
    # certify the MG bar: k-th count clears N/(capacity+1)
    assert out["n"].min() > words.sum() / 4097


def test_heavy_hitters_column_mode(rd):
    from ocr_service_ray.ops.heavy import heavy_hitters

    t = pa.table({"u": ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"]})
    out = heavy_hitters(rd.from_arrow(t).repartition(3), "u", k=2, capacity=8)
    assert out["value"].tolist() == ["a", "b"]  # b beats c on tie-break
    assert out["n"].tolist() == [5, 3]


def test_decontam_bloom_equals_other_strategies(rd):
    from ocr_service_ray.ops.decontam import contamination_pairs

    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = rd.from_arrow(raw)

    def split(want):
        import pyarrow.compute as pc

        def f(b):
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 20 == 0) if want else (ids % 20 != 0)
            return b.filter(pa.array(m))

        return docs.map_batches(f, batch_format="pyarrow")

    frames = {}
    for s in ("broadcast", "shuffle", "bloom"):
        df = contamination_pairs(split(False), split(True), n=8, strategy=s).to_pandas()
        frames[s] = (
            df.sort_values(["train_id", "eval_id"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames["broadcast"], frames["shuffle"], check_like=True)
    pd.testing.assert_frame_equal(frames["broadcast"], frames["bloom"], check_like=True)
