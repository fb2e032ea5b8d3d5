"""Wave-67 ops: DSIR hashed-gram importance scores (ops/importance.py)
and Z-order clustering file stats (ops/zorder.py) — layout
invariance, planted-signal sanity, Morton-code unit identities."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _docs_table():
    # target vocabulary: german-ish tokens; raw pool has one doc that
    # copies it (should rank first) and several that don't.
    rows = [
        (1, "der die das und der die", "de"),
        (2, "das und der die das und", "de"),
        (3, "der die das und das der", "de"),
        (10, "der die das und die das", "en"),  # target-like raw doc
        (11, "the cat sat on the mat", "en"),
        (12, "wholly unrelated tokens here now", "en"),
        (13, "another set of english words", "en"),
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _make_is_de():
    # defined as a closure so cloudpickle ships it BY VALUE to workers
    # (a test-module top-level function pickles by reference, and the
    # test module is not importable on Ray workers)
    def is_de(b: pa.Table) -> np.ndarray:
        return pc.equal(b["lang"], "de").to_numpy(zero_copy_only=False)

    return is_de


def test_gram_buckets_counts_and_range():
    from ocr_service_ray.ops.importance import gram_buckets

    b = gram_buckets("a b c", 64)
    assert len(b) == 3 + 2  # unigrams + bigrams
    assert b.min() >= 0 and b.max() < 64
    # empty text still yields the one '' unigram
    assert len(gram_buckets("", 64)) == 1


def test_importance_planted_signal_and_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.importance import importance_scores

    tbl = _docs_table()
    is_de = _make_is_de()
    out1 = importance_scores(
        rd.from_arrow(tbl), is_de, n_buckets=64, top_n=4
    )
    # only raw (non-de) docs are scored; the target-like doc wins
    assert set(out1["doc_id"]) <= {10, 11, 12, 13}
    assert out1["doc_id"].iloc[0] == 10
    assert (
        out1["avg_weight"].iloc[0] > out1["avg_weight"].iloc[-1]
    )
    # layout invariance: many small blocks give the identical frame
    out2 = importance_scores(
        rd.from_arrow(tbl).repartition(5), is_de, n_buckets=64, top_n=4
    )
    assert out1.equals(out2)


def test_importance_fast_hash_mode_agrees_on_planted_signal():
    import ray.data as rd

    from ocr_service_ray.ops.importance import importance_scores

    is_de = _make_is_de()
    out = importance_scores(
        rd.from_arrow(_docs_table()), is_de, n_buckets=64, top_n=4, hash="fast"
    )
    # bucket assignment differs from md5 mode, the planted ranking
    # must not: the copied-vocabulary doc still wins
    assert out["doc_id"].iloc[0] == 10


def test_morton_interleave_units():
    from ocr_service_ray.ops.zorder import morton_interleave

    qx = np.array([0b11, 0, 1], dtype=np.int64)
    qy = np.array([0b01, 0, 1], dtype=np.int64)
    z = morton_interleave(qx, qy, 8)
    # x→even bits, y→odd bits: (11,01) → 0b0111 = 7; (1,1) → 0b11 = 3
    assert list(z) == [7, 0, 3]


def test_zorder_stats_bounds_and_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.zorder import zorder_file_stats

    rng = np.random.default_rng(4)
    n = 5000
    x = rng.integers(0, 1000, n).astype(np.int64)
    y = rng.integers(0, 100000, n).astype(np.int64)
    tbl = pa.table({"x": pa.array(x), "y": pa.array(y)})
    s1 = zorder_file_stats(rd.from_arrow(tbl), "x", "y", bits=8, n_files=16)
    s2 = zorder_file_stats(
        rd.from_arrow(tbl).repartition(7), "x", "y", bits=8, n_files=16
    )
    assert s1.equals(s2)
    for layout in ("zorder", "linear"):
        part = s1[s1["layout"] == layout]
        assert int(part["n_rows"].sum()) == n
        assert part["file_id"].between(0, 15).all()
        assert int(part["min_x"].min()) == int(x.min())
        assert int(part["max_x"].max()) == int(x.max())
        assert (part["min_x"] <= part["max_x"]).all()
        assert (part["min_y"] <= part["max_y"]).all()
    # the clustering claim itself: for a mid-band predicate on y, the
    # z-order layout prunes files the x-linear layout cannot (every
    # linear file spans ~the full y range on uniform data)
    lo_b, hi_b = 40000, 45000
    zf = s1[(s1["layout"] == "zorder")]
    lf = s1[(s1["layout"] == "linear")]
    z_overlap = ((zf["min_y"] <= hi_b) & (zf["max_y"] >= lo_b)).sum()
    l_overlap = ((lf["min_y"] <= hi_b) & (lf["max_y"] >= lo_b)).sum()
    assert z_overlap < l_overlap
