"""Window/rollup/pivot/paragraph-dedup operators vs pandas/duckdb
references across block layouts (ops/window.py, ops/agg.py rollup_agg
+ pivot_counts, ops/dedup.py paragraph_dedup)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_service_ray.ops.agg import pivot_counts, rollup_agg
from ocr_service_ray.ops.dedup import paragraph_dedup
from ocr_service_ray.ops.window import grouped_lag_delta, grouped_moving_sum


def _frame(n=300, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 9, n).astype(np.int64),
            "ts_us": rng.integers(0, 10_000_000, n).astype(np.int64),
            "cents": rng.integers(-50, 500, n).astype(np.int64),
        }
    )


def _ds(df, nblocks):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        nblocks
    )


@pytest.mark.parametrize("nblocks", [1, 7])
def test_lag_delta_matches_window(ray_session, nblocks):
    df = _frame()
    out = (
        grouped_lag_delta(_ds(df, nblocks), "key", ["ts_us", "event_id"], "ts_us")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["ts_us", "event_id"], kind="stable").copy()
    ref["delta_us"] = ref.groupby("key")["ts_us"].diff()
    ref = ref.sort_values("event_id").reset_index(drop=True)
    got = out["delta_us"].astype("float64").to_numpy(na_value=np.nan)
    np.testing.assert_array_equal(np.isnan(got), ref["delta_us"].isna().to_numpy())
    mask = ~ref["delta_us"].isna().to_numpy()
    np.testing.assert_array_equal(got[mask], ref["delta_us"].to_numpy()[mask])


def test_lag_delta_timestamp_column(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "key": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:01.5",
                    "2024-01-01 00:01:00",
                    "2024-01-01 00:00:00",
                ],
                format="ISO8601",
            ),
        }
    )
    out = (
        grouped_lag_delta(_ds(df, 2), "key", ["ts", "event_id"], "ts")
        .to_pandas()
        .sort_values("event_id")
    )
    assert out["delta_us"].tolist()[1:3] == [1_500_000, 58_500_000]
    # the single first row of each key is NULL, not 0
    assert pd.isna(out["delta_us"].iloc[0]) and pd.isna(out["delta_us"].iloc[3])


@pytest.mark.parametrize("window", [1, 3, 1000])
def test_moving_sum_matches_rolling(ray_session, window):
    df = _frame()
    out = (
        grouped_moving_sum(
            _ds(df, 5), "key", ["ts_us", "event_id"], "cents", window, out_col="ms"
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["ts_us", "event_id"], kind="stable").copy()
    ref["ms"] = (
        ref.groupby("key")["cents"]
        .rolling(window, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
    )
    ref = ref.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_array_equal(
        out["ms"].to_numpy(np.int64), ref["ms"].to_numpy(np.int64)
    )


def test_rollup_matches_duckdb_cube(ray_session):
    import duckdb

    df = _frame()
    df["a"] = (df["key"] % 3).map({0: "x", 1: "y", 2: "z"})
    df["b"] = (df["key"] % 2).map({0: "p", 1: "q"})
    out = rollup_agg(
        _ds(df, 4), ["a", "b"], {"n": (None, "count"), "s": ("cents", "sum")}
    )
    ref = duckdb.connect().execute(
        """SELECT a, b, CAST(count(*) AS BIGINT) n, CAST(sum(cents) AS BIGINT) s,
                  CAST(grouping(a, b) AS BIGINT) AS grouping_id
           FROM df GROUP BY CUBE(a, b)"""
    ).fetchdf()
    key = ["grouping_id", "a", "b"]
    a = out.sort_values(key).reset_index(drop=True)
    b = ref.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
    )


def test_rollup_min_max_and_custom_sets(ray_session):
    df = _frame()
    df["a"] = (df["key"] % 3).astype(str)
    out = rollup_agg(
        _ds(df, 3),
        ["a"],
        {"lo": ("cents", "min"), "hi": ("cents", "max")},
        sets=[()],
    )
    assert len(out) == 1 and out["grouping_id"].iloc[0] == 1
    assert out["lo"].iloc[0] == df["cents"].min()
    assert out["hi"].iloc[0] == df["cents"].max()
    with pytest.raises(ValueError):
        rollup_agg(_ds(df, 1), ["a"], {"m": ("cents", "mean")})


def test_pivot_counts_matches_filter_agg(ray_session):
    df = _frame()
    df["cat"] = (df["key"] % 4).map({0: "a", 1: "b", 2: "c", 3: "d"})
    # category 'd' excluded → its rows count toward no column
    out = (
        pivot_counts(_ds(df, 6), "key", "cat", ["a", "b", "c", "zzz"])
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    for c in ["a", "b", "c"]:
        ref = (
            df.assign(i=(df["cat"] == c).astype(np.int64))
            .groupby("key", as_index=False)["i"]
            .sum()
            .sort_values("key")
        )
        np.testing.assert_array_equal(
            out[f"{c}_cnt"].to_numpy(np.int64), ref["i"].to_numpy(np.int64)
        )
    assert (out["zzz_cnt"] == 0).all()
    assert len(out) == df["key"].nunique()


@pytest.mark.parametrize("nblocks", [1, 5])
def test_paragraph_dedup_first_occurrence(ray_session, nblocks):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha\nbeta\ngamma",
                "beta\ndelta\nalpha",  # beta+alpha seen in doc 1
                "alpha\nbeta",  # fully deduped away
                "eps\neps\nzeta",  # in-doc repeat: second eps drops
            ],
        }
    )
    out = (
        paragraph_dedup(_ds(docs, nblocks))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 4]  # doc 3 vanished
    assert out["text"].tolist() == ["alpha\nbeta\ngamma", "delta", "eps\nzeta"]
    assert out["n_kept"].tolist() == [3, 1, 2]


def test_paragraph_dedup_global_first_is_doc_order(ray_session):
    # the SAME paragraph in docs 10 and 2 → doc 2 (lower id) keeps it,
    # whatever block the rows arrive in
    docs = pd.DataFrame(
        {"doc_id": [10, 2], "text": ["shared\nten-only", "shared\ntwo-only"]}
    )
    out = (
        paragraph_dedup(_ds(docs, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[out["doc_id"] == 2, "text"].iloc[0] == "shared\ntwo-only"
    assert out.loc[out["doc_id"] == 10, "text"].iloc[0] == "ten-only"


@pytest.mark.parametrize("nblocks", [1, 6])
def test_range_sum_matches_duckdb(ray_session, nblocks):
    import duckdb

    from ocr_service_ray.ops.window import grouped_range_sum

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "event_id": np.arange(200, dtype=np.int64),
            "key": rng.integers(0, 5, 200).astype(np.int64),
            # coarse grid → many equal-timestamp peers
            "ts_us": rng.integers(0, 40, 200).astype(np.int64) * 10,
            "cents": rng.integers(-9, 100, 200).astype(np.int64),
        }
    )
    out = (
        grouped_range_sum(_ds(df, nblocks), "key", "ts_us", "cents", 100, "rs")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = duckdb.connect().execute(
        """SELECT event_id,
                  CAST(sum(cents) OVER (PARTITION BY key ORDER BY ts_us
                       RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT) AS rs
           FROM df ORDER BY event_id"""
    ).fetchdf()
    np.testing.assert_array_equal(
        out["rs"].to_numpy(np.int64), ref["rs"].to_numpy(np.int64)
    )


def test_range_sum_includes_equal_ts_peers(ray_session):
    from ocr_service_ray.ops.window import grouped_range_sum

    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "key": [1, 1, 1],
            "ts_us": [100, 100, 300],
            "cents": [5, 7, 1],
        }
    )
    out = (
        grouped_range_sum(_ds(df, 1), "key", "ts_us", "cents", 50, "rs")
        .to_pandas()
        .sort_values("event_id")
    )
    # both ts=100 rows see BOTH peers (frame ends at last peer)
    assert out["rs"].tolist() == [12, 12, 1]


@pytest.mark.parametrize("nblocks", [1, 4])
def test_dense_rank_matches_duckdb(ray_session, nblocks):
    import duckdb

    from ocr_service_ray.ops.window import grouped_dense_rank

    df = _frame(250, seed=21)
    df["cents"] = df["cents"] % 7  # force heavy ties
    out = (
        grouped_dense_rank(_ds(df, nblocks), "key", ["cents"], "dr")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = duckdb.connect().execute(
        """SELECT event_id, CAST(dense_rank() OVER (
               PARTITION BY key ORDER BY cents) AS BIGINT) AS dr
           FROM df ORDER BY event_id"""
    ).fetchdf()
    np.testing.assert_array_equal(
        out["dr"].to_numpy(np.int64), ref["dr"].to_numpy(np.int64)
    )


def test_dense_rank_nulls_share_rank(ray_session):
    from ocr_service_ray.ops.window import grouped_dense_rank

    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "key": [1, 1, 1, 1],
            "v": pd.array([None, None, 5, 5], dtype="Int64"),
        }
    )
    out = (
        grouped_dense_rank(_ds(df, 2), "key", ["v"], "dr")
        .to_pandas()
        .sort_values("event_id")
    )
    # two NULLs share one rank, two 5s share the next
    assert sorted(out["dr"].tolist()) == [1, 1, 2, 2]


@pytest.mark.parametrize("op,expect", [("intersect", {2, 3}), ("except", {1})])
def test_set_op_semantics(ray_session, op, expect):
    from ocr_service_ray.ops.relational import set_op

    a = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3]})  # duplicates collapse
    b = pd.DataFrame({"k": [2, 2, 3, 4]})
    out = set_op(_ds(a, 3), _ds(b, 2), ["k"], op).to_pandas()
    assert set(out["k"]) == expect and len(out) == len(expect)


def test_set_op_nulls_compare_equal(ray_session):
    from ocr_service_ray.ops.relational import set_op

    a = pd.DataFrame({"k": pd.array([None, 1], dtype="Int64")})
    b = pd.DataFrame({"k": pd.array([None, 2], dtype="Int64")})
    out = set_op(_ds(a, 1), _ds(b, 1), ["k"], "intersect").to_pandas()
    # SQL INTERSECT: NULL equals NULL in set ops
    assert len(out) == 1 and pd.isna(out["k"].iloc[0])


def test_moving_sum_rejects_float_column(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.window import grouped_moving_sum, grouped_range_sum

    ds = rd.from_items([{"k": 1, "t": 1, "v": 1.5}])
    with pytest.raises(ValueError, match="integer"):
        grouped_moving_sum(ds, "k", ["t"], "v", 3)
    with pytest.raises(ValueError, match="integer"):
        grouped_range_sum(ds, "k", "t", "v", 10)


def test_rollup_empty_input_emits_global_row(ray_session):
    df = pd.DataFrame({"a": [], "cents": []}).astype({"a": "str", "cents": "int64"})
    out = rollup_agg(
        _ds(df, 1), ["a"], {"n": (None, "count"), "s": ("cents", "sum")}
    )
    # keyed set: no rows; () set: COUNT/SUM = 0 like SQL's global agg
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n"] == 0 and row["s"] == 0 and row["grouping_id"] == 1
    with pytest.raises(ValueError, match="non-keys"):
        rollup_agg(_ds(df, 1), ["a"], {"n": (None, "count")}, sets=[("zz",)])


def test_pivot_rejects_empty_categories(ray_session):
    df = pd.DataFrame({"k": [1], "c": ["x"]})
    with pytest.raises(ValueError, match="non-empty"):
        pivot_counts(_ds(df, 1), "k", "c", [])


def test_set_op_union_distinct(ray_session):
    from ocr_service_ray.ops.relational import set_op

    a = pd.DataFrame({"k": [1, 1, 2]})
    b = pd.DataFrame({"k": [2, 3, 3]})
    out = set_op(_ds(a, 2), _ds(b, 2), ["k"], "union").to_pandas()
    assert sorted(out["k"]) == [1, 2, 3]
    with pytest.raises(ValueError, match="unknown set op"):
        set_op(_ds(a, 1), _ds(b, 1), ["k"], "minus")


def test_pivot_rejects_duplicate_categories(ray_session):
    df = pd.DataFrame({"k": [1], "c": ["x"]})
    with pytest.raises(ValueError, match="unique"):
        pivot_counts(_ds(df, 1), "k", "c", ["x", "x"])


@pytest.mark.parametrize("nblocks", [1, 4])
def test_attribution_pairs_window_edges(ray_session, nblocks):
    from ocr_service_ray.ops.window import attribution_pairs

    df = pd.DataFrame(
        {
            "event_id": np.arange(7, dtype=np.int64),
            "key": [1, 1, 1, 1, 1, 2, 2],
            "ts_us": [0, 50, 100, 100, 160, 10, 10],
            "typ": ["v", "v", "p", "v", "p", "v", "p"],
        }
    )
    out = (
        attribution_pairs(_ds(df, nblocks), "key", "ts_us", "typ", "v", "p", 100)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # p@100: v@0 (diff 100, inclusive) + v@50 → 2; v@100 tie excluded
    # p@160: v@100 + v@50 (diff 110 > 100 excluded? 160-50=110 → out) → 1
    # p@10 (key 2): v@10 tie excluded → 0
    assert out["event_id"].tolist() == [2, 4, 6]
    assert out["n_attributed"].tolist() == [2, 1, 0]


def test_banded_sample_rates_and_determinism(ray_session):
    from ocr_service_ray.ops.relational import banded_sample

    df = pd.DataFrame(
        {
            "id": np.arange(4000, dtype=np.int64),
            "bucket": np.tile([0, 1], 2000).astype(np.int64),
        }
    )
    out = banded_sample(_ds(df, 4), "bucket", {0: 1.0, 1: 0.25}, "id").to_pandas()
    by = out.groupby("bucket").size()
    assert by[0] == 2000  # rate 1.0 keeps everything
    assert 380 < by[1] < 620  # ~25% of 2000, md5-uniform
    # bands absent from rates drop entirely
    out2 = banded_sample(_ds(df, 2), "bucket", {0: 1.0}, "id").to_pandas()
    assert set(out2["bucket"]) == {0}
    # layout invariance: same ids at any block count
    out3 = banded_sample(_ds(df, 9), "bucket", {0: 1.0, 1: 0.25}, "id").to_pandas()
    assert sorted(out["id"]) == sorted(out3["id"])


def test_transition_counts_lag_pairs(ray_session):
    from ocr_service_ray.ops.window import transition_counts

    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "key": [1, 1, 1, 2, 2, 3],
            "ord": [0, 1, 2, 0, 1, 0],
            "typ": ["a", "b", "a", "a", "b", "a"],
        }
    )
    out = (
        transition_counts(_ds(df, 3), "key", ["ord", "event_id"], "typ")
        .to_pandas()
        .sort_values(["prev", "next"])
        .reset_index(drop=True)
    )
    # key1: a→b, b→a; key2: a→b; key3: single event contributes nothing
    got = {(r["prev"], r["next"]): r["n"] for _, r in out.iterrows()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}
