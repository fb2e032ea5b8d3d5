"""funnel_stages (ops/funnel.py) and mad_outliers (ops/agg.py):
hand-built fixtures for the strictly-after matching rule and the
integer median/MAD arithmetic, plus a duckdb cross-check."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_service_ray.ops.agg import mad_outliers
from ocr_service_ray.ops.funnel import funnel_stages


def _ds(df, nblocks):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        nblocks
    )


@pytest.mark.parametrize("nblocks", [1, 4])
def test_funnel_strictly_after(ray_session, nblocks):
    rows = [
        # u1 completes all three in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2 clicks BEFORE viewing → stalls at stage 1
        (2, 20, "click"), (2, 30, "view"),
        # u3 click at the SAME ts as view → strictly-after rejects it
        (3, 10, "view"), (3, 10, "click"),
        # u4 never views → stage 0
        (4, 5, "purchase"),
        # u5 view → click; second view earlier must not reopen stage 1
        (5, 50, "view"), (5, 40, "view"), (5, 45, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = funnel_stages(_ds(df, nblocks), ["view", "click", "purchase"])
    assert out["stage"].tolist() == ["view", "click", "purchase"]
    # u1,u2,u3,u5 viewed; u1,u5 clicked after first view; u1 purchased
    assert out["n_users"].tolist() == [4, 2, 1]


def test_funnel_empty_and_unreached(ray_session):
    df = pd.DataFrame({"user_id": [1], "ts": [1], "event_type": ["view"]})
    out = funnel_stages(_ds(df, 1), ["signup", "purchase"])
    assert out["n_users"].tolist() == [0, 0]


@pytest.mark.parametrize("nblocks", [1, 5])
def test_mad_outliers_matches_duckdb(ray_session, nblocks):
    import duckdb

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "event_id": np.arange(500, dtype=np.int64),
            "cents": np.concatenate(
                [rng.integers(90, 110, 490), rng.integers(5000, 9000, 10)]
            ).astype(np.int64),
        }
    )
    out = (
        mad_outliers(_ds(df, nblocks), "cents", ["event_id"], k_num=3, k_den=1)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = duckdb.connect().execute(
        """WITH m AS (SELECT CAST(2*median(cents) AS BIGINT) AS med2 FROM df),
           d AS (SELECT event_id, cents, abs(2*cents - med2) AS dd FROM df, m),
           md AS (SELECT CAST(2*median(dd) AS BIGINT) AS m2d FROM d)
           SELECT event_id, cents FROM d, md WHERE 2*dd > 3*m2d
           ORDER BY event_id"""
    ).fetchdf()
    # the 10 planted extremes must all be flagged
    assert len(out) >= 10
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_mad_outliers_fractional_k_and_nulls(ray_session):
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "cents": pd.array([10, 10, 10, 13, 100, None], dtype="Int64"),
        }
    )
    # median=10, deviations |x-10| = 0,0,0,3,90 → MAD=0 → every nonzero
    # deviation is an outlier at any k; NULL is never an outlier
    out = mad_outliers(_ds(df, 2), "cents", ["event_id"], k_num=1, k_den=2).to_pandas()
    assert sorted(out["event_id"].tolist()) == [3, 4]


def test_mad_outliers_rejects_float_column(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"event_id": 1, "v": 1.5}])
    with pytest.raises(ValueError, match="integer"):
        mad_outliers(ds, "v", ["event_id"])


def test_mad_outliers_empty_input(ray_session):
    df = pd.DataFrame({"event_id": [], "cents": []}).astype(
        {"event_id": "int64", "cents": "int64"}
    )
    out = mad_outliers(_ds(df, 1), "cents", ["event_id"]).to_pandas()
    assert len(out) == 0


def test_normalize_text_catches_variants(ray_session):
    import pyarrow as pa

    from ocr_service_ray.ops.text import normalize_text

    b = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["Hello  World", "  hello world\t", "HELLO\nWORLD"],
        }
    )
    out = normalize_text(b)
    assert out["norm_text"].to_pylist() == ["hello world"] * 3


@pytest.mark.parametrize("nblocks", [1, 4])
def test_fuzzy_pairs_blocked_lev(ray_session, nblocks):
    import ray.data as rd

    from ocr_service_ray.ops.dedup import fuzzy_pairs

    df = pd.DataFrame(
        {
            "name": [
                "kitten", "sitten", "sitting",  # kitten~sitten d1; sitten~sitting d2
                "kitten",                        # duplicate collapses
                "apple", "appl",                 # d1, different lengths
                "zzzzzzzzzz",                    # no partner
            ]
        }
    )
    out = (
        fuzzy_pairs(_ds(df, nblocks), "name", max_dist=2)
        .to_pandas()
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )
    got = set(map(tuple, out[["name_a", "name_b", "dist"]].to_numpy()))
    assert got == {
        ("kitten", "sitten", 1),
        ("sitten", "sitting", 2),
        ("appl", "apple", 1),
        ("kitten", "sitting", 2),  # within band (len diff 1), lev 2... verify below
    } or got == {
        ("kitten", "sitten", 1),
        ("sitten", "sitting", 2),
        ("appl", "apple", 1),
    }
    # exact ground truth by brute force
    import itertools

    from ocr_service_ray.kernels.correct import levenshtein_distance

    names = sorted(set(df["name"]))
    truth = {
        (a, b, levenshtein_distance(a, b))
        for a, b in itertools.combinations(names, 2)
        if abs(len(a) - len(b)) <= 2 and levenshtein_distance(a, b) <= 2
    }
    assert got == truth


@pytest.mark.parametrize("nblocks", [1, 6])
def test_streaming_dedup_first_occurrence(ray_session, nblocks):
    from ocr_service_ray.ops.streaming import streaming_dedup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            # every text appears 4x; id order decides the survivor
            "text": [f"t{i % 10}" for i in range(40)],
        }
    )
    out = (
        streaming_dedup(_ds(df, nblocks), num_buckets=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == list(range(10))  # first 10 ids win
    assert len(set(out["text_hash"])) == 10


def test_funnel_by_cohort_zero_rows_kept(ray_session):
    from ocr_service_ray.ops.funnel import funnel_by_cohort

    rows = [
        # Jan cohort: u1 converts fully, u2 stalls after view
        (1, "2024-01-05 10:00", "view"), (1, "2024-01-06 10:00", "click"),
        (2, "2024-01-07 10:00", "view"),
        # Feb cohort: u3 only views → click/purchase rows must be 0
        (3, "2024-02-01 10:00", "view"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = funnel_by_cohort(_ds(df, 2), ["view", "click", "purchase"])
    got = {
        (r["cohort"], r["stage"]): r["n_users"] for _, r in out.iterrows()
    }
    assert got == {
        ("2024-01", "view"): 2, ("2024-01", "click"): 1, ("2024-01", "purchase"): 0,
        ("2024-02", "view"): 1, ("2024-02", "click"): 0, ("2024-02", "purchase"): 0,
    }
