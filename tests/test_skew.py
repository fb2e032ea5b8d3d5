"""Skew-handling ops: salted two-phase aggregation, media-cost
estimation, cost-balanced sharding."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_equals_direct(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ocr_service_ray.ops.skew import salted_aggregate

    events = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    # exactness: sum over int cents to avoid float reassociation
    def cents(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(
            np.int64
        )
        return pa.table({"event_type": b["event_type"], "cents": pa.array(c)})

    prepared = events.map_batches(cents, batch_format="pyarrow")
    got = (
        salted_aggregate(
            prepared, "event_type", num_salts=8, sum_col="cents", sum_alias="total"
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        prepared.groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="total"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got[["event_type", "n", "total"]].equals(want[["event_type", "n", "total"]])


def test_media_cost_column(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.skew import DEFAULT_KIND_WEIGHTS, media_cost_column
    from ocr_service_ray.sources.synth import generate_corpus

    docs, _ = generate_corpus(60, seed=11)
    out = media_cost_column(rd.from_arrow(docs)).to_pandas()
    raw = docs.to_pylist()
    for row, want_row in zip(out.itertuples(), raw):
        want = sum(DEFAULT_KIND_WEIGHTS.get(s["kind"], 0.0) for s in want_row["spans"])
        assert row.media_cost == pytest.approx(want)


def test_cost_balanced_shard_spreads_heavy(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.skew import cost_balanced_shard

    # one batch: 90 light docs + 10 heavy docs
    n = 100
    tbl = pa.table(
        {
            "doc_id": [f"d{i:04d}" for i in range(n)],
            "media_cost": [100.0 if i < 10 else 1.0 for i in range(n)],
        }
    )
    out = (
        cost_balanced_shard(rd.from_arrow(tbl), num_shards=5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out["shard"].between(0, 4).all()
    heavy_shards = out.iloc[:10]["shard"].value_counts()
    # 10 heavy docs round-robined over 5 shards → exactly 2 each
    assert (heavy_shards == 2).all()
    # determinism: same input → same assignment
    out2 = (
        cost_balanced_shard(rd.from_arrow(tbl), num_shards=5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out["shard"].equals(out2["shard"])


def test_sliding_window_k1_equals_tumbling(ray_session):
    """size == hop → sliding degenerates to the tumbling window."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_service_ray.ops.relational import sliding_window_agg

    def events():
        return rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])

    slid = (
        sliding_window_agg(events(), size_hours=1, hop_hours=1)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    # direct tumbling computation
    df = events().to_pandas()
    df["window_start"] = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
    df["cents"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
    want = (
        df.groupby(["window_start", "event_type"], as_index=False)
        .agg(n_events=("cents", "size"), sum_value_cents=("cents", "sum"))
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert slid[["window_start", "event_type"]].equals(want[["window_start", "event_type"]])
    assert (slid["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert (slid["sum_value_cents"].to_numpy() == want["sum_value_cents"].to_numpy()).all()


def test_sliding_window_each_event_in_k_windows(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.relational import sliding_window_agg

    events = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    n = events.count()
    out = sliding_window_agg(events, size_hours=2, hop_hours=1).to_pandas()
    assert out["n_events"].sum() == 2 * n  # every event counted in exactly 2 windows


def test_streaming_sessionize_matches_batch(ray_session):
    """The incremental actor-state sessionizer must produce exactly the
    batch groupby implementation's sessions."""
    import ray.data as rd

    from ocr_service_ray.ops.relational import sessionize
    from ocr_service_ray.ops.streaming import sessionize_streaming

    def events():
        return rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])

    # returns a Dataset (de-drivered data plane); collect at test scale
    stream = sessionize_streaming(events(), gap_minutes=30, num_buckets=4).to_pandas()
    # aggregate per-session rows to the batch op's per-user summary
    got = (
        stream.groupby("user_id")
        .agg(
            n_sessions=("session_start", "size"),
            max_session_events=("n_events", "max"),
            n_events=("n_events", "sum"),
        )
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        sessionize(events(), gap_minutes=30)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert (got["user_id"] == want["user_id"]).all()
    for col in ("n_sessions", "max_session_events", "n_events"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
    # per-session rows carry valid bounds
    assert (stream["session_end"] >= stream["session_start"]).all()


def test_windowed_streaming_matches_batch_and_closes_early(ray_session):
    """The watermark sessioned windows must (a) equal the batch hourly
    aggregate after drain and (b) actually CLOSE windows before
    end-of-log (state freed incrementally)."""
    import ray
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.streaming import windowed_agg_streaming

    def cents(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(
            "int64"
        )
        return pa.table({"event_type": b["event_type"], "ts": b["ts"], "cents": pa.array(c)})

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    got = (
        windowed_agg_streaming(
            ev.map_batches(cents, batch_format="pyarrow"),
            window_minutes=60,
            value_col="cents",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["window_us", "key"])
        .reset_index(drop=True)
    )
    import duckdb

    want = (
        duckdb.sql(
            f"""SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_us,
                    event_type AS key,
                    CAST(count(*) AS BIGINT) AS n_events,
                    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
             FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2
             ORDER BY window_us, key"""
        )
        .df()
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("window_us", "key", "n_events", "sum_value"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    # watermark closes windows incrementally: open-window count
    # returned by the last ingest is far below the total window count
    from ocr_service_ray.ops.streaming import _window_actor_cls

    actor = _window_actor_cls().remote(3_600_000_000, 0, pa.string())
    base = 1_700_000_000_000_000
    # two partitions: hours 0-1 then hour 5 — ingesting the second
    # must close the first two windows
    ray.get(actor.ingest.remote(0, ["a", "a"], [base, base + 3_600_000_000], [1, 2]))
    open_after = ray.get(actor.ingest.remote(1, ["a"], [base + 5 * 3_600_000_000], [3]))
    assert open_after == 1  # hours 0 and 1 closed by the watermark
    tbl = ray.get(actor.drain.remote())
    assert tbl.num_rows == 3
    ray.kill(actor)


def test_session_actor_reorders_and_fails_fast(ray_session):
    """Out-of-order partitions must be buffered and applied in seq
    order; a genuinely non-monotonic stream must raise (fail-fast on
    the load-bearing ordering assumption)."""
    import pytest
    import ray
    import pyarrow as pa

    from ocr_service_ray.ops.streaming import _session_actor_cls

    cls = _session_actor_cls()
    gap_us = 60_000_000  # 1 min
    base = 1_700_000_000_000_000

    # partitions delivered 1, 0 — must reorder before processing
    a = cls.remote(gap_us, pa.string())
    depth = ray.get(a.ingest.remote(1, ["u"], [base + 10_000_000_000]))
    assert depth == 1  # seq 1 buffered, seq 0 missing
    ray.get(a.ingest.remote(0, ["u"], [base]))
    t = ray.get(a.drain.remote())
    # gap >> 1min → two sessions, in the CORRECT (seq) order
    assert t.num_rows == 2
    assert t["session_start"].to_pylist() == [base, base + 10_000_000_000]
    ray.kill(a)

    # non-monotonic partitions (seq order but time going backwards)
    b = cls.remote(gap_us, pa.string())
    ray.get(b.ingest.remote(0, ["u"], [base + 10_000_000_000]))
    with pytest.raises(ray.exceptions.RayTaskError):
        ray.get(b.ingest.remote(1, ["u"], [base]))
    ray.kill(b)

    # drain with a missing sequence number must refuse
    c = cls.remote(gap_us, pa.string())
    ray.get(c.ingest.remote(1, ["u"], [base]))
    with pytest.raises(ray.exceptions.RayTaskError):
        ray.get(c.drain.remote())
    ray.kill(c)
