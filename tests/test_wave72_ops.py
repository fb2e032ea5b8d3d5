"""Wave-72: watermark-bounded stream-stream interval join
(ops/streaming.py stream_stream_join) — hand-computed pairs,
exactly-once under ties and repartitioning, window edges; plus the
delta-dedup empty-overlap regression."""

import numpy as np
import pandas as pd
import pyarrow as pa

HOUR = 3600 * 1_000_000


def _events(rows):
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def _run(rows, **kw):
    import ray.data as rd

    from ocr_service_ray.ops.streaming import stream_stream_join

    out = (
        stream_stream_join(rd.from_arrow(_events(rows)), **kw)
        .to_pandas()
        .sort_values(["user_id", "left_id", "right_id"])
        .reset_index(drop=True)
    )
    return set(zip(out["left_id"], out["right_id"], out["delta_us"]))


def test_stream_join_hand_computed_edges():
    rows = [
        (1, 0, 1, "view"),
        (2, HOUR // 2, 1, "purchase"),   # in window → pair (1,2)
        (3, HOUR, 1, "purchase"),        # exactly at the edge → pair (1,3)
        (4, HOUR + 1, 1, "purchase"),    # one µs past → no pair with 1
        (5, HOUR + 1, 1, "view"),
        (6, HOUR + 1, 1, "purchase"),    # EQUAL ts to view 5 → pair (5,6)
        (7, 0, 2, "purchase"),           # other user, before any view
        (8, 1, 2, "view"),               # purchase precedes view → none
    ]
    got = _run(rows, window_minutes=60.0)
    assert got == {
        (1, 2, HOUR // 2),
        (1, 3, HOUR),
        (5, 4, 0),  # view 5 and purchase 4 share ts HOUR+1 → delta 0
        (5, 6, 0),
    }


def test_stream_join_matches_batch_reference_any_layout():
    import ray.data as rd

    from ocr_service_ray.ops.streaming import stream_stream_join

    rng = np.random.default_rng(7)
    n = 2000
    rows = [
        (
            i,
            int(rng.integers(0, 30 * HOUR)),
            int(rng.integers(0, 25)),
            rng.choice(["view", "purchase", "click"]),
        )
        for i in range(n)
    ]
    df = pd.DataFrame(rows, columns=["event_id", "us", "user_id", "event_type"])
    v = df[df["event_type"] == "view"]
    p = df[df["event_type"] == "purchase"]
    ref = set()
    m = v.merge(p, on="user_id", suffixes=("_v", "_p"))
    m = m[(m["us_p"] >= m["us_v"]) & (m["us_p"] <= m["us_v"] + HOUR)]
    ref = set(
        zip(m["event_id_v"], m["event_id_p"], m["us_p"] - m["us_v"])
    )
    for parts in (1, 13):
        ds = rd.from_arrow(_events(rows)).repartition(parts)
        out = stream_stream_join(ds, window_minutes=60.0).to_pandas()
        got = set(zip(out["left_id"], out["right_id"], out["delta_us"]))
        assert got == ref
        assert len(out) == len(ref)  # exactly-once: no duplicate rows


def test_delta_dedup_disjoint_corpora_all_unique():
    import ray.data as rd

    from ocr_service_ray.ops.incremental import delta_dedup

    base = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta gamma delta", "x y z w"], pa.string()),
        }
    )
    delta = pa.table(
        {
            "doc_id": pa.array([10, 11], pa.int64()),
            "text": pa.array(
                ["totally fresh content one", "totally fresh content two"],
                pa.string(),
            ),
        }
    )
    out = delta_dedup(rd.from_arrow(base), rd.from_arrow(delta))
    # empty joins used to come back schema-less and KeyError on merge
    assert list(out["status"]) == ["unique", "unique"]
    assert list(out["match_id"]) == [-1, -1]
