"""Streaming-shaped session windows with incremental actor state.

``ops/relational.sessionize`` is the BATCH implementation (one
groupby(user) pass) — right whenever the whole log is available. This
module is the STREAMING shape (ray_guide "Streaming-shaped
workloads"): events arrive as an ordered, partitioned log; per-user
open-session state must persist ACROSS batches with bounded memory;
sessions close as soon as their gap expires, not at end-of-log.

Ray Data's Dataset API cannot express this — an actor-pool
``map_batches`` gives no key→actor affinity, so cross-batch per-user
state would scatter. This is the documented last-resort tier (raw
``@ray.remote`` actors): one ``SessionBucketActor`` per user-hash
bucket holds the open sessions of exactly its users; the driver
streams ts-ordered batches, splits each batch by bucket (vectorized),
and dispatches the pieces ASYNCHRONOUSLY to the owning actors — the
driver loop handles batch refs, never rows.

Partitioning/ordering assumptions (load-bearing, per the build
contract): (1) a user's events are delivered in ts order — satisfied
here by one global ``ds.sort(ts_col)``, or at scale by reading a
time-partitioned log in order; (2) a user maps to exactly one bucket
(element-pure hash — ops/hashing.py). Late events would need a
watermark + next-epoch handling, as §2.9's epoch note prescribes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _session_actor_cls():
    import ray

    @ray.remote
    class SessionBucketActor:
        """Holds open sessions for the users of ONE hash bucket.

        State per user: (session_start, last_ts, n_events). ``ingest``
        consumes a ts-ordered batch of this bucket's events and
        returns the sessions CLOSED by it; ``flush`` closes the rest.
        Memory is O(active users in bucket), not O(events).
        """

        def __init__(self, gap_us: int):
            self.gap = gap_us
            self.open: dict = {}

        def ingest(self, users: list, ts_us: list) -> list[tuple]:
            # timestamps are integer MICROSECONDS end-to-end: float
            # seconds at 2026 epoch magnitudes have >0.1 µs ulp and
            # would drift session bounds off the exact-match oracle
            closed = []
            for u, t in zip(users, ts_us):
                st = self.open.get(u)
                if st is None:
                    self.open[u] = [t, t, 1]
                elif t - st[1] > self.gap:
                    closed.append((u, st[0], st[1], st[2]))
                    self.open[u] = [t, t, 1]
                else:
                    st[1] = t
                    st[2] += 1
            return closed

        def flush(self) -> list[tuple]:
            out = [(u, st[0], st[1], st[2]) for u, st in self.open.items()]
            self.open.clear()
            return out

    return SessionBucketActor


def sessionize_streaming(
    events_ds,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 8,
) -> pd.DataFrame:
    """Incremental sessionization over the ts-ordered event stream.

    Returns one row per SESSION: {user_id, session_start, session_end,
    n_events} with the bounds as integer epoch MICROSECONDS (richer
    than the batch op's per-user summary — closed sessions stream out
    while the log is still being read).
    """
    import ray

    from ocr_service_ray.ops.hashing import hash_column

    actor_cls = _session_actor_cls()
    actors = [actor_cls.remote(int(gap_minutes * 60_000_000)) for _ in range(num_buckets)]
    pending = []

    ordered = events_ds.sort(ts_col)
    for batch in ordered.iter_batches(batch_format="pyarrow", batch_size=4096):
        users = batch[user_col]
        buckets = (hash_column(users) % np.uint64(num_buckets)).astype(np.int64)
        ts = (
            pa.compute.cast(batch[ts_col], pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ulist = users.to_pylist()
        for b in np.unique(buckets):
            mask = buckets == b
            pending.append(
                actors[int(b)].ingest.remote(
                    [u for u, m in zip(ulist, mask) if m], ts[mask].tolist()
                )
            )
        # backpressure: don't let dispatched-batch refs grow unboundedly
        if len(pending) > 4 * num_buckets:
            done, pending_rest = ray.wait(pending, num_returns=len(pending) // 2)
            pending = list(pending_rest) + done  # keep refs; results gathered below

    results = ray.get(pending)
    results.extend(ray.get([a.flush.remote() for a in actors]))
    rows = [r for chunk in results for r in chunk]
    out = pd.DataFrame(rows, columns=["user_id", "session_start", "session_end", "n_events"])
    for a in actors:
        ray.kill(a)
    return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
