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
``@ray.remote`` actors), and the DRIVER IS NOT THE DATA PLANE:

- the ts-ordered log's blocks are dispatched by REMOTE tasks (one per
  time partition) that split their block by user-hash bucket and push
  the slices straight to the owning ``SessionBucketActor`` — the
  driver holds block refs and task handles only, never rows;
- partition order is enforced by SEQUENCE NUMBERS: every dispatch
  carries its partition index and each actor reorders out-of-order
  arrivals in a bounded buffer, so correctness does not depend on
  Ray's (undocumented) cross-task delivery order or on
  ``execution_options.preserve_order``;
- each actor asserts ts-monotonicity across the partitions it
  processes and fails fast on violation (the load-bearing ordering
  assumption made checkable);
- closed sessions stream OUT as per-actor Arrow tables returned by
  reference; the result is ``ray.data.from_arrow_refs`` — a Dataset,
  no driver-side DataFrame of all sessions.

Partitioning/ordering assumptions (load-bearing, per the build
contract): (1) partitions are disjoint, ascending time ranges and
rows within a partition are ts-ordered — satisfied here by one
distributed ``ds.sort(ts_col)`` (at scale: read a time-partitioned
log partition-by-partition, no sort); (2) a user maps to exactly one
bucket (element-pure hash — ops/hashing.py). Late events would need a
watermark + next-epoch handling, as §2.9's epoch note prescribes.

Scale note: an actor holds O(open users in bucket) state plus its
closed-session buffer; at corpus scale ``drain`` is called per epoch
(or the actor spills closed sessions to parquet) so the buffer is
bounded by a window, not the log.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_remote_cache: dict = {}


def _session_actor_cls():
    import ray

    if "actor" in _remote_cache:
        return _remote_cache["actor"]

    @ray.remote
    class SessionBucketActor:
        """Holds open sessions for the users of ONE hash bucket.

        State per user: (session_start, last_ts, n_events). ``ingest``
        consumes one partition's slice of this bucket's events —
        partitions may arrive out of order and are reordered by
        ``seq`` before processing; ``drain`` closes the rest and
        returns all closed sessions as an Arrow table.
        Memory is O(active users in bucket) + O(closed sessions since
        last drain), never O(events).
        """

        def __init__(self, gap_us: int, user_type: pa.DataType):
            self.gap = gap_us
            self.user_type = user_type
            self.open: dict = {}
            self.closed: list[tuple] = []
            self.buffer: dict = {}
            self.next_seq = 0
            self.last_ts: int | None = None

        def ingest(self, seq: int, users: list, ts_us: list) -> int:
            self.buffer[seq] = (users, ts_us)
            while self.next_seq in self.buffer:
                u, t = self.buffer.pop(self.next_seq)
                self._process(u, t)
                self.next_seq += 1
            return len(self.buffer)  # backpressure signal: reorder depth

        def _process(self, users: list, ts_us: list) -> None:
            # timestamps are integer MICROSECONDS end-to-end: float
            # seconds at 2026 epoch magnitudes have >0.1 µs ulp and
            # would drift session bounds off the exact-match oracle
            if ts_us:
                if self.last_ts is not None and ts_us[0] < self.last_ts:
                    raise RuntimeError(
                        "sessionize_streaming: partition order violated "
                        f"({ts_us[0]} < {self.last_ts}) — the time-partitioned "
                        "input is not ascending"
                    )
                self.last_ts = ts_us[-1]
            for u, t in zip(users, ts_us):
                st = self.open.get(u)
                if st is None:
                    self.open[u] = [t, t, 1]
                elif t - st[1] > self.gap:
                    self.closed.append((u, st[0], st[1], st[2]))
                    self.open[u] = [t, t, 1]
                else:
                    st[1] = t
                    st[2] += 1

        def drain(self) -> pa.Table:
            if self.buffer:
                raise RuntimeError(
                    f"sessionize_streaming: {len(self.buffer)} partitions "
                    "never became processable (missing sequence numbers)"
                )
            rows = self.closed + [
                (u, st[0], st[1], st[2]) for u, st in self.open.items()
            ]
            self.closed = []
            self.open.clear()
            cols = list(zip(*rows)) if rows else [[], [], [], []]
            # user_id explicitly typed: an empty bucket's pa.array([])
            # would otherwise infer null type and break the cross-ref
            # schema union
            return pa.table(
                {
                    "user_id": pa.array(cols[0], self.user_type),
                    "session_start": pa.array(cols[1], pa.int64()),
                    "session_end": pa.array(cols[2], pa.int64()),
                    "n_events": pa.array(cols[3], pa.int64()),
                }
            )

    _remote_cache["actor"] = SessionBucketActor
    return SessionBucketActor


def _dispatch_task():
    import ray

    if "dispatch" in _remote_cache:
        return _remote_cache["dispatch"]

    @ray.remote
    def dispatch(block: pa.Table, seq: int, actors: list, user_col: str, ts_col: str) -> int:
        """Split ONE time partition by user-hash bucket and push every
        slice to its owning actor (runs on a worker — the data plane
        never touches the driver). Sends to ALL buckets, empty or not,
        so each actor's sequence counter always advances."""
        from ocr_service_ray.ops.hashing import hash_column

        num_buckets = len(actors)
        users = block[user_col]
        buckets = (hash_column(users) % np.uint64(num_buckets)).astype(np.int64)
        ts = (
            pa.compute.cast(block[ts_col], pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ulist = users.to_pylist()
        refs = []
        for b in range(num_buckets):
            mask = buckets == b
            refs.append(
                actors[b].ingest.remote(
                    seq,
                    [u for u, m in zip(ulist, mask) if m],
                    ts[mask].tolist(),
                )
            )
        ray.get(refs)  # completion ⇒ every bucket accepted this partition
        return block.num_rows

    _remote_cache["dispatch"] = dispatch
    return dispatch


def _window_actor_cls():
    import ray

    if "wactor" in _remote_cache:
        return _remote_cache["wactor"]

    @ray.remote
    class WindowBucketActor:
        """Tumbling-window partial aggregates for the keys of ONE hash
        bucket, with WATERMARK-based window closing: once the bucket's
        watermark (max seen ts − allowed lateness) passes a window's
        end, that window is final — its aggregate moves to the closed
        buffer and its state is freed. Memory is O(open windows ×
        keys in bucket), never O(events). Partitions reorder by
        ``seq`` exactly like the session actor."""

        def __init__(self, window_us: int, lateness_us: int, key_type: pa.DataType):
            self.window = window_us
            self.lateness = lateness_us
            self.key_type = key_type
            self.open: dict = {}
            self.closed: list[tuple] = []
            self.buffer: dict = {}
            self.next_seq = 0
            self.last_ts: int | None = None

        def ingest(self, seq: int, keys: list, ts_us: list, values: list) -> int:
            self.buffer[seq] = (keys, ts_us, values)
            while self.next_seq in self.buffer:
                k, t, v = self.buffer.pop(self.next_seq)
                self._process(k, t, v)
                self.next_seq += 1
            return len(self.open)

        def _process(self, keys: list, ts_us: list, values: list) -> None:
            if ts_us:
                if self.last_ts is not None and ts_us[0] < self.last_ts:
                    raise RuntimeError(
                        "windowed_agg_streaming: partition order violated "
                        f"({ts_us[0]} < {self.last_ts})"
                    )
                self.last_ts = ts_us[-1]
            win = self.window
            for k, t, v in zip(keys, ts_us, values):
                w = t - t % win
                st = self.open.get((w, k))
                if st is None:
                    self.open[(w, k)] = [1, v]
                else:
                    st[0] += 1
                    st[1] += v
            # advance the watermark; windows entirely behind it are
            # final (per-bucket ts monotonicity makes this safe: no
            # future event can land before last_ts − lateness)
            if self.last_ts is not None:
                wm = self.last_ts - self.lateness
                done = [wk for wk in self.open if wk[0] + win <= wm]
                for wk in done:
                    n, s = self.open.pop(wk)
                    self.closed.append((wk[0], wk[1], n, s))

        def drain(self) -> pa.Table:
            if self.buffer:
                raise RuntimeError(
                    f"windowed_agg_streaming: {len(self.buffer)} partitions "
                    "never became processable"
                )
            rows = self.closed + [
                (w, k, st[0], st[1]) for (w, k), st in self.open.items()
            ]
            self.closed = []
            self.open.clear()
            cols = list(zip(*rows)) if rows else [[], [], [], []]
            return pa.table(
                {
                    "window_us": pa.array(cols[0], pa.int64()),
                    "key": pa.array(cols[1], self.key_type),
                    "n_events": pa.array(cols[2], pa.int64()),
                    "sum_value": pa.array(cols[3], pa.int64()),
                }
            )

    _remote_cache["wactor"] = WindowBucketActor
    return WindowBucketActor


def _window_dispatch_task():
    import ray

    if "wdispatch" in _remote_cache:
        return _remote_cache["wdispatch"]

    @ray.remote
    def dispatch(
        block: pa.Table, seq: int, actors: list, key_col: str, ts_col: str, value_col: str
    ) -> int:
        from ocr_service_ray.ops.hashing import hash_column

        num_buckets = len(actors)
        keys = block[key_col]
        buckets = (hash_column(keys) % np.uint64(num_buckets)).astype(np.int64)
        ts = (
            pa.compute.cast(block[ts_col], pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        vals = block[value_col].to_numpy(zero_copy_only=False)
        klist = keys.to_pylist()
        refs = []
        for b in range(num_buckets):
            mask = buckets == b
            refs.append(
                actors[b].ingest.remote(
                    seq,
                    [k for k, m in zip(klist, mask) if m],
                    ts[mask].tolist(),
                    vals[mask].tolist(),
                )
            )
        ray.get(refs)
        return block.num_rows

    _remote_cache["wdispatch"] = dispatch
    return dispatch


def windowed_agg_streaming(
    events_ds,
    window_minutes: float = 60.0,
    allowed_lateness_minutes: float = 0.0,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    num_buckets: int = 8,
):
    """Streaming tumbling-window aggregate with watermark closing —
    the incremental complement of ``relational.windowed_agg``. Window
    aggregates close (and free their state) as the per-bucket
    watermark passes them instead of at end-of-log; after a full
    drain the result equals the batch aggregate exactly, which is
    what the SQL oracle asserts. ``value_col`` must be integral
    (floor-cents upstream) so distributed sums are order-independent.

    Returns a Dataset {window_us, key, n_events, sum_value} built
    from actor-produced Arrow refs — like sessionize_streaming, the
    driver never handles row data.
    """
    import ray
    import ray.data as rd

    actor_cls = _window_actor_cls()
    dispatch = _window_dispatch_task()
    key_type = events_ds.schema().base_schema.field(key_col).type
    actors = [
        actor_cls.remote(
            int(window_minutes * 60_000_000),
            int(allowed_lateness_minutes * 60_000_000),
            key_type,
        )
        for _ in range(num_buckets)
    ]

    block_refs = events_ds.sort(ts_col).to_arrow_refs()
    inflight: list = []
    done: list = []
    window = 4 * num_buckets
    for seq, ref in enumerate(block_refs):
        inflight.append(dispatch.remote(ref, seq, actors, key_col, ts_col, value_col))
        if len(inflight) >= window:
            d, inflight = ray.wait(inflight, num_returns=len(inflight) - window + 1)
            done.extend(d)
    ray.get(inflight + done)

    out = rd.from_arrow_refs([a.drain.remote() for a in actors]).materialize()
    for a in actors:
        ray.kill(a)
    return out


def sessionize_streaming(
    events_ds,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 8,
):
    """Incremental sessionization over the ts-ordered event stream.

    Returns a Dataset with one row per SESSION: {user_id,
    session_start, session_end, n_events}, bounds as integer epoch
    MICROSECONDS (richer than the batch op's per-user summary —
    closed sessions stream out while the log is still being read).
    """
    import ray
    import ray.data as rd

    actor_cls = _session_actor_cls()
    dispatch = _dispatch_task()
    user_type = events_ds.schema().base_schema.field(user_col).type
    actors = [
        actor_cls.remote(int(gap_minutes * 60_000_000), user_type)
        for _ in range(num_buckets)
    ]

    # Sandbox stand-in for a time-partitioned log: one distributed
    # sort; the sorted Dataset's blocks ARE the ascending partitions.
    # At scale, skip the sort and read the log's partitions in order.
    block_refs = events_ds.sort(ts_col).to_arrow_refs()

    inflight: list = []
    done: list = []
    window = 4 * num_buckets  # bounded dispatch window (backpressure)
    for seq, ref in enumerate(block_refs):
        inflight.append(dispatch.remote(ref, seq, actors, user_col, ts_col))
        if len(inflight) >= window:
            d, inflight = ray.wait(inflight, num_returns=len(inflight) - window + 1)
            done.extend(d)
    ray.get(inflight + done)  # all partitions delivered; surfaces task errors

    out = rd.from_arrow_refs([a.drain.remote() for a in actors])
    # out holds object-store refs; the actors can go away now.
    out = out.materialize()
    for a in actors:
        ray.kill(a)
    return out


def _dedup_actor_cls():
    import ray

    if "dedup_actor" in _remote_cache:
        return _remote_cache["dedup_actor"]

    @ray.remote
    class DedupShardActor:
        """Owns one shard of the SEEN-HASH INDEX — the canonical
        'shared mutable index' that Dataset map_batches cannot express
        (no key→actor affinity across batches). Partition slices
        arrive with sequence numbers and are reordered in a bounded
        buffer, so first-occurrence is decided in LOG order, not Ray
        delivery order."""

        def __init__(self, id_type_str: str):
            self.seen: set = set()
            self.kept_ids: list = []
            self.kept_hashes: list = []
            self.next_seq = 0
            self.pending: dict = {}
            self.id_type = id_type_str

        def process(self, seq: int, ids: list, hashes: list) -> None:
            self.pending[seq] = (ids, hashes)
            while self.next_seq in self.pending:
                pids, phashes = self.pending.pop(self.next_seq)
                for doc, h in zip(pids, phashes):
                    if h not in self.seen:
                        self.seen.add(h)
                        self.kept_ids.append(doc)
                        self.kept_hashes.append(h)
                self.next_seq += 1

        def drain(self):
            assert not self.pending, "gap in partition sequence"
            return pa.table(
                {
                    "doc_id": pa.array(self.kept_ids, type=getattr(pa, self.id_type)()),
                    "text_hash": pa.array(self.kept_hashes, pa.string()),
                }
            )

    _remote_cache["dedup_actor"] = DedupShardActor
    return DedupShardActor


def _dedup_dispatch_task():
    import ray

    if "dedup_dispatch" in _remote_cache:
        return _remote_cache["dedup_dispatch"]

    @ray.remote
    def dedup_dispatch(block: pa.Table, seq: int, actors, id_col: str, text_col: str):
        # md5 per row (the oracle hash — SQL recomputes it); bucket by
        # an element-pure hash of the hex so each actor owns a disjoint
        # shard of hash space
        from ocr_service_ray.ops.hashing import hash_column
        from ocr_service_ray.ops.text import content_hash

        hashed = content_hash(block, text_col)
        buckets = hash_column(hashed["text_hash"]) % np.uint64(len(actors))
        ids = block[id_col].to_pylist()
        hexes = hashed["text_hash"].to_pylist()
        waits = []
        for i, a in enumerate(actors):
            mask = buckets == i
            waits.append(
                a.process.remote(
                    seq,
                    [d for d, m in zip(ids, mask) if m],
                    [h for h, m in zip(hexes, mask) if m],
                )
            )
        ray.get(waits)  # dispatch returns once every shard accepted

    _remote_cache["dedup_dispatch"] = dedup_dispatch
    return dedup_dispatch


def streaming_dedup(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 8,
):
    """Incremental exact dedup over an ORDERED document log: the first
    occurrence of each content hash survives, later arrivals drop —
    the ingest-time dedup shape, where the corpus index must persist
    ACROSS batches while new documents stream in (vs ``exact_dedup``'s
    batch groupby, which needs the whole corpus per run).

    Same last-resort-tier architecture as ``sessionize_streaming``
    (driver never touches rows): remote dispatch tasks hash each
    id-ordered partition and push per-shard slices to
    ``DedupShardActor``s; sequence numbers + per-actor reordering make
    first-occurrence a LOG-order fact regardless of task scheduling;
    survivors stream out via ``from_arrow_refs``.

    Ordering assumption (load-bearing): partitions ascend by
    ``id_col`` and rows within a partition are id-sorted — the sandbox
    stand-in is one distributed sort; a real ingest reads its ordered
    log partitions directly. Returns {doc_id, text_hash} of survivors.
    """
    import ray
    import ray.data as rd

    actor_cls = _dedup_actor_cls()
    dispatch = _dedup_dispatch_task()
    id_type = docs_ds.schema().base_schema.field(id_col).type
    actors = [actor_cls.remote(str(id_type)) for _ in range(num_buckets)]

    block_refs = docs_ds.sort(id_col).to_arrow_refs()

    inflight: list = []
    done: list = []
    window = 4 * num_buckets
    for seq, ref in enumerate(block_refs):
        inflight.append(dispatch.remote(ref, seq, actors, id_col, text_col))
        if len(inflight) >= window:
            d, inflight = ray.wait(inflight, num_returns=len(inflight) - window + 1)
            done.extend(d)
    ray.get(inflight + done)

    out = rd.from_arrow_refs([a.drain.remote() for a in actors]).materialize()
    for a in actors:
        ray.kill(a)
    return out


def _join_actor_cls():
    import ray

    if "join_actor" in _remote_cache:
        return _remote_cache["join_actor"]

    @ray.remote
    class JoinBucketActor:
        """Watermark-bounded stream-stream interval join for the users
        of ONE hash bucket: pair (left, right) iff same user and
        left.ts ≤ right.ts ≤ left.ts + window.

        Exactly-once emission without a global barrier: every arriving
        row matches against the OPPOSITE side's buffer before joining
        its own, so each qualifying pair is emitted precisely when its
        later-processed element arrives. State is evicted by the
        watermark (max ts fully processed): a left is dead once
        ``left.ts + window < wm`` (no future right can reach back to
        it), a right once ``right.ts < wm`` (no future left can
        precede it) — so per-user state is one window deep, never
        O(stream). The sessionizer's monotonicity fail-fast guards the
        ordering assumption.
        """

        def __init__(self, window_us: int, user_type: pa.DataType):
            self.w = window_us
            self.user_type = user_type
            self.left: dict = {}   # user -> list[(ts, id)]
            self.right: dict = {}
            self.pairs: list[tuple] = []
            self.buffer: dict = {}
            self.next_seq = 0
            self.last_ts: int | None = None

        def ingest(self, seq: int, users, ts_us, ids, sides) -> int:
            self.buffer[seq] = (users, ts_us, ids, sides)
            while self.next_seq in self.buffer:
                self._process(*self.buffer.pop(self.next_seq))
                self.next_seq += 1
            return len(self.buffer)

        def _evict(self, wm: int) -> None:
            for u in list(self.left):
                kept = [e for e in self.left[u] if e[0] + self.w >= wm]
                if kept:
                    self.left[u] = kept
                else:
                    del self.left[u]
            for u in list(self.right):
                kept = [e for e in self.right[u] if e[0] >= wm]
                if kept:
                    self.right[u] = kept
                else:
                    del self.right[u]

        def _process(self, users, ts_us, ids, sides) -> None:
            if ts_us:
                if self.last_ts is not None and ts_us[0] < self.last_ts:
                    raise RuntimeError(
                        "stream_stream_join: partition order violated "
                        f"({ts_us[0]} < {self.last_ts})"
                    )
                self._evict(self.last_ts if self.last_ts is not None else 0)
                self.last_ts = ts_us[-1]
            for u, t, i, s in zip(users, ts_us, ids, sides):
                if s:  # right (late side): match buffered lefts
                    for lt, li in self.left.get(u, ()):
                        if lt <= t <= lt + self.w:
                            self.pairs.append((u, li, i, t - lt))
                    self.right.setdefault(u, []).append((t, i))
                else:  # left: only equal-ts rights can already be buffered
                    for rt, ri in self.right.get(u, ()):
                        if t <= rt <= t + self.w:
                            self.pairs.append((u, i, ri, rt - t))
                    self.left.setdefault(u, []).append((t, i))

        def drain(self) -> pa.Table:
            if self.buffer:
                raise RuntimeError(
                    f"stream_stream_join: {len(self.buffer)} partitions "
                    "never became processable"
                )
            rows = self.pairs
            self.pairs = []
            self.left.clear()
            self.right.clear()
            cols = list(zip(*rows)) if rows else [[], [], [], []]
            return pa.table(
                {
                    "user_id": pa.array(cols[0], self.user_type),
                    "left_id": pa.array(cols[1], pa.int64()),
                    "right_id": pa.array(cols[2], pa.int64()),
                    "delta_us": pa.array(cols[3], pa.int64()),
                }
            )

    _remote_cache["join_actor"] = JoinBucketActor
    return JoinBucketActor


def _join_dispatch_task():
    import ray

    if "join_dispatch" in _remote_cache:
        return _remote_cache["join_dispatch"]

    @ray.remote
    def dispatch(
        block: pa.Table,
        seq: int,
        actors: list,
        user_col: str,
        ts_col: str,
        id_col: str,
        side_col: str,
    ) -> int:
        from ocr_service_ray.ops.hashing import hash_column

        num_buckets = len(actors)
        users = block[user_col]
        buckets = (hash_column(users) % np.uint64(num_buckets)).astype(np.int64)
        ts = (
            pa.compute.cast(block[ts_col], pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ids = block[id_col].to_numpy(zero_copy_only=False)
        sides = block[side_col].to_numpy(zero_copy_only=False)
        ulist = users.to_pylist()
        refs = []
        for b in range(num_buckets):
            mask = buckets == b
            refs.append(
                actors[b].ingest.remote(
                    seq,
                    [u for u, m in zip(ulist, mask) if m],
                    ts[mask].tolist(),
                    ids[mask].tolist(),
                    sides[mask].tolist(),
                )
            )
        ray.get(refs)
        return block.num_rows

    _remote_cache["join_dispatch"] = dispatch
    return dispatch


def stream_stream_join(
    events_ds,
    left_type: str = "view",
    right_type: str = "purchase",
    window_minutes: float = 60.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_buckets: int = 8,
):
    """Watermark-bounded interval join of two event streams riding one
    ts-ordered log: every (``left_type``, ``right_type``) pair of the
    same user with ``left.ts ≤ right.ts ≤ left.ts + window``. Returns
    a Dataset {user_id, left_id, right_id, delta_us}.

    Same last-resort-tier architecture as ``sessionize_streaming``
    (driver never holds rows; dispatch tasks are the data plane;
    sequence-numbered reordering; ``from_arrow_refs`` collection).
    The equivalent batch shape is a range self-join — the oracle pays
    it; the streaming engine holds one window of state per user.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    actor_cls = _join_actor_cls()
    dispatch = _join_dispatch_task()
    window_us = int(window_minutes * 60 * 1_000_000)
    user_type = events_ds.schema().base_schema.field(user_col).type
    actors = [actor_cls.remote(window_us, user_type) for _ in range(num_buckets)]

    def project(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b[type_col], value_set=pa.array([left_type, right_type])
        )
        b = b.filter(keep)
        return pa.table(
            {
                user_col: b[user_col],
                ts_col: b[ts_col],
                id_col: b[id_col].cast(pa.int64()),
                "_side": pc.equal(b[type_col], right_type),
            }
        )

    block_refs = (
        events_ds.map_batches(project, batch_format="pyarrow")
        .sort(ts_col)
        .to_arrow_refs()
    )
    inflight: list = []
    done: list = []
    window = 4 * num_buckets
    for seq, ref in enumerate(block_refs):
        inflight.append(
            dispatch.remote(ref, seq, actors, user_col, ts_col, id_col, "_side")
        )
        if len(inflight) >= window:
            d, inflight = ray.wait(inflight, num_returns=len(inflight) - window + 1)
            done.extend(d)
    ray.get(inflight + done)

    out = rd.from_arrow_refs([a.drain.remote() for a in actors]).materialize()
    for a in actors:
        ray.kill(a)
    return out
