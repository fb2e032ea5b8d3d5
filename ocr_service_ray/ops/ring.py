"""Consistent-hash ring with virtual nodes — Karger et al. 1997
(the Chord/Dynamo partitioning move): every shard owns V
pseudo-random ring positions; a key lands on the first vnode
clockwise from its own position. Adding/removing a shard moves ONLY
the keys adjacent to its vnodes — the minimal-disruption guarantee
rendezvous hashing (ops/rendezvous.py) gets per-key, the ring gets
per-arc, and the V vnodes bound per-shard load imbalance.

Determinism contract (oracle-replayed, repo md5 discipline):
  vnode pos = md5('ring:' || shard || ':' || v) hex[0:15] as int
  key   pos = md5('key:'  || key)               hex[0:15] as int
  owner(key) = shard of the vnode with the smallest pos >= key pos,
  wrapping to the globally smallest vnode (60-bit positions — ties
  absent in practice, contractually broken by (pos, shard)).

100-TB shape: both vnode tables are broadcast-bounded (|shards|·V);
per-event assignment is one vectorized searchsorted per batch; the
audit folds to a (shard_before, shard_after) bounded combiner in
ONE scan."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def ring_positions(shards: list[str], vnodes: int) -> tuple[np.ndarray, list[str]]:
    """Sorted vnode positions and their shard owners."""
    rows = sorted(
        (_h60(f"ring:{sh}:{v}"), sh) for sh in shards for v in range(vnodes)
    )
    pos = np.array([p for p, _ in rows], dtype=np.uint64)
    own = [sh for _, sh in rows]
    return pos, own


def ring_reshard_audit(
    ds,
    key_col: str,
    before: list[str],
    after: list[str],
    vnodes: int = 8,
) -> pd.DataFrame:
    """(shard_before, shard_after, n_events) traffic matrix of the
    ring assignment under both shard sets, in one scan."""
    from ocr_service_ray.ops.agg import grouped_agg

    pb, ob = ring_positions(before, vnodes)
    pa_, oa = ring_positions(after, vnodes)

    def assign(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        kp = np.array([_h60(f"key:{k}") for k in keys], dtype=np.uint64)
        ib = np.searchsorted(pb, kp, side="left")
        ia = np.searchsorted(pa_, kp, side="left")
        ib[ib == len(pb)] = 0
        ia[ia == len(pa_)] = 0
        return pa.table(
            {
                "shard_before": pa.array([ob[i] for i in ib]),
                "shard_after": pa.array([oa[i] for i in ia]),
                "one": pa.array(np.ones(len(kp), np.int64)),
            }
        )

    out = (
        grouped_agg(
            ds.map_batches(assign, batch_format="pyarrow"),
            ["shard_before", "shard_after"],
            {"n_events": ("one", "sum")},
        )
        .to_pandas()
        .sort_values(["shard_before", "shard_after"])
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out
