"""Rendezvous (highest-random-weight) hashing — shard assignment and
rebalance auditing (Thaler & Ravishankar 1996; the consistent-routing
scheme behind cache/shard placement with minimal disruption).

Every key goes to ``argmax over shards of h(key, shard)``; when the
shard set changes, ONLY keys whose argmax involved a removed shard
(or is won by a new shard) move — the minimal-disruption property the
audit makes measurable before an actual resharding job is run.

100-TB shape: assignment is stateless per row, so the audit is one
streamed scan folding each block to per-(before, after) shard-pair
counts — a |shards|²-bounded combiner; no shuffle, no driver data.

Determinism/oracle contract: h = first 15 hex chars of
``md5(key || ':' || shard)`` (the repo-wide md5 discipline, SQL-exact
via the hex-parse helper); ties — absent at 60 bits, but contractually
— break to the lexicographically smallest shard, which the scan
realizes by probing shards in sorted order and taking the first
maximum. Production would swap md5 for ops/hashing's xxhash-style mix
and keep the identical shape."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _hrw_pick(keys: list[str], shards: list[str]) -> np.ndarray:
    """Index into sorted(shards) of the HRW winner per key."""
    order = sorted(shards)
    scores = np.empty((len(order), len(keys)), dtype=np.uint64)
    for i, sh in enumerate(order):
        suffix = (":" + sh).encode()
        scores[i] = np.fromiter(
            (
                int(hashlib.md5(str(k).encode() + suffix).hexdigest()[:15], 16)
                for k in keys
            ),
            dtype=np.uint64,
            count=len(keys),
        )
    return np.argmax(scores, axis=0)  # first max = smallest shard name


def rendezvous_rebalance_audit(
    ds, key_col: str, shards_before: list[str], shards_after: list[str]
) -> pd.DataFrame:
    """Per-shard row counts under the before/after shard sets plus the
    rows that would move INTO each shard — one streamed scan, a
    |shards|²-bounded pair-count combiner, exact integers.

    Returns one row per shard in sorted(before ∪ after):
    ``(shard, n_before, n_after, n_moved_in)``; Σ n_moved_in is the
    total resharding traffic."""
    from ocr_service_ray.ops.agg import grouped_agg

    ob, oa = sorted(shards_before), sorted(shards_after)

    def pairs(b: pa.Table) -> pa.Table:
        keys = [str(k) for k in b[key_col].to_pylist()]
        if not keys:
            return pa.table(
                {
                    "sb": pa.array([], pa.string()),
                    "sa": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ib = _hrw_pick(keys, ob)
        ia = _hrw_pick(keys, oa)
        pair = ib.astype(np.int64) * len(oa) + ia
        u, c = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "sb": pa.array([ob[int(p) // len(oa)] for p in u]),
                "sa": pa.array([oa[int(p) % len(oa)] for p in u]),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    pc_tab = grouped_agg(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["sb", "sa"],
        {"n": ("n", "sum")},
    ).to_pandas()

    all_shards = sorted(set(ob) | set(oa))
    n_before = pc_tab.groupby("sb")["n"].sum()
    n_after = pc_tab.groupby("sa")["n"].sum()
    moved = pc_tab[pc_tab["sb"] != pc_tab["sa"]].groupby("sa")["n"].sum()
    return pd.DataFrame(
        {
            "shard": all_shards,
            "n_before": [int(n_before.get(s, 0)) for s in all_shards],
            "n_after": [int(n_after.get(s, 0)) for s in all_shards],
            "n_moved_in": [int(moved.get(s, 0)) for s in all_shards],
        }
    )
