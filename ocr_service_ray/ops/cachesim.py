"""Cache-policy replay — exact hit/miss simulation of LRU, FIFO and
Belady's optimal MIN policy (Belady 1966) over a deterministic
access stream: the capacity-planning primitive for block caches,
shuffle-read caches and feature-store tiers ("how much would a
C-entry cache save on THIS trace?").

Determinism contract (LRU/FIFO oracle-replayed as list-carrying
recursive CTE; Belady pytest-verified — lookahead needs the future
occurrence index, out of honest SQL reach):
  stream  = first N accesses ordered by (ts, event_id), key-bounded
  LRU     : hit moves key to most-recent; miss appends, evicts the
            least-recent when over capacity
  FIFO    : hit changes nothing; miss appends, evicts the oldest
            inserted
  BELADY  : miss evicts the cached key whose next use is farthest
            (never-used-again first, ties to smallest key)
  evictions = misses - final cache size

100-TB shape: the trace is a sorted bounded prefix (the op is a
planner, not a data-plane stage); the replay is O(N*C) driver
close."""

from __future__ import annotations

import pandas as pd


def _replay_lru(keys: list[int], cap: int) -> tuple[int, int, int]:
    cache: list[int] = []
    hits = 0
    for k in keys:
        if k in cache:
            hits += 1
            cache.remove(k)
            cache.append(k)
        else:
            cache.append(k)
            if len(cache) > cap:
                cache.pop(0)
    misses = len(keys) - hits
    return hits, misses, misses - len(cache)


def _replay_fifo(keys: list[int], cap: int) -> tuple[int, int, int]:
    cache: list[int] = []
    hits = 0
    for k in keys:
        if k in cache:
            hits += 1
        else:
            cache.append(k)
            if len(cache) > cap:
                cache.pop(0)
    misses = len(keys) - hits
    return hits, misses, misses - len(cache)


def _replay_belady(keys: list[int], cap: int) -> tuple[int, int, int]:
    nxt: dict[int, list[int]] = {}
    for i, k in enumerate(keys):
        nxt.setdefault(k, []).append(i)
    ptr = {k: 0 for k in nxt}
    cache: set[int] = set()
    hits = 0
    INF = len(keys) + 1
    for i, k in enumerate(keys):
        ptr[k] += 1
        if k in cache:
            hits += 1
            continue
        if len(cache) >= cap:
            # evict farthest next use; never-again first; ties ->
            # smallest key
            def next_use(c):
                occ = nxt[c]
                p = ptr[c]
                while p < len(occ) and occ[p] <= i:
                    p += 1
                return occ[p] if p < len(occ) else INF

            victim = max(cache, key=lambda c: (next_use(c), -c))
            cache.discard(victim)
        cache.add(k)
    misses = len(keys) - hits
    return hits, misses, misses - len(cache)


def cache_report(keys: list[int], cap: int, policies=("lru", "fifo", "belady")) -> pd.DataFrame:
    fn = {"lru": _replay_lru, "fifo": _replay_fifo, "belady": _replay_belady}
    rows = []
    for p in policies:
        h, m, e = fn[p](list(keys), cap)
        rows.append((p, h, m, e))
    out = pd.DataFrame(rows, columns=["policy", "hits", "misses", "evictions"])
    for c in ("hits", "misses", "evictions"):
        out[c] = out[c].astype("int64")
    return out.sort_values("policy").reset_index(drop=True)
