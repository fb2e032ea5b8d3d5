"""Open-addressing insertion replay — classic linear probing (Knuth
TAOCP 6.4): insert keys in a fixed order into an m-slot table at
h(k) = md5-derived position, walking cyclically to the first free
slot. The probe-length profile is THE load-factor planning signal
for open-addressed hash layouts (probe_len explodes past ~0.7 load
— visible exactly, per key, no simulation noise).

Determinism contract (oracle replays every insertion carrying the
occupied-slot list): keys inserted ascending; h(k) =
md5('lp:' || k) hex[0:15] as int mod m; probe_len = 1 + cyclic
distance to the chosen slot.

100-TB shape: the key sample is a bounded sorted prefix; the replay
is the planner's O(n·m) driver close."""

from __future__ import annotations

import hashlib

import pandas as pd


def lp_insert_replay(keys: list[int], m: int = 32) -> pd.DataFrame:
    """(key, h, slot, probe_len) in insertion order; keys beyond
    capacity raise (contract: len(keys) <= m)."""
    if len(keys) > m:
        raise ValueError("more keys than slots")
    occupied: set[int] = set()
    rows = []
    for k in keys:
        h = int(hashlib.md5(f"lp:{k}".encode()).hexdigest()[:15], 16) % m
        d = 0
        while (h + d) % m in occupied:
            d += 1
        slot = (h + d) % m
        occupied.add(slot)
        rows.append((k, h, slot, d + 1))
    return pd.DataFrame(
        rows, columns=["key", "h", "slot", "probe_len"]
    ).astype("int64")
