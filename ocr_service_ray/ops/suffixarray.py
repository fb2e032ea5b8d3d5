"""Suffix array + LCP — Manber-Myers prefix doubling (1990) for the
sorted suffix order and Kasai's linear algorithm (2001) for adjacent
longest-common-prefixes. The per-doc exact repetitiveness profile:
max/sum of LCPs, and — via the classic identity
  distinct_substrings = n(n+1)/2 - sum(LCP)
— a count this repo ALREADY computes with a completely different
structure (the suffix automaton of ops/substrings.py), giving a
three-way check: prefix-doubling engine vs automaton engine vs the
SQL brute sort.

100-TB shape: capped per-doc work, one shuffle-free map_batches
pass (ops/lz / ops/substrings discipline)."""

from __future__ import annotations

import pyarrow as pa


def suffix_array(s: str) -> list[int]:
    """Sorted suffix start positions via prefix doubling."""
    n = len(s)
    if n == 0:
        return []
    rank = [ord(c) for c in s]
    sa = list(range(n))
    k = 1
    while True:
        def key(i):
            return (rank[i], rank[i + k] if i + k < n else -1)

        sa.sort(key=key)
        nr = [0] * n
        for j in range(1, n):
            nr[sa[j]] = nr[sa[j - 1]] + (1 if key(sa[j]) != key(sa[j - 1]) else 0)
        rank = nr
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def kasai_lcp(s: str, sa: list[int]) -> list[int]:
    """lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0] = 0."""
    n = len(s)
    rank = [0] * n
    for i, p in enumerate(sa):
        rank[p] = i
    lcp = [0] * n
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def suffix_profile(ds, id_col: str, text_col: str, cap: int = 40):
    """Dataset of ``(id, prefix_len, max_lcp, sum_lcp,
    distinct_subs)`` over the first ``cap`` chars."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ln, mx, sm, ds_ = [], [], [], []
        for t in texts:
            s = (t or "")[:cap]
            n = len(s)
            sa = suffix_array(s)
            lcp = kasai_lcp(s, sa) if n else []
            tot = sum(lcp)
            ln.append(n)
            mx.append(max(lcp) if lcp else 0)
            sm.append(tot)
            ds_.append(n * (n + 1) // 2 - tot)
        return pa.table(
            {
                id_col: pa.array(ids),
                "prefix_len": pa.array(ln, pa.int64()),
                "max_lcp": pa.array(mx, pa.int64()),
                "sum_lcp": pa.array(sm, pa.int64()),
                "distinct_subs": pa.array(ds_, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
