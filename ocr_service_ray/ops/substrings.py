"""Distinct-substring density — per-document repetitiveness scoring
via suffix automata (Blumer et al. 1985: the minimal DFA of all
substrings has < 2n states and the distinct-substring count is
Σ_state (len(s) − len(link(s))), computed in LINEAR time where brute
enumeration is O(n²) space).

Low density (distinct substrings ≪ n(n+1)/2) means repetitive
text — generated boilerplate, OCR stutter, template spam — making
this a content-quality signal alongside repetition_rules' fixed
n-gram rules (this one is exact over ALL substring lengths at once).

Per-doc work is linear in the CAPPED prefix (cap is the contract, as
in ops/align.py), so the op is one shuffle-free map_batches pass; the
oracle brute-enumerates every (start, len) substring of the same
prefix in SQL and counts distinct — automaton vs enumeration is the
cross-check."""

from __future__ import annotations

import pyarrow as pa


def count_distinct_substrings(s: str) -> int:
    """Exact distinct (non-empty) substring count via the online
    suffix-automaton construction."""
    if not s:
        return 0
    # state arrays: link, length, transitions
    maxlen = [0]
    link = [-1]
    trans: list[dict] = [{}]
    last = 0
    for ch in s:
        cur = len(maxlen)
        maxlen.append(maxlen[last] + 1)
        link.append(-1)
        trans.append({})
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if maxlen[p] + 1 == maxlen[q]:
                link[cur] = q
            else:
                clone = len(maxlen)
                maxlen.append(maxlen[p] + 1)
                link.append(link[q])
                trans.append(dict(trans[q]))
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    return sum(
        maxlen[v] - maxlen[link[v]] for v in range(1, len(maxlen))
    )


def substring_density(ds, id_col: str, text_col: str, cap: int = 48):
    """Dataset of ``(id_col, prefix_len, n_distinct, density_ppm)``
    over the first ``cap`` characters of each text: density_ppm =
    n_distinct · 10⁶ // (L(L+1)/2), the exact fraction of the
    maximum possible substring diversity."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        ls, nd, dd = [], [], []
        for t in texts:
            p = (t or "")[:cap]
            n = len(p)
            c = count_distinct_substrings(p)
            ls.append(n)
            nd.append(c)
            denom = n * (n + 1) // 2
            dd.append((c * 1_000_000) // denom if denom else 0)
        return pa.table(
            {
                id_col: pa.array(ids),
                "prefix_len": pa.array(ls, pa.int64()),
                "n_distinct": pa.array(nd, pa.int64()),
                "density_ppm": pa.array(dd, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
