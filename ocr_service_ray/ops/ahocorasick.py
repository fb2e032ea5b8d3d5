"""Aho-Corasick multi-pattern scanning — all (overlapping) matches
of a pattern dictionary in ONE pass per document (Aho & Corasick
1975; the dictionary-matching automaton behind grep -F, intrusion
detection and blocklist scanning — k patterns cost the same pass as
one).

The automaton (goto trie + failure links + output links) is built
ONCE per actor in ``__init__`` — the actor-pool discipline the
flagship OCR stages use: setup per actor, per-char work per batch.
Matches are counted OVERLAPPING (every dictionary occurrence at
every position, the classic AC semantics) — which is exactly what
the oracle brute-probes per position in SQL, making the two
independent algorithms cross-check.

The per-character loop is the AC contract (state transitions are
data-dependent); for the no-overlap special case a vectorized
``str.count`` sweep per pattern would do — AC wins once the
dictionary grows past a handful of patterns."""

from __future__ import annotations

from collections import deque

import pyarrow as pa


class AhoCorasick:
    """Dictionary automaton; ``count_matches`` returns (total
    occurrences, distinct patterns hit)."""

    def __init__(self, patterns: list[str]):
        self.patterns = list(patterns)
        self.goto: list[dict] = [{}]
        self.fail = [0]
        self.out: list[list[int]] = [[]]
        for pi, pat in enumerate(self.patterns):
            s = 0
            for ch in pat:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(pi)
        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != s else 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def count_matches(self, text: str) -> tuple[int, int]:
        s = 0
        total = 0
        hit: set[int] = set()
        for ch in text:
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            if self.out[s]:
                total += len(self.out[s])
                hit.update(self.out[s])
        return total, len(hit)


class AcScanStage:
    """map_batches callable CLASS — automaton built once per actor."""

    def __init__(self, patterns: list[str], id_col: str, text_col: str):
        self.ac = AhoCorasick(patterns)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b[self.id_col].to_pylist()
        texts = b[self.text_col].to_pylist()
        tot, dis = [], []
        for t in texts:
            a, d = self.ac.count_matches(t or "")
            tot.append(a)
            dis.append(d)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "n_matches": pa.array(tot, pa.int64()),
                "n_patterns": pa.array(dis, pa.int64()),
            }
        )


def scan_patterns(ds, patterns: list[str], id_col: str, text_col: str, concurrency: int = 2):
    """Actor-pool AC scan: Dataset of (id, n_matches, n_patterns).

    Autoscaling ``(1, concurrency)`` — a fixed-size pool pre-scales to
    min size and can starve upstream tasks on a small cluster (the
    importance.py deadlock); min=1 always leaves headroom."""
    return ds.map_batches(
        AcScanStage,
        fn_constructor_args=(patterns, id_col, text_col),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
