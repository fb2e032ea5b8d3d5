"""Gale-Shapley stable matching over a distributively-built
preference matrix (Gale & Shapley 1962; deferred acceptance, the
mechanism behind residency/school assignment and ad-slot pairing).

The data-parallel phase builds the |P|·|A|-bounded score matrix (a
grouped count/sum combiner over the raw pair table — the only part
that touches big data); the deferred-acceptance close runs on the
driver over that bounded matrix (the kruskal/huffman bounded-close
discipline). Missing pairs score 0, so preference lists are complete
and the proposer-optimal matching is unique given the deterministic
tie-breaks.

Determinism contract (what the SQL replay reproduces step by step):
proposers rank acceptors by (score desc, acceptor asc); acceptors
compare suitors by (score desc, proposer asc); the next proposal is
always made by the SMALLEST free proposer with list remaining. The
classic theorem guarantees the resulting matching is independent of
proposal order — the fixed order is there so engine and oracle agree
on ``n_proposals`` too, not just on the matching."""

from __future__ import annotations

import pandas as pd


def stable_match(
    pairs: pd.DataFrame,
    proposer_col: str,
    acceptor_col: str,
    score_col: str,
) -> pd.DataFrame:
    """Proposer-optimal stable matching over a (proposer, acceptor,
    score) frame (|P|·|A|-bounded — the combiner output, NOT raw
    rows). Returns one row per matched pair:
    ``(proposer_col, acceptor_col, pair_score, n_proposals)`` with
    n_proposals the total deferred-acceptance proposal count
    (constant column — the audit number)."""
    props = sorted(pairs[proposer_col].unique())
    accs = sorted(pairs[acceptor_col].unique())
    score = {
        (p, a): int(s)
        for p, a, s in zip(
            pairs[proposer_col], pairs[acceptor_col], pairs[score_col]
        )
    }

    def sc(p, a) -> int:
        return score.get((p, a), 0)

    pref = {
        p: sorted(accs, key=lambda a: (-sc(p, a), a)) for p in props
    }
    nxt = {p: 0 for p in props}
    match: dict = {a: None for a in accs}
    matched_p: set = set()
    n_prop = 0
    while True:
        free = next(
            (
                p
                for p in props
                if p not in matched_p and nxt[p] < len(accs)
            ),
            None,
        )
        if free is None:
            break
        a = pref[free][nxt[free]]
        nxt[free] += 1
        n_prop += 1
        cur = match[a]
        if cur is None:
            match[a] = free
            matched_p.add(free)
        else:
            s_new, s_cur = sc(free, a), sc(cur, a)
            if s_new > s_cur or (s_new == s_cur and free < cur):
                match[a] = free
                matched_p.add(free)
                matched_p.discard(cur)
    rows = [
        {
            proposer_col: p,
            acceptor_col: a,
            "pair_score": sc(p, a),
            "n_proposals": n_prop,
        }
        for a, p in match.items()
        if p is not None
    ]
    out = pd.DataFrame(rows).sort_values(proposer_col).reset_index(drop=True)
    for c in ("pair_score", "n_proposals"):
        out[c] = out[c].astype("int64")
    return out


def is_stable(
    result: pd.DataFrame,
    pairs: pd.DataFrame,
    proposer_col: str,
    acceptor_col: str,
    score_col: str,
) -> bool:
    """Blocking-pair check (test helper): no (p, a) prefer each other
    over their assigned partners under the same tie-break order."""
    score = {
        (p, a): int(s)
        for p, a, s in zip(
            pairs[proposer_col], pairs[acceptor_col], pairs[score_col]
        )
    }

    def sc(p, a):
        return score.get((p, a), 0)

    m_of_p = dict(zip(result[proposer_col], result[acceptor_col]))
    m_of_a = dict(zip(result[acceptor_col], result[proposer_col]))
    props = sorted(pairs[proposer_col].unique())
    accs = sorted(pairs[acceptor_col].unique())
    for p in props:
        for a in accs:
            pa_cur = m_of_p.get(p)
            if pa_cur == a:
                continue
            p_prefers = pa_cur is None or (
                sc(p, a) > sc(p, pa_cur)
                or (sc(p, a) == sc(p, pa_cur) and a < pa_cur)
            )
            q = m_of_a.get(a)
            a_prefers = q is None or (
                sc(p, a) > sc(q, a)
                or (sc(p, a) == sc(q, a) and p < q)
            )
            if p_prefers and a_prefers:
                return False
    return True
