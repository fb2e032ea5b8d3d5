"""Divisor-method apportionment — D'Hondt (Jefferson) and
Sainte-Laguë (Webster): allocate a fixed number of seats/shards to
parties proportionally to integer weights by ranking the quotient
table w_p / d (d = 1,2,3,... for D'Hondt; d = 1,3,5,... for
Sainte-Laguë). The partition-budget planner shape: give each source
a shard budget proportional to its document count with a
deterministic, exactly-reproducible rule (no largest-remainder
paradoxes).

Exactness: quotients are never materialized as floats — ranking
compares w_p * d_q > w_q * d_p (cross-multiplication), ties to
(smaller divisor, smaller party id). The oracle replays the same
pairwise-count ranking in SQL.

100-TB shape: weights are one bounded combiner aggregate; the
O(parties * seats) allocation closes on the driver."""

from __future__ import annotations

import pandas as pd


def apportion(weights: dict[int, int], seats: int, method: str = "dhondt") -> dict[int, int]:
    """Seat counts per party under the divisor method."""
    step = 1 if method == "dhondt" else 2
    start = 1
    # quotient list: (party, divisor); rank by w/d desc with
    # deterministic ties (d asc, party asc)
    quot = [
        (p, start + step * k)
        for p in sorted(weights)
        for k in range(seats)
    ]

    def wins(a, b):
        (pa, da), (pb, db) = a, b
        lhs = weights[pa] * db
        rhs = weights[pb] * da
        if lhs != rhs:
            return lhs > rhs
        if da != db:
            return da < db
        return pa < pb

    import functools

    order = sorted(
        quot,
        key=functools.cmp_to_key(
            lambda a, b: -1 if wins(a, b) else 1
        ),
    )
    alloc = {p: 0 for p in weights}
    for p, _ in order[:seats]:
        alloc[p] += 1
    return alloc


def apportion_report(
    weights: dict[int, int], seats: int
) -> pd.DataFrame:
    """(party, weight, seats_dhondt, seats_sainte_lague,
    ideal_milli) — ideal share in milliseats for drift inspection."""
    total = sum(weights.values())
    dh = apportion(weights, seats, "dhondt")
    sl = apportion(weights, seats, "sainte_lague")
    rows = [
        (
            p,
            weights[p],
            dh[p],
            sl[p],
            1000 * seats * weights[p] // total if total else 0,
        )
        for p in sorted(weights)
    ]
    out = pd.DataFrame(
        rows,
        columns=["party", "weight", "seats_dhondt", "seats_sainte_lague", "ideal_milli"],
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out
