"""Cost-based join ordering — the Selinger System-R algorithm
(Selinger et al. 1979): enumerate left-deep join orders over the
join graph, estimate each intermediate with the classic
|A|*|B| / max(d_A(k), d_B(k)) independence formula, and pick the
cheapest plan. All arithmetic is integer floor division over
MEASURED stats (row counts + distinct key counts from combiner
scans), so the chosen order and every cost are exact and
SQL-replayable.

Contract:
  - left-deep, cross-join-free orders only (next table must share a
    join edge with the accumulated set);
  - est(S join T on k) = card_S * card_T // max(d_T(k), d_N(k))
    where N is the edge neighbour already in S and d are BASE-table
    distinct counts (Selinger's preserved-distincts assumption);
  - plan cost = sum of the three intermediate estimates;
  - best = min (cost, order string)  — deterministic ties.

100-TB shape: stats come from one tiny combiner scan per table
(count + per-key distinct); the 2^n enumeration closes on the
driver — planning is metadata work, the whole point."""

from __future__ import annotations

import pandas as pd


def best_join_order(
    tables: dict[str, int],
    edges: list[tuple[str, str, int, int]],
) -> pd.DataFrame:
    """``tables``: name -> row count. ``edges``: (a, b, d_a, d_b) —
    distinct counts of the shared key in each side. Returns one row:
    (best_order, best_cost, worst_cost, n_plans)."""
    names = sorted(tables)
    adj: dict[str, dict[str, tuple[int, int]]] = {}
    for a, b, da, db in edges:
        adj.setdefault(a, {})[b] = (da, db)
        adj.setdefault(b, {})[a] = (db, da)
    plans: list[tuple[int, str]] = []

    def extend(S: list[str], card: int, cost: int):
        if len(S) == len(names):
            plans.append((cost, ",".join(S)))
            return
        for t in names:
            if t in S:
                continue
            nbrs = [n for n in S if n in adj.get(t, {})]
            if not nbrs:
                continue
            # chain graphs have a unique neighbour; general graphs:
            # use the smallest-name neighbour for determinism
            n = min(nbrs)
            dt, dn = adj[t][n]
            est = card * tables[t] // max(dt, dn)
            extend(S + [t], est, cost + est)

    for t in names:
        extend([t], tables[t], 0)
    plans.sort()
    best_cost, best_order = plans[0]
    worst_cost = max(c for c, _ in plans)
    return pd.DataFrame(
        {
            "best_order": [best_order],
            "best_cost": [pd.Series([best_cost], dtype="int64")[0]],
            "worst_cost": [worst_cost],
            "n_plans": [len(plans)],
        }
    ).astype({"best_cost": "int64", "worst_cost": "int64", "n_plans": "int64"})
