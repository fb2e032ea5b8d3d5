"""Optimal assignment — Kuhn-Munkres / Jonker-Volgenant shortest
augmenting paths (Kuhn 1955; the O(n³) exact solver for one-to-one
resource↔task pairing that greedy matching gets wrong whenever a
locally-best pair blocks a globally-better completion — Gale-Shapley
optimizes stability, this optimizes TOTAL value).

Exact integers throughout: potentials and reduced costs stay
integral for integral costs (a classical invariant of the
algorithm), so the optimal value is engine-exact. The oracle
cross-checks against exhaustive permutation enumeration — ground
truth, not a self-replay. The optimal VALUE is unique; the realizing
permutation may not be, so the query emits the value and pytest
verifies the returned assignment realizes it.

100-TB shape: the n×n score matrix is the combiner output
(|agents|²-bounded); the augmenting-path close is driver-side on
that matrix (the stable-match/mincut discipline)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def hungarian_min(cost: np.ndarray) -> tuple[int, list[int]]:
    """Exact min-cost assignment (JV shortest augmenting paths over
    integer costs). Returns (total_cost, col_of_row list)."""
    n = cost.shape[0]
    INF = 1 << 60
    u = np.zeros(n + 1, dtype=np.int64)
    v = np.zeros(n + 1, dtype=np.int64)
    p = np.zeros(n + 1, dtype=np.int64)  # p[col] = row matched (1-based)
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF, dtype=np.int64)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = int(p[j0]), INF, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = int(cost[i0 - 1, j - 1]) - int(u[i0]) - int(v[j])
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = int(minv[j])
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = int(way[j0])
            p[j0] = p[j1]
            j0 = j1
    col_of_row = [0] * n
    for j in range(1, n + 1):
        if p[j]:
            col_of_row[int(p[j]) - 1] = j - 1
    total = int(sum(cost[i, col_of_row[i]] for i in range(n)))
    return total, col_of_row


def optimal_assignment(
    pairs: pd.DataFrame, row_col: str, col_col: str, score_col: str
) -> dict:
    """MAXIMUM-total one-to-one assignment over the (row, col, score)
    combiner table (missing pairs score 0; sides must have equal
    cardinality — pad upstream otherwise). Returns
    ``{"optimal_total": int, "greedy_total": int, "n_agents": int,
    "assignment": [(row, col, score), ...]}`` — greedy_total is the
    sort-by-score-desc first-fit baseline, always <= optimal."""
    rows = sorted(pairs[row_col].unique())
    cols = sorted(pairs[col_col].unique())
    if len(rows) != len(cols):
        raise ValueError("sides must have equal cardinality")
    n = len(rows)
    score = {}
    for r, c, s in zip(pairs[row_col], pairs[col_col], pairs[score_col]):
        score[(r, c)] = score.get((r, c), 0) + int(s)
    m = np.zeros((n, n), dtype=np.int64)
    for i, r in enumerate(rows):
        for j, c in enumerate(cols):
            m[i, j] = score.get((r, c), 0)
    top = int(m.max())
    total_min, col_of_row = hungarian_min(top - m)
    optimal = n * top - total_min
    # greedy baseline: repeatedly take the best unblocked pair
    # (score desc, row asc, col asc)
    order = sorted(
        ((int(m[i, j]), i, j) for i in range(n) for j in range(n)),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    used_r: set = set()
    used_c: set = set()
    greedy = 0
    for s, i, j in order:
        if i in used_r or j in used_c:
            continue
        used_r.add(i)
        used_c.add(j)
        greedy += s
    return {
        "optimal_total": optimal,
        "greedy_total": greedy,
        "n_agents": n,
        "assignment": [
            (rows[i], cols[col_of_row[i]], int(m[i, col_of_row[i]]))
            for i in range(n)
        ],
    }
