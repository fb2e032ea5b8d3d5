"""Dominator analysis — Prosser 1959 / Cooper-Harvey-Kennedy 2001:
v dominates u when EVERY path from the root to u passes through v —
the control-flow backbone of compilers, and in dataflow graphs the
single-point-of-interception audit (which upstream stage can
observe/block everything reaching u). Engine: the iterative CHK
idom fixpoint on RPO order, then ancestor expansion to the full
dominance relation. Oracle: the definition itself — u loses
root-reachability when v is removed (the remove-and-reach closure
pattern of ops/articulation.py). Two algorithms, one relation.

Contract: root = smallest node; only root-reachable nodes appear;
output rows (node, dom) = "dom dominates node", including the
reflexive (u, u) and (u, root) rows; sorted.

100-TB shape: bounded combiner digraph; iterative close on it."""

from __future__ import annotations

import pandas as pd


def dominance_relation(edges: pd.DataFrame) -> pd.DataFrame:
    arcs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(edges["src"], edges["dst"])
            if int(a) != int(b)
        }
    )
    nodes_all = sorted({x for e in arcs for x in e})
    if not nodes_all:
        return pd.DataFrame(columns=["node", "dom"]).astype("int64")
    root = nodes_all[0]
    succ: dict[int, list[int]] = {}
    for a, b in arcs:
        succ.setdefault(a, []).append(b)
    # reachable set + reverse post-order via iterative DFS
    seen = {root}
    order: list[int] = []
    stack: list[tuple[int, object]] = [(root, iter(succ.get(root, ())))]
    while stack:
        v, it = stack[-1]
        advanced = False
        for u in it:
            if u not in seen:
                seen.add(u)
                stack.append((u, iter(succ.get(u, ()))))
                advanced = True
                break
        if not advanced:
            stack.pop()
            order.append(v)
    rpo = list(reversed(order))
    idx = {v: i for i, v in enumerate(rpo)}
    preds: dict[int, list[int]] = {v: [] for v in rpo}
    for a, b in arcs:
        if a in seen and b in seen:
            preds[b].append(a)
    idom = {root: root}
    changed = True
    while changed:
        changed = False
        for v in rpo:
            if v == root:
                continue
            cands = [p for p in preds[v] if p in idom]
            if not cands:
                continue
            new = cands[0]
            for p in cands[1:]:
                a, b = new, p
                while a != b:
                    while idx[a] > idx[b]:
                        a = idom[a]
                    while idx[b] > idx[a]:
                        b = idom[b]
                new = a
            if idom.get(v) != new:
                idom[v] = new
                changed = True
    rows = []
    for u in sorted(seen):
        d = u
        while True:
            rows.append((u, d))
            if d == root:
                break
            d = idom[d]
    return (
        pd.DataFrame(sorted(set(rows)), columns=["node", "dom"])
        .astype("int64")
    )
