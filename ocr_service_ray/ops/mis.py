"""Distributed maximal independent set — Luby's algorithm with
deterministic hash priorities (Luby 1986, the canonical parallel MIS;
priorities from the repo md5 discipline instead of RNG, so every
round — and the SQL replay — is reproducible).

Round r over the undecided subgraph: a node enters the MIS iff its
priority is a strict local maximum among its undecided neighbours
(strictness is safe: md5 priorities are distinct with overwhelming
probability and the tie, contractually, keeps BOTH nodes undecided
for the next round — wait-free, still converges); neighbours of new
MIS nodes leave as OUT. Undecided count strictly decreases, so a
fixed round budget with converged no-op tail keeps engine and oracle
in lockstep (the pagerank/sssp unrolled-round discipline).

100-TB shape: per round ONE edge scan joins the broadcast status/
priority map (|nodes|-bounded, the bellman_ford discipline) and folds
to a per-node neighbour-max combiner; raw edges never reach the
driver. MIS is the scheduling/conflict-set primitive (greedy graph
colouring, parallel task selection, diversity sampling over a
similarity graph)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _prio(node: int) -> int:
    """Deterministic 60-bit priority: md5('mis:'+node) hex15."""
    return int(hashlib.md5(f"mis:{node}".encode()).hexdigest()[:15], 16)


def luby_mis(edges_ds, rounds: int = 6) -> pd.DataFrame:
    """MIS over an undirected graph given as an edge Dataset
    (``src``, ``dst`` int64; both orientations or one — symmetrized
    internally). Runs exactly ``rounds`` rounds (converged rounds are
    no-ops). Returns one row per node: ``(node, in_mis, round_decided)``
    with round_decided = 0 for isolated/never-contested fast cases …
    the round (1-based) at which the node's state was fixed, or
    ``rounds + 1`` if still undecided at the budget (asserted absent
    in tests on small graphs)."""
    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    edges = edges_ds.materialize()

    def nodes_of(b: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                    b["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
        )
        return pa.table({"node": pa.array(u)})

    nodes = sorted(
        {int(r["node"]) for r in edges.map_batches(nodes_of, batch_format="pyarrow").take_all()}
    )
    prio = {v: _prio(v) for v in nodes}
    state = {v: 0 for v in nodes}  # 0 undecided, 1 in MIS, -1 out
    decided_round = {v: 0 for v in nodes}

    for r in range(1, rounds + 1):
        ref = ray.put({"state": dict(state), "prio": prio})

        def nbr_max(b: pa.Table, ref=ref) -> pa.Table:
            st = ray.get(ref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            rows_n, rows_m = [], []
            for u, v in zip(s, d):
                u, v = int(u), int(v)
                if u == v:
                    continue
                # symmetrize: each endpoint sees the other
                for a, bb in ((u, v), (v, u)):
                    if st["state"][a] == 0 and st["state"][bb] == 0:
                        rows_n.append(a)
                        rows_m.append(st["prio"][bb])
            return pa.table(
                {
                    "node": pa.array(rows_n, pa.int64()),
                    "nbr_prio": pa.array(rows_m, pa.int64()),
                }
            )

        mx = grouped_agg(
            edges.map_batches(nbr_max, batch_format="pyarrow"),
            ["node"],
            {"m": ("nbr_prio", "max")},
        ).to_pandas()
        # an all-decided round yields an empty (possibly column-less)
        # partial frame — no node is contested
        contested = (
            dict(zip(mx["node"].astype(int), mx["m"].astype(int)))
            if "node" in mx.columns
            else {}
        )

        new_in = []
        for v in nodes:
            if state[v] != 0:
                continue
            m = contested.get(v)
            if m is None or prio[v] > m:
                # no undecided neighbour, or strict local max
                new_in.append(v)
        if not new_in:
            break
        in_set = set(new_in)
        for v in new_in:
            state[v] = 1
            decided_round[v] = r

        # knock out undecided neighbours of new MIS nodes: one more
        # edge scan emitting the OUT set
        ref2 = ray.put((in_set, {v: state[v] for v in nodes}))

        def outs(b: pa.Table, ref2=ref2) -> pa.Table:
            ins, st = ray.get(ref2)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = set()
            for u, v in zip(s, d):
                u, v = int(u), int(v)
                if u in ins and st[v] == 0:
                    o.add(v)
                if v in ins and st[u] == 0:
                    o.add(u)
            return pa.table({"node": pa.array(sorted(o), pa.int64())})

        knocked = {
            int(row["node"])
            for row in edges.map_batches(outs, batch_format="pyarrow").take_all()
        }
        for v in knocked:
            if state[v] == 0:
                state[v] = -1
                decided_round[v] = r

    return pd.DataFrame(
        {
            "node": pd.array(nodes, dtype="int64"),
            "in_mis": pd.array([1 if state[v] == 1 else 0 for v in nodes], dtype="int64"),
            "round_decided": pd.array(
                [decided_round[v] if state[v] != 0 else rounds + 1 for v in nodes],
                dtype="int64",
            ),
        }
    )
