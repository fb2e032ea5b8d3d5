"""HyperBall — per-node neighborhood-function estimation by HLL
counter propagation (Boldi & Vigna, "In-core computation of geometric
centralities with HyperBall", 2013; the algorithm behind the Facebook
"four degrees of separation" measurement).

Each node carries an HLL register set estimating |B(v, r)|, the ball
of nodes reachable from v within r hops. Round r is one edge scan:
``regs_r[v] = elementwise_max(regs_{r-1}[v], regs_{r-1}[u] for each
out-edge v→u)`` — HLL merge is max, so ball growth is a pure combiner
and the whole computation is R edge scans, never a BFS per node.

Register discipline is ops/sketch.py's exactly (32-bit md5-prefix
hash, bucket = top p bits, rho = leading-zero count + 1 via integer
bit length) so the oracle replays the register TABLES round by round
in SQL; the raw HLL estimate is a rational of register integers
(Σ2^-reg taken over a 2^29 common denominator) — emitted as an exact
micro floor, no float anywhere. Small-range/linear-counting
corrections are intentionally omitted (they need ln) — this is the
raw estimator, documented as such.

100-TB shape: registers are node-keyed state of m bytes per node —
broadcast here (|nodes|·m-bounded, the bellman_ford/sssp discipline);
at web scale the register table is a node-partitioned Dataset and
each round a src-keyed join + grouped max, same semantics. The edge
table only ever participates in streamed scans."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

ALPHA_NUM = 673  # alpha_16 = 0.673 exactly, as the rational 673/1000
ALPHA_DEN = 1000


def _node_regs(node: int, p: int) -> np.ndarray:
    """HLL registers of the singleton {node} — one nonzero bucket."""
    rem = 32 - p
    h = int(hashlib.md5(str(node).encode()).hexdigest()[:8], 16)
    bucket = h >> rem
    w = h & ((1 << rem) - 1)
    rho = rem + 1 if w == 0 else rem + 1 - w.bit_length()
    regs = np.zeros(1 << p, dtype=np.int64)
    regs[bucket] = rho
    return regs


def _est_micro(regs: np.ndarray, p: int) -> int:
    """Raw HLL estimate as an exact micro-int: alpha*m^2 / Σ2^-reg
    with the sum over the 2^rem common denominator (pure ints)."""
    rem = 32 - p
    m = 1 << p
    s = int(np.sum(1 << (rem + 1 - regs.astype(object))))  # python ints
    # est = alpha * m^2 * 2^(rem+1) / s ; micro floor
    return (ALPHA_NUM * m * m * (1 << (rem + 1)) * 1_000_000) // (ALPHA_DEN * s)


def hyperball_rounds(edges_ds, rounds: int, p: int = 4) -> pd.DataFrame:
    """Run ``rounds`` HyperBall iterations over a directed edge
    Dataset (``src``, ``dst`` int64; ball of v grows along out-edges).

    Returns one row per (node, radius 0..rounds): ``reg_sum`` (Σ of
    the m register values — the exact mergeable state fingerprint)
    and ``est_micro`` (raw HLL ball-size estimate, micro floor)."""
    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    edges = edges_ds.materialize()  # re-scanned once per round

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
    regs = {v: _node_regs(v, p) for v in nodes}

    out_rows = []

    def snapshot(radius: int):
        for v in nodes:
            out_rows.append(
                {
                    "node": v,
                    "radius": radius,
                    "reg_sum": int(regs[v].sum()),
                    "est_micro": _est_micro(regs[v], p),
                }
            )

    snapshot(0)
    for r in range(1, rounds + 1):
        ref = ray.put({v: a.copy() for v, a in regs.items()})

        def pull(b: pa.Table, ref=ref) -> pa.Table:
            rm = ray.get(ref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            # block-local max of neighbor registers per src node
            acc: dict[int, np.ndarray] = {}
            for si, di in zip(s, d):
                si, di = int(si), int(di)
                cur = acc.get(si)
                if cur is None:
                    acc[si] = rm[di].copy()
                else:
                    np.maximum(cur, rm[di], out=cur)
            if not acc:
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "bucket": pa.array([], pa.int64()),
                        "rho": pa.array([], pa.int64()),
                    }
                )
            ns, bs, rs = [], [], []
            for v, a in acc.items():
                nz = np.nonzero(a)[0]
                ns.extend([v] * len(nz))
                bs.extend(nz.tolist())
                rs.extend(a[nz].tolist())
            return pa.table(
                {
                    "node": pa.array(ns, pa.int64()),
                    "bucket": pa.array(bs, pa.int64()),
                    "rho": pa.array(rs, pa.int64()),
                }
            )

        merged = grouped_agg(
            edges.map_batches(pull, batch_format="pyarrow"),
            ["node", "bucket"],
            {"rho": ("rho", "max")},
        ).to_pandas()
        for _, row in merged.iterrows():
            v, b_, rho = int(row["node"]), int(row["bucket"]), int(row["rho"])
            if rho > regs[v][b_]:
                regs[v][b_] = rho
        snapshot(r)

    return (
        pd.DataFrame(out_rows)
        .astype("int64")
        .sort_values(["radius", "node"])
        .reset_index(drop=True)
    )
