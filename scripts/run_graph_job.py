"""Graph-analytics job — the session's graph suite over the nation
trade graph, end to end.

    python scripts/run_graph_job.py --input /root/testdata/sf0.01 \\
        --out-dir /tmp/graph_out [--sparsify-mod 7] [--rounds 4]

Builds the trade edge list ONCE (the 4-way join + count combiner —
the only heavy phase), then runs the per-node analytics family over
it and writes one parquet per metric plus a ``_manifest.json`` with
row counts and the headline aggregates:

- ``communities.parquet``   — label propagation (ops/labelprop.py)
- ``mis.parquet``           — Luby maximal independent set (ops/mis.py)
- ``centrality.parquet``    — hop-bounded harmonic centrality
- ``hyperball.parquet``     — HLL neighbourhood function per radius
- ``msf.json``              — Borůvka spanning-forest summary
- ``truss.parquet``         — k-truss surviving edges (k=5)

Guarded ray.init (driver/cron owns the session when present).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf dir with the TPC-H-ish parquet tables")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--sparsify-mod", type=int, default=7)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--truss-k", type=int, default=5)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.centrality import harmonic_centrality
    from ocr_service_ray.ops.hyperball import hyperball_rounds
    from ocr_service_ray.ops.labelprop import label_propagation
    from ocr_service_ray.ops.mis import luby_mis
    from ocr_service_ray.ops.mst import boruvka_msf
    from ocr_service_ray.ops.relational import hash_join
    from ocr_service_ray.ops.truss import k_truss
    from ocr_service_ray.sources.readers import read_parquet_clean

    t0 = time.perf_counter()
    os.makedirs(args.out_dir, exist_ok=True)

    def _read(name, cols):
        return read_parquet_clean(
            f"{args.input}/{name}.parquet", columns=cols
        )

    li = _read("lineitem", ["l_orderkey", "l_suppkey"])
    od = _read("orders", ["o_orderkey", "o_custkey"])
    cu = _read("customer", ["c_custkey", "c_nationkey"])
    su = _read("supplier", ["s_suppkey", "s_nationkey"])
    j = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")
    j = hash_join(j, cu, on="o_custkey", right_on="c_custkey")
    j = hash_join(j, su, on="l_suppkey", right_on="s_suppkey")
    cnt = grouped_agg(
        j, ["s_nationkey", "c_nationkey"], {"n": (None, "count")}
    ).materialize()

    mod = args.sparsify_mod

    def sparse_directed(b: pa.Table) -> pa.Table:
        s = b["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (s != c) & (n % mod == 0)
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(c[keep])})

    def weighted_und(b: pa.Table) -> pa.Table:
        s = b["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != c
        s, c, n = s[keep], c[keep], n[keep]
        lo, hi = np.minimum(s, c), np.maximum(s, c)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi), "n": pa.array(n)})

    sparse = cnt.map_batches(sparse_directed, batch_format="pyarrow").materialize()

    manifest: dict = {"input": args.input, "sparsify_mod": mod}

    comm = label_propagation(sparse, rounds=args.rounds)
    rd.from_pandas(comm).write_parquet(f"{args.out_dir}/communities")
    manifest["communities"] = {
        "rows": len(comm),
        "n_communities": int(comm["label"].nunique()),
    }

    mis = luby_mis(sparse, rounds=args.rounds + 2)
    rd.from_pandas(mis).write_parquet(f"{args.out_dir}/mis")
    manifest["mis"] = {
        "rows": len(mis),
        "mis_size": int(mis["in_mis"].sum()),
    }

    cen = harmonic_centrality(sparse, rounds=args.rounds)
    rd.from_pandas(cen).write_parquet(f"{args.out_dir}/centrality")
    manifest["centrality"] = {
        "rows": len(cen),
        "top_node": int(cen.sort_values(["harmonic_micro", "node"], ascending=[False, True])["node"].iloc[0]),
    }

    hb = hyperball_rounds(sparse, rounds=args.rounds - 1, p=4)
    rd.from_pandas(hb).write_parquet(f"{args.out_dir}/hyperball")
    manifest["hyperball"] = {"rows": len(hb)}

    wund = grouped_agg(
        cnt.map_batches(weighted_und, batch_format="pyarrow"),
        ["lo", "hi"],
        {"tot": ("n", "sum")},
    )

    def msf_weight(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["tot"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(lo),
                "dst": pa.array(hi),
                "w": pa.array((t % 983) * 10_000 + lo * 100 + hi),
            }
        )

    msf = boruvka_msf(wund.map_batches(msf_weight, batch_format="pyarrow"))
    with open(f"{args.out_dir}/msf.json", "w") as f:
        json.dump(msf, f)
    manifest["msf"] = msf

    tr = k_truss(sparse, k=args.truss_k, rounds=args.rounds + 1)
    if len(tr):
        rd.from_pandas(tr).write_parquet(f"{args.out_dir}/truss")
    manifest["truss"] = {"rows": len(tr), "k": args.truss_k}

    manifest["seconds"] = round(time.perf_counter() - t0, 3)
    with open(f"{args.out_dir}/_manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
