"""Exact-statistics job — the session's exact nonparametric /
inequality suite over the events table, end to end.

    python scripts/run_stats_job.py --input /root/testdata/sf0.01 \\
        --out-dir /tmp/stats_out [--panel 40]

Scans the events table ONCE per family (daily cents combiner, user
panel combiner, user activity combiner) and emits one parquet per
statistic plus ``_manifest.json`` with the headline values — every
number exact (rationals as num/den, micro/milli/ppm integer
scalings), nothing approximated:

- ``sign_test.parquet``     — exact sign test on daily deltas
- ``wilcoxon.parquet``      — exact signed-rank test (Π(1+x^r) DP)
- ``mcnemar.parquet``       — paired half-window purchase flips
- ``mood_median.parquet``   — weekend-vs-weekday median split
- ``inequality.parquet``    — Hoover + Palma + Lorenz deciles of
                              per-user activity (one combiner)
- ``diversity.parquet``     — per-source Simpson + Chao1

Guarded ray.init (driver/cron owns the session when present)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--panel", type=int, default=40)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs = entry.queries()
    os.makedirs(args.out_dir, exist_ok=True)
    t0 = time.time()
    manifest: dict = {"input": args.input, "outputs": {}}

    jobs = {
        "sign_test": "sign_test_daily",
        "wilcoxon": "wilcoxon_daily",
        "mcnemar": "mcnemar_purchases",
        "mood_median": "mood_median_weekend",
        "diversity": "diversity_by_source",
    }
    for fname, qname in jobs.items():
        df = qs[qname](args.input)
        path = os.path.join(args.out_dir, f"{fname}.parquet")
        df.to_parquet(path, index=False)
        manifest["outputs"][fname] = {
            "rows": int(len(df)),
            "query": qname,
        }

    # inequality trio shares one per-user combiner scan
    import pandas as pd

    hoover = qs["hoover_user_activity"](args.input)
    palma = qs["palma_user_activity"](args.input)
    lorenz = qs["lorenz_user_activity"](args.input)
    lorenz.to_parquet(
        os.path.join(args.out_dir, "inequality.parquet"), index=False
    )
    manifest["outputs"]["inequality"] = {
        "rows": int(len(lorenz)),
        "hoover_ppm": int(hoover["hoover_ppm"].iloc[0]),
        "palma_milli": int(palma["palma_milli"].iloc[0]),
    }
    manifest["headline"] = {
        "sign_p": f"{int(qs['sign_test_daily'](args.input)['p_num'].iloc[0])}"
        f"/{int(qs['sign_test_daily'](args.input)['p_den'].iloc[0])}",
        "seconds": round(time.time() - t0, 2),
    }
    with open(os.path.join(args.out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest["headline"]))


if __name__ == "__main__":
    main()
