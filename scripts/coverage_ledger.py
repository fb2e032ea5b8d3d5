"""Builder-side coverage ledger (VERDICT r4 directive #8).

The driver's per-round correctness artifact samples ~50 of the 506
queries and has drawn the SAME sample in consecutive rounds, so
driver-side evidence alone leaves most of the surface "covered" only
implicitly. This script makes the builder-side evidence first-class:
it scans every checked-in verification artifact —

- ``CORRECTNESS_r*.json``     driver gate runs (sf0.01)
- ``scripts/sweep_full_r4.log``   builder full-surface sweeps (sf0.01)
- ``scripts/sweep_full_r4_s*.log.gz``
- ``scripts/sweep_sf01_r4.log``   builder sf0.1 sample (r4)
- ``scripts/sweep_sf01_r5.log``   builder sf0.1 FULL sweep (r5)

— and emits ``COVERAGE_LEDGER.json``: for every ``queries()`` entry,
the complete evidence trail (round, scale, source, status) plus the
most recent/highest-scale verification. Regenerate after any sweep:

    python scripts/coverage_ledger.py
"""

from __future__ import annotations

import gzip
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (path, round, scale, kind) — later list entries win the "latest" slot
SOURCES = [
    ("CORRECTNESS_r01.json", "r1", "sf0.01", "driver"),
    ("CORRECTNESS_r02.json", "r2", "sf0.01", "driver"),
    ("CORRECTNESS_r03.json", "r3", "sf0.01", "driver"),
    ("CORRECTNESS_r04.json", "r4", "sf0.01", "driver"),
    ("scripts/sweep_full_r4.log", "r4", "sf0.01", "builder-sweep"),
    ("scripts/sweep_full_r4_s2.log.gz", "r4", "sf0.01", "builder-sweep"),
    ("scripts/sweep_full_r4_s3.log.gz", "r4", "sf0.01", "builder-sweep"),
    ("scripts/sweep_sf01_r4.log", "r4", "sf0.1", "builder-sweep"),
    ("scripts/sweep_full_r5.log", "r5", "sf0.01", "builder-sweep"),
    ("scripts/sweep_full_r5_final.log", "r5", "sf0.01", "builder-sweep"),
    ("scripts/sweep_r5_final2.log", "r5", "sf0.01", "builder-sweep"),
    ("scripts/sweep_sf01_r5.log", "r5", "sf0.1", "builder-sweep"),
    ("scripts/sweep_r5_postfix.log", "r5", "sf0.01", "builder-sweep"),
]

LINE_RE = re.compile(
    r"^(OK|FAIL)\s+(\S+)(?:\s+\(([\d.]+)s\))?:\s*(.*)$"
)


def parse_log(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    out = {}
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            m = LINE_RE.match(line.strip())
            if not m:
                continue
            status, name, _secs, detail = m.groups()
            if status == "OK":
                out[name] = (
                    "rows_only" if "rows-only" in detail else "oracle_match"
                )
            else:
                out[name] = "FAIL"
    return out


def parse_driver(path: str):
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    out = {}
    for name, rec in data.items():
        if rec.get("err"):
            out[name] = "FAIL"
        elif rec.get("hash_match"):
            out[name] = "oracle_match"
        elif rec.get("rows_match"):
            out[name] = "rows_only"
        else:
            out[name] = "FAIL"
    return out


def main() -> None:
    import __ray_entry__ as entrymod

    names = list(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql().keys())

    ledger = {n: {"evidence": []} for n in names}
    for rel, rnd, scale, kind in SOURCES:
        path = os.path.join(REPO, rel)
        if not os.path.exists(path):
            continue
        results = (
            parse_driver(path) if rel.endswith(".json") else parse_log(path)
        )
        for name, status in results.items():
            if name in ledger:
                ledger[name]["evidence"].append(
                    {"round": rnd, "scale": scale, "source": rel,
                     "kind": kind, "status": status}
                )

    scale_rank = {"sf0.001": 0, "sf0.01": 1, "sf0.1": 2}
    never = []
    for name, rec in ledger.items():
        rec["has_oracle"] = name in oracles
        ok = [e for e in rec["evidence"] if e["status"] != "FAIL"]
        if ok:
            latest = max(
                ok, key=lambda e: (e["round"], scale_rank.get(e["scale"], -1))
            )
            rec["last_verified"] = latest
            rec["max_scale_verified"] = max(
                (e["scale"] for e in ok), key=lambda s: scale_rank.get(s, -1)
            )
        else:
            rec["last_verified"] = None
            rec["max_scale_verified"] = None
            never.append(name)

    summary = {
        "total_queries": len(names),
        "with_exact_oracle": len(oracles & set(names)),
        "verified_any": len(names) - len(never),
        "verified_sf01": sum(
            1 for r in ledger.values() if r["max_scale_verified"] == "sf0.1"
        ),
        "driver_verified": len(
            {
                n
                for n, r in ledger.items()
                for e in r["evidence"]
                if e["kind"] == "driver" and e["status"] != "FAIL"
            }
        ),
        "never_verified": never,
    }
    out = {"summary": summary, "queries": ledger}
    with open(os.path.join(REPO, "COVERAGE_LEDGER.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
