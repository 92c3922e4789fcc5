#!/usr/bin/env python3
"""Aggregate clean bench runs into the canonical per-round artifact.

Per-query MIN across the given run files. FAILS LOUDLY (exit 1, nothing
written) when any run's query set differs from the union — a run taken
before a query landed must be re-run, never silently dropped from the
aggregate — or, with --registry pointing at a Verify dump's
oracle_sql.json, when the aggregate's query set differs from the
registry keys. (The round-12 gap this closes: q_bucket_cdf passed
CORRECTNESS and appeared in run22 but was missing from the 244-query
canonical aggregate because runs 13-21 predated it.)

Usage:
  python3 tools/bench_agg.py bench_history/BENCH_clean_sf0.1_run*.json \
      --registry /tmp/verify_out/oracle_sql.json -o BENCH_clean_rN.json
"""
import argparse
import json
import sys

ap = argparse.ArgumentParser()
ap.add_argument("runs", nargs="+", help="BENCH_clean_*_run*.json files")
ap.add_argument("--registry",
                help="oracle_sql.json from a Verify dump (query-name truth)")
ap.add_argument("-o", "--out", required=True)
a = ap.parse_args()

runs = [(p, json.load(open(p))) for p in a.runs]
union = set()
for _, r in runs:
    union |= set(r["queries"])
problems = []
for p, r in runs:
    missing = sorted(union - set(r["queries"]))
    if missing:
        problems.append(f"{p} lacks {len(missing)} queries present in other "
                        f"runs (stale code?): {missing[:10]}")
if a.registry:
    reg = set(json.load(open(a.registry)))
    if union != reg:
        problems.append(
            f"bench set != registry: bench-only={sorted(union - reg)[:10]} "
            f"registry-only={sorted(reg - union)[:10]}")
if problems:
    for msg in problems:
        print(f"FATAL: {msg}", file=sys.stderr)
    sys.exit(1)

best = {}
for q in sorted(union):
    ok = [r["queries"][q] for _, r in runs if r["queries"][q] >= 0]
    best[q] = min(ok) if ok else -1
failed = sorted(q for q, v in best.items() if v < 0)
out = {
    "metric": "total",
    "value": sum(v for v in best.values() if v >= 0),
    "unit": "sec",
    "queries": best,
    "sf": runs[0][1].get("sf"),
    "runs": len(runs),
    "failed": failed,
}
json.dump(out, open(a.out, "w"), indent=1)
print(f"wrote {a.out}: {len(best)} queries, total {out['value']:.1f}s, "
      f"{len(failed)} failed, min over {len(runs)} runs")
