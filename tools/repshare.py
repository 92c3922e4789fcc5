#!/usr/bin/env python3
"""Fixture-build share from a SPARK_GRAFT_REP_TIMES=1 bench artifact.

Usage: python3 tools/repshare.py <run.json> [--top 20]

rep 1 of each query pays its one-time fixture build (scratch-table CREATE
+ INSERT + verb replay for catalog queries); later reps hit the
fixtureCache. rep1 - min(rest) is therefore the fixture share the
canonical per-query min strips — and the number that answers whether
registry growth is bleeding fixture cost into measured wall-time (it
is NOT in the artifact's min, but it IS paid once per bench process and
once per driver verify run).
"""
import argparse
import json

ap = argparse.ArgumentParser()
ap.add_argument("run")
ap.add_argument("--top", type=int, default=20)
a = ap.parse_args()

r = json.load(open(a.run))
reps = r.get("reps")
if not reps:
    raise SystemExit("artifact has no 'reps' — run Bench with SPARK_GRAFT_REP_TIMES=1")
rows = []
skipped = []
for q, ts in reps.items():
    # rep 1 must itself have succeeded: if it failed, a later (cache-warm)
    # rep would silently take the fixture-bearing slot and misreport the
    # query's fixture cost as ~0 — flag it instead
    if not ts or ts[0] < 0:
        skipped.append(q)
        continue
    ok = [t for t in ts if t >= 0]
    if len(ok) < 2:
        continue
    rows.append((q, ok[0], min(ok[1:]), ok[0] - min(ok[1:])))
if skipped:
    print(f"WARNING: rep 1 failed for {len(skipped)} queries (fixture share "
          f"unknown): {', '.join(sorted(skipped))}")
rows.sort(key=lambda x: -x[3])
tot_fix = sum(x[3] for x in rows if x[3] > 0)
tot_min = sum(min(x[1], x[2]) for x in rows)
print(f"total fixture share: {tot_fix:.1f}s on top of {tot_min:.1f}s measured (min)")
print(f"{'query':34s} {'rep1':>8s} {'min(rest)':>9s} {'fixture':>8s}")
for q, r1, rest, d in rows[: a.top]:
    print(f"{q:34s} {r1:8.2f} {rest:9.2f} {d:8.2f}")
