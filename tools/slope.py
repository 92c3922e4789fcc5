#!/usr/bin/env python3
"""Scale-slope probe: per-query wall-time ratio between two scale factors.

Usage:
  python3 tools/slope.py --small bench_history/BENCH_clean_sf0.01_run*.json \
      --large bench_history/BENCH_clean_sf0.1_run*.json [--top 15]

Takes the per-query MIN within each SF group (same noise discipline as the
canonical bench), prints time(large)/time(small) sorted descending. The SF
ratio here is 10x data, so a linear operator reads <= ~10 (usually far
less: fixed Spark/commit overhead dominates sub-second queries); a ratio
well ABOVE the data ratio is the 100 TB red flag local wall-clock can't
otherwise show. Queries missing from either side are listed, not dropped
silently.
"""
import argparse
import json

ap = argparse.ArgumentParser()
ap.add_argument("--small", nargs="+", required=True)
ap.add_argument("--large", nargs="+", required=True)
ap.add_argument("--top", type=int, default=0, help="0 = all")
a = ap.parse_args()


def best(paths):
    out = {}
    for p in paths:
        r = json.load(open(p))
        for q, t in r["queries"].items():
            if t < 0:
                continue  # failed rep — never the min
            out[q] = min(out.get(q, float("inf")), t)
    return out


s, l = best(a.small), best(a.large)
shared = sorted(set(s) & set(l), key=lambda q: -(l[q] / max(s[q], 1e-9)))
only_s, only_l = sorted(set(s) - set(l)), sorted(set(l) - set(s))
if only_s:
    print(f"# small-only ({len(only_s)}): {only_s[:10]}")
if only_l:
    print(f"# large-only ({len(only_l)}): {only_l[:10]}")
rows = shared[: a.top] if a.top else shared
print(f"{'query':34s} {'t(small)':>9s} {'t(large)':>9s} {'slope':>7s}")
for q in rows:
    print(f"{q:34s} {s[q]:9.3f} {l[q]:9.3f} {l[q]/max(s[q],1e-9):7.2f}")
