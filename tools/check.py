#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet dump, runs the matching SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), sorts columns by
name and rows by all columns, and compares values (floats to 1e-9 rel).
"""
import json, sys, math
import duckdb

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    fails = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        except Exception as e:
            fails.append((name, f"spark dump unreadable: {e}")); continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            fails.append((name, f"oracle error: {e}")); continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            fails.append((name, f"cols: spark={list(got.columns)} oracle={list(exp.columns)}")); continue
        if len(got) != len(exp):
            fails.append((name, f"rows: spark={len(got)} oracle={len(exp)}")); continue
        gs = got.sort_values(by=list(got.columns), ignore_index=True)
        es = exp.sort_values(by=list(exp.columns), ignore_index=True)
        bad = None
        for c in got.columns:
            gv, ev = gs[c].tolist(), es[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a is None and b is None: continue
                an = a != a if isinstance(a, float) else False
                bn = b != b if isinstance(b, float) else False
                if an and bn: continue
                if an != bn or (a is None) != (b is None):
                    bad = f"{c}[{i}]: spark={a} oracle={b}"; break
                if isinstance(a, float) and isinstance(b, float):
                    # bitwise-exact: the driver hash-compares, so any ulp
                    # difference is a real failure (audited 49/49 exact)
                    if a != b:
                        bad = f"{c}[{i}]: spark={a} oracle={b}"; break
                elif str(a) != str(b):
                    bad = f"{c}[{i}]: spark={a} oracle={b}"; break
            if bad: break
        if bad:
            fails.append((name, bad))
        else:
            print(f"  OK {name} ({len(got)} rows)")
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    print(f"{'ALL PASS' if not fails else f'{len(fails)} FAILURES'}")
    sys.exit(1 if fails else 0)

main()
