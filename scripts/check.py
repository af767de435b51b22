#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py [sf_dir] [verify_out_dir]

Reads each <out>/<name> parquet result written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against views of
the sf tables, sorts columns by name on both sides, and compares values
exactly. Exit code 1 on any mismatch.
"""
import duckdb, sys, json, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes = [], []
for name in sorted(oracle):
    sql = oracle[name]
    res_glob = f"{out}/{name}/*.parquet"
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{res_glob}')").df()
    except Exception as e:
        fails.append((name, f"no spark result: {e}"))
        continue
    try:
        want = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"row count differs: spark={len(got)} oracle={len(want)}"))
        continue
    bad = None
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if a != b and not (a is None and b is None) and str(a) != str(b):
                try:
                    import math
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                except Exception:
                    pass
                bad = f"col {c} row {i}: spark={a!r} oracle={b!r} (dtypes {got[c].dtype}/{want[c].dtype})"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        dt = [
            f"{c}:{got[c].dtype}!={want[c].dtype}"
            for c in got.columns if got[c].dtype != want[c].dtype
        ]
        passes.append((name, f"OK ({len(got)} rows)" + (f" [dtype warn: {dt}]" if dt else "")))

for n, m in passes:
    print(f"PASS {n}: {m}")
for n, m in fails:
    print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
