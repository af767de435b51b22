#!/usr/bin/env python3
"""Re-derive the DuckDB bench denominator (BASELINE.md).

Usage: python3 scripts/baseline.py [sf_dir] [verify_out_dir] [threads]

Times every oracle SQL from <out>/oracle_sql.json (dumped by graft.Verify
at the SAME sf_dir, which also stages the files the round-trip oracles
read) in DuckDB with SET threads, one connection, summing wall-clock per
query. Prints per-query seconds (slowest first) and the total — the
number BASELINE.md records and Bench's fallback constant mirrors.

Conservative-direction note: the `stream_*_live` / `stream_running_tws`
oracles are plain batch SQL, so DuckDB never pays the streaming overhead
(session spin-up, checkpoint, micro-batch scheduling) the Spark numerator
honestly includes — the resulting vs_baseline ratio can only overstate,
never flatter, Spark's relative cost.
"""
import duckdb, sys, json, glob, os, time

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf01"
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32

con = duckdb.connect()
con.sql(f"SET threads TO {threads}")
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
times = {}
for name in sorted(oracle):
    t0 = time.monotonic()
    con.sql(oracle[name]).fetchall()
    times[name] = time.monotonic() - t0

for name, sec in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"{sec:8.3f}  {name}")
total = sum(times.values())
print(f"\nTOTAL {total:.3f} s over {len(times)} oracle SQLs (threads={threads})")
