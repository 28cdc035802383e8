#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB (single-node reference engine) at a
given sf dir — produces the BASELINE numbers the bench is graded
against. Driver-side python only (duckdb is not a library dependency).

Usage:
    sbt -batch "runMain graft.Verify <sf_dir> /tmp/vout"   # dumps oracle_sql.json
    python3 tools/baseline.py <sf_dir> /tmp/vout/oracle_sql.json [q_a,q_b,...]

The optional third arg restricts to a comma-separated query subset
(sf~1 heavy-tail runs time a handful of queries, not the suite).
"""
import glob
import json
import os
import sys
import time

import duckdb

sf_dir, oracle_json = sys.argv[1], sys.argv[2]

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

with open(oracle_json) as fh:
    oracles = json.load(fh)
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(","))
    oracles = {k: v for k, v in oracles.items() if k in only}

times = {}
for name in sorted(oracles):
    t0 = time.time()
    try:
        con.execute(oracles[name]).fetchall()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        times[name] = None
        print(f"[err] {name}: {e}", file=sys.stderr)

total = sum(v for v in times.values() if v is not None)
print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                  "unit": "sec", "queries": times, "sf": sf_dir}))
