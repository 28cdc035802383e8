#!/usr/bin/env python3
"""Replicate sf0.1 fact tables N-fold for the >100x scale rungs
(core-1000x ~ 600M lineitem rows, events-1000x ~ 100M events), writing
each output as ONE parquet file via a streaming pyarrow writer.

scale_data.py (the <=100x tool) materializes the whole cross join in
DuckDB and globally ORDER BYs it — fine at 60M rows, but a 600M-row
global sort would need a multi-10-GB spill. This tool exploits the
replica structure instead: replica r's rows sorted by key ARE the
original rows (already key-sorted in the source) with keys shifted by
r*10^7, so writing replicas in order produces EXACTLY the globally
key-sorted layout the DuckDB path produces, one bounded batch at a
time. Same SHIFT, same key sets, same row_group_size (122880 =
DuckDB COPY's default) — a 1000x file is byte-layout-comparable to
what scale_data.py would emit, just built in O(source) memory.

Only pure key-shift tables are supported here (core facts + events);
documents/embeddings carry per-replica text/noise perturbation and
stay on scale_data.py (their 100x sizes are small anyway).

Usage: python3 tools/scale_big.py /root/testdata/sf0.1 /tmp/sfc1000x 1000 lineitem,orders,customer
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
tables = sys.argv[4].split(",")

SHIFT = 10_000_000
ROW_GROUP = 122880
# int64 keys: replica 999 tops out at ~10^10, far under 2^63; the only
# invariant that matters is max(source key) < SHIFT so replicas never
# collide (same assert scale_data.py carries).
KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
}

import os
os.makedirs(dst, exist_ok=True)
for t in tables:
    tbl = pq.read_table(f"{src}/{t}.parquet")
    # strip pandas metadata so replicas concatenate under one clean schema
    tbl = tbl.replace_schema_metadata(None)
    for k in KEYS[t]:
        mx = pc.max(tbl.column(k)).as_py()
        assert mx is None or mx < SHIFT, (
            f"{t}.{k} max {mx} >= shift {SHIFT}: replica keys would collide")
    out = f"{dst}/{t}.parquet"
    writer = pq.ParquetWriter(out, tbl.schema)
    key_idx = {k: tbl.schema.get_field_index(k) for k in KEYS[t]}
    for r in range(reps):
        if r == 0:
            rep = tbl
        else:
            rep = tbl
            for k, i in key_idx.items():
                shifted = pc.add(tbl.column(k), pa.scalar(r * SHIFT,
                                                          pa.int64()))
                rep = rep.set_column(i, k, shifted)
        writer.write_table(rep, row_group_size=ROW_GROUP)
        if r % 100 == 0:
            print(f"[scale_big] {t} replica {r}/{reps}", file=sys.stderr)
    writer.close()
    n = pq.read_metadata(out).num_rows
    print(f"{t}: {n} rows -> {out}")
