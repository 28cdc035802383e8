#!/usr/bin/env python3
"""Replicate sf0.1 documents/embeddings N-fold with deterministic
perturbation, producing the sf~1 dataset used for the heavy-tail scale
evidence run (BASELINE.md). Driver-side tooling only — NOT part of the
shipped library.

Replica 0 is the original data byte-for-byte. Further replicas shift
ids by r*10^7, append a short ' zz<r>' suffix to text (within-replica
dup/shingle structure preserved, no artificial cross-replica exact
dups) and add small deterministic per-dim noise to embeddings (so
replicas remain near — but not identical to — the originals, the
realistic near-dup shape for a 10x-grown corpus).

Usage: python3 tools/scale_data.py /root/testdata/sf0.1 /tmp/sf1 10 [tables]
    tables: optional comma list (documents,embeddings,events) — e.g.
    the alert-engine 100x run scales ONLY events.
"""
import os
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
tables = (set(sys.argv[4].split(","))
          if len(sys.argv) > 4 else {"documents", "embeddings", "events"})
# core TPC-H facts (lineitem/orders/customer) can be scaled too —
# replica r shifts every key in the customer→orders→lineitem chain by
# r*10^7, so referential integrity (and thus join fan-out per key) is
# preserved while the fact volume grows; dimension tables
# (part/supplier/nation/region) stay unscaled, which is how a real
# warehouse grows — facts accrete, dims stay broadcast-small.
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# The replica shift r*10^7 preserves uniqueness/referential-integrity
# ONLY while every source key is below 10^7 (TPC-H o_orderkey reaches
# 6M*sf, so sf above ~1.6 would silently collide replicas and change
# join fan-out). Assert it instead of trusting it.
SHIFT = 10_000_000
_KEYS = {"documents": ["doc_id"], "embeddings": ["vec_id"],
         "events": ["event_id", "user_id"], "customer": ["c_custkey"],
         "orders": ["o_orderkey", "o_custkey"], "lineitem": ["l_orderkey"]}
for _t in sorted(tables):
    for _k in _KEYS.get(_t, []):
        mx, = con.execute(
            f"SELECT max({_k}) FROM read_parquet('{src}/{_t}.parquet')"
        ).fetchone()
        assert mx is None or mx < SHIFT, (
            f"{_t}.{_k} max {mx} >= shift {SHIFT}: replica keys would "
            f"collide — raise the shift before scaling this source")

if "documents" in tables:
    con.execute(f"""
COPY (
  SELECT doc_id + r * 10000000 AS doc_id,
         CASE WHEN r = 0 THEN text ELSE text || ' zz' || r END AS text,
         lang, source,
         length(CASE WHEN r = 0 THEN text
                     ELSE text || ' zz' || r END) AS n_chars
  FROM read_parquet('{src}/documents.parquet'), range({reps}) t(r)
  ORDER BY doc_id
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")

if "embeddings" in tables:
    con.execute(f"""
COPY (
  SELECT vec_id + r * 10000000 AS vec_id,
         CASE WHEN r = 0 THEN embedding ELSE
           list_transform(embedding, (x, i) -> CAST(
             x + ((vec_id * 131 + i * 31 + r * 17) % 7 - 3) * 0.01
             AS FLOAT))
         END AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'), range({reps}) t(r)
  ORDER BY vec_id
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")

# events: replica r offsets event_id and user_id by r*10^7 — the actor
# SPACE scales 10x while each actor keeps the original per-actor event
# density and time window, so alert chains/suppression groups keep
# their realistic shape (a security log grows by adding actors, not by
# making every actor 10x noisier).
# The replica must carry the SAME ts column type as the source (the
# loader dispatches on it; a scaled run should exercise the same
# branch the real data does). Sources have shipped both TIMESTAMP(NANOS)
# (through r10) and timestamp[us] (since the r11 regeneration):
# DuckDB COPY always downgrades to µs, so the ns case goes through
# pyarrow to preserve the NANOS type; the µs case COPYies directly.
if "events" in tables:
    import pyarrow as pa  # noqa: E402  (driver-side only)
    import pyarrow.parquet as pq  # noqa: E402

    src_ts = pq.read_schema(f"{src}/events.parquet").field("ts").type
    if src_ts == pa.timestamp("ns"):
        tbl = con.execute(f"""
          SELECT event_id + r * 10000000 AS event_id,
                 epoch_ns(ts) AS ts,
                 user_id + r * 10000000 AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet'), range({reps}) t(r)
          ORDER BY event_id
        """).arrow()
        ts_idx = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(ts_idx, "ts",
                             tbl.column("ts").cast(pa.timestamp("ns")))
        # row_group_size matches DuckDB COPY's default (122880 rows) —
        # the grouping the other scaled tables get, and what any real
        # writer produces at this volume (a single 1M-row group would
        # serialize Spark's scan behind one task, an artifact not a
        # measurement)
        pq.write_table(tbl, f"{dst}/events.parquet",
                       row_group_size=122880,
                       coerce_timestamps=None, store_schema=False)
    else:
        con.execute(f"""
COPY (
  SELECT event_id + r * 10000000 AS event_id,
         ts,
         user_id + r * 10000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{src}/events.parquet'), range({reps}) t(r)
  ORDER BY event_id
) TO '{dst}/events.parquet' (FORMAT PARQUET)
""")

if "customer" in tables:
    con.execute(f"""
COPY (
  SELECT c_custkey + r * 10000000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{src}/customer.parquet'), range({reps}) t(r)
  ORDER BY c_custkey
) TO '{dst}/customer.parquet' (FORMAT PARQUET)
""")

if "orders" in tables:
    con.execute(f"""
COPY (
  SELECT o_orderkey + r * 10000000 AS o_orderkey,
         o_custkey + r * 10000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'), range({reps}) t(r)
  ORDER BY o_orderkey
) TO '{dst}/orders.parquet' (FORMAT PARQUET)
""")

if "lineitem" in tables:
    con.execute(f"""
COPY (
  SELECT l_orderkey + r * 10000000 AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag,
         l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet'), range({reps}) t(r)
  ORDER BY l_orderkey
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
""")

for t in sorted(tables):
    n, = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()
    print(f"{t}: {n} rows")
