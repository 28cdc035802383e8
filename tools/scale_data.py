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

Usage: python3 tools/scale_data.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import os
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

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

for t in ("documents", "embeddings"):
    n, = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()
    print(f"{t}: {n} rows")
