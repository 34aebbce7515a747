#!/usr/bin/env python3
"""Sparse 100x replica for the dedup/ANN GEOMETRY check (BENCH_SCALE.md
"100x geometry" section).

Only the two tables the production dedup/similarity paths read
(documents, embeddings) are generated -- the point is another decade of
n for bitsFor/dfCap/maxBucket, not a full-catalog soak (that is the 10x
replica's job, scripts/gen_sf1.py).

Unlike gen_sf1.py, copies are made CONTENT-UNIQUE: every word of copy
i >= 1 gets an `_cI` suffix, so shingles never collide across copies and
the duplicate-cluster STRUCTURE of sf0.1 is preserved at 100x the
cluster count (not 100x the cluster size). Pair outputs therefore grow
~linearly with n and the measured drift isolates bucket-occupancy
behavior -- cluster-size blowup is the 10x replica's dimension.

- documents: 100 copies, remapped doc_id; copy 0 verbatim, copies 1..99
  word-suffixed with _cI (globally unique shingles per copy).
- embeddings: 100 copies, remapped vec_id, PER-COMPONENT hash noise of
  magnitude comparable to the signal (+-0.15 vs avg |x| ~ 0.1). The
  gen_sf1 recipe (one tiny constant offset per vector) would leave all
  100 copies near-identical -- every bucket would hold >=100 mutual
  near-dups and the probe would measure the duplicate-density axis
  instead of bucket occupancy vs n. Copies here stay loosely correlated
  with their original (top-k remains non-trivial) but spread across
  hyperplane cells like fresh vectors.

Usage: python3 scripts/gen_sf10.py [src_dir] [out_dir]
"""
import os
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf10'

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT d.doc_id + c.i * 5000 AS doc_id,
         CASE WHEN c.i = 0 THEN d.text
              ELSE replace(d.text, ' ', '_c' || c.i || ' ')
                   || '_c' || c.i END AS text,
         d.lang, d.source,
         length(CASE WHEN c.i = 0 THEN d.text
              ELSE replace(d.text, ' ', '_c' || c.i || ' ')
                   || '_c' || c.i END) AS n_chars
  FROM '{sf}/documents.parquet' d, (SELECT unnest(range(100)) AS i) c
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.vec_id + c.i * 2000 AS vec_id,
         CASE WHEN c.i = 0 THEN e.embedding
              ELSE list_transform(list_zip(e.embedding,
                     range(1, len(e.embedding) + 1)),
                p -> CAST(p[1] +
                  (CAST(hash(e.vec_id * 131071 + c.i * 257 + p[2]) % 301
                        AS BIGINT) - 150) * 1e-3 AS FLOAT))
              END AS embedding,
         e.label
  FROM '{sf}/embeddings.parquet' e, (SELECT unnest(range(100)) AS i) c
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

for t in ['documents', 'embeddings']:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f'{t}: {n} rows')
