#!/usr/bin/env python3
"""Generate the 10x scale-soak replica of the sf0.1 test tables.

Driver-side tooling only (duckdb is the sandbox's oracle engine, not an
engine dependency). The replica keeps each table's schema and value
distributions while staying non-degenerate:

- documents: 10 copies, remapped doc_id; copies 1..9 append a
  ' copyvariantN' token so the near-dup structure persists (every doc
  gains 9 near-dups) without the corpus collapsing to exact dups.
- embeddings: 10 copies, remapped vec_id, hash-derived per-copy jitter
  so ANN neighborhoods stay non-trivial.
- events: 10 copies, remapped event/user ids, day-shifted timestamps —
  10x users, same per-user density (windows/sessionization scale in
  keys, not in per-key depth).
- lineitem: 10 copies with remapped l_orderkey (same per-order shape).
- dims (customer/orders/nation/region/part/supplier): copied as-is.

Usage: python3 scripts/gen_sf1.py [src_dir] [out_dir]
"""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT d.doc_id + c.i * 5000 AS doc_id,
         CASE WHEN c.i = 0 THEN d.text
              ELSE d.text || ' copyvariant' || c.i END AS text,
         d.lang, d.source,
         CASE WHEN c.i = 0 THEN d.n_chars
              ELSE d.n_chars + 12 + CAST(c.i >= 10 AS INT) END AS n_chars
  FROM '{sf}/documents.parquet' d, (SELECT unnest(range(10)) AS i) c
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.vec_id + c.i * 2000 AS vec_id,
         CASE WHEN c.i = 0 THEN e.embedding
              ELSE list_transform(e.embedding,
                x -> CAST(x + (hash(e.vec_id * 31 + c.i) % 100) * 1e-4
                     AS FLOAT)) END AS embedding,
         e.label
  FROM '{sf}/embeddings.parquet' e, (SELECT unnest(range(10)) AS i) c
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.event_id + c.i * 100000 AS event_id,
         e.ts + INTERVAL (c.i) DAY AS ts,
         e.user_id + c.i * 100000 AS user_id,
         e.event_type, e.value, e.props
  FROM '{sf}/events.parquet' e, (SELECT unnest(range(10)) AS i) c
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

cols = [d[0] for d in con.execute(
    f"DESCRIBE SELECT * FROM '{sf}/lineitem.parquet'").fetchall()]
rest = ', '.join(f'l.{c}' for c in cols if c != 'l_orderkey')
con.execute(f"""
COPY (
  SELECT l.l_orderkey + c.i * 6000000 AS l_orderkey, {rest}
  FROM '{sf}/lineitem.parquet' l, (SELECT unnest(range(10)) AS i) c
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")

for t in ['customer', 'orders', 'nation', 'region', 'part', 'supplier']:
    con.execute(f"COPY (SELECT * FROM '{sf}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")

for t in ['documents', 'embeddings', 'events', 'lineitem']:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
