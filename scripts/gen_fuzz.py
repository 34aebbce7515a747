#!/usr/bin/env python3
"""Adversarial fixture generator for the differential fuzz gate.

Driver-side tooling only (duckdb is the sandbox's oracle engine, not an
engine dependency). Starts from a real testdata dir (default sf0.001) so
key relationships and value domains stay realistic, then MUTATES it by
mode — schemas are frozen by explicit casts so engine and oracle read
identical parquet types.

Modes (all deterministic in <seed> via duckdb hash()):
  edge  — hostile strings (empty/unicode/control/quotes/very-long) and
          extreme numerics (0, negatives, 1e300, boundary discounts)
          injected at ~5%/column; keys untouched.
  nulls — NULLs at ~6% in every nullable non-key column, including whole
          embeddings.
  tiny  — minimal row counts (documents 7, embeddings 5, events 13,
          lineitem 37, orders = the sampled lineitem's orders): empty
          groups, k>n top-k, single-element quantizer feeds.
  skew  — one giant key: 85% of lineitem on one order, 70% of documents
          byte-identical text, 80% of events on user 0, 60% of
          embeddings one identical vector; mass value ties.
  nan   — non-finite doubles (NaN/+Inf/-Inf), negative zero, denormals
          and max-double injected at ~5% into every DOUBLE column and
          into embedding vectors. NOT oracle-comparable (engines
          legitimately differ on NaN ordering/equality) — consumed by
          scripts/nan_gate.py, which asserts no-crash + run-to-run
          self-consistency instead of a DuckDB diff.

Usage: python3 scripts/gen_fuzz.py <seed> <outdir> <mode> [base_dir]
"""
import os
import sys

import duckdb

seed = int(sys.argv[1])
out = sys.argv[2]
mode = sys.argv[3]
base = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.001"
S = seed * 7919 + 13

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# Frozen output schemas: every COPY casts to exactly these types.
SCHEMAS = {
    "region": [("r_regionkey", "INTEGER"), ("r_name", "VARCHAR")],
    "nation": [("n_nationkey", "INTEGER"), ("n_name", "VARCHAR"),
               ("n_regionkey", "INTEGER")],
    "customer": [("c_custkey", "BIGINT"), ("c_name", "VARCHAR"),
                 ("c_nationkey", "INTEGER"), ("c_acctbal", "DOUBLE"),
                 ("c_mktsegment", "VARCHAR")],
    "supplier": [("s_suppkey", "BIGINT"), ("s_name", "VARCHAR"),
                 ("s_nationkey", "INTEGER"), ("s_acctbal", "DOUBLE")],
    "part": [("p_partkey", "BIGINT"), ("p_name", "VARCHAR"),
             ("p_brand", "VARCHAR"), ("p_type", "VARCHAR"),
             ("p_size", "INTEGER"), ("p_retailprice", "DOUBLE")],
    "orders": [("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"),
               ("o_orderstatus", "VARCHAR"), ("o_totalprice", "DOUBLE"),
               ("o_orderdate", "TIMESTAMP"), ("o_orderpriority", "VARCHAR")],
    "lineitem": [("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"),
                 ("l_suppkey", "BIGINT"), ("l_linenumber", "INTEGER"),
                 ("l_quantity", "DOUBLE"), ("l_extendedprice", "DOUBLE"),
                 ("l_discount", "DOUBLE"), ("l_tax", "DOUBLE"),
                 ("l_returnflag", "VARCHAR"), ("l_linestatus", "VARCHAR"),
                 ("l_shipdate", "TIMESTAMP")],
    "events": [("event_id", "BIGINT"), ("ts", "TIMESTAMP"),
               ("user_id", "BIGINT"), ("event_type", "VARCHAR"),
               ("value", "DOUBLE"), ("props", "VARCHAR")],
    "documents": [("doc_id", "BIGINT"), ("text", "VARCHAR"),
                  ("lang", "VARCHAR"), ("source", "VARCHAR"),
                  ("n_chars", "BIGINT")],
    "embeddings": [("vec_id", "BIGINT"), ("embedding", "FLOAT[]"),
                   ("label", "INTEGER")],
}

# Hostile string pool (SQL literals; chr() for control chars so no
# escape-dialect ambiguity).
HOSTILE_STR = [
    "''",
    "'   '",
    "('a' || chr(9) || 'b' || chr(10) || 'c')",
    "'naïve café'",
    "'日本語テキスト'",
    "'emoji 🚀🔥 test'",
    "'مرحبا بالعالم'",
    "('e' || chr(769) || 'combining')",
    "'it''s \"quoted\" \\back\\slash'",
    "'a|b,c;d'",
    "repeat('xyzzy ', 400)",
    "'NULL'",
    "'?'",
    "'  padded  '",
    "'{\"k\": \"v\"}'",
]
# Hostile doubles: zero, negatives, huge, tiny, high-precision.
HOSTILE_NUM = ["0.0", "-123.456", "1e300", "1e-300", "-1e9",
               "0.1234567890123456", "9999999999.99"]
HOSTILE_TS = ["TIMESTAMP '1900-01-01 00:00:00'",
              "TIMESTAMP '2199-12-31 23:59:59'",
              "TIMESTAMP '1970-01-01 00:00:00'"]


def u(key, salt):
    """Deterministic uniform [0,1) from a key expression and salt."""
    return (f"((hash(({key}) * 1000003 + {S + salt}) % 1000000)"
            f" / 1000000.0)")


def pick(key, salt, options):
    n = len(options)
    arms = " ".join(f"WHEN {i} THEN {o}" for i, o in enumerate(options))
    return (f"(CASE CAST(floor({u(key, salt)} * {n}) AS INT)"
            f" {arms} ELSE {options[0]} END)")


def mut(col, key, salt, rate, options):
    """Replace col with a hostile pick at the given rate."""
    return (f"(CASE WHEN {u(key, salt)} < {rate}"
            f" THEN {pick(key, salt + 500, options)} ELSE {col} END)")


def nul(col, key, salt, rate=0.06):
    return f"(CASE WHEN {u(key, salt)} < {rate} THEN NULL ELSE {col} END)"


def write(table, select_sql):
    cols = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in SCHEMAS[table])
    con.execute(f"COPY (SELECT {cols} FROM ({select_sql}) _t)"
                f" TO '{out}/{table}.parquet' (FORMAT PARQUET)")


def src(table):
    return f"'{base}/{table}.parquet'"


def ident(table):
    return f"SELECT * FROM {src(table)}"


sel = {t: ident(t) for t in SCHEMAS}

if mode == "edge":
    k = "l_orderkey * 7 + l_linenumber"
    sel["lineitem"] = f"""
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             {mut('l_quantity', k, 1, 0.05, HOSTILE_NUM)} AS l_quantity,
             {mut('l_extendedprice', k, 2, 0.05, HOSTILE_NUM)} AS l_extendedprice,
             {mut('l_discount', k, 3, 0.05,
                  ['0.0', '1.0', '0.9999999', '1e-9'])} AS l_discount,
             {mut('l_tax', k, 4, 0.04, ['0.0', '0.5'])} AS l_tax,
             {mut('l_returnflag', k, 5, 0.03, ["''", "'X'", "'r'"])} AS l_returnflag,
             l_linestatus,
             {mut('l_shipdate', k, 6, 0.04, HOSTILE_TS)} AS l_shipdate
      FROM {src('lineitem')}"""
    sel["documents"] = f"""
      SELECT doc_id,
             {mut('text', 'doc_id', 10, 0.08, HOSTILE_STR)} AS text,
             {mut('lang', 'doc_id', 11, 0.05,
                  ["''", "'zz'", "'EN'", "'pt-BR'"])} AS lang,
             {mut('source', 'doc_id', 12, 0.05,
                  ["''", "'src with space'", "'src|pipe'"])} AS source,
             {mut('n_chars', 'doc_id', 13, 0.05,
                  ['0', '-1', '9999999999'])} AS n_chars
      FROM {src('documents')}"""
    hostile_props = HOSTILE_STR + ['\'{"k": }\'', "'not json'",
                                   '\'{"k": -1, "j": {"n": 2}}\'']
    props_mut = mut('props', 'event_id', 23, 0.08, hostile_props)
    etype_mut = mut('event_type', 'event_id', 21, 0.05,
                    ["''", "'CLICK'", "('a' || chr(9) || 'b')"])
    # event ts jitters stay within +-3 days: the streaming windows'
    # WATERMARK contract (late data beyond the delay is dropped) is real
    # engine semantics the batch-SQL oracle cannot express — an epoch or
    # year-2199 event would "correctly" drop everything else. Extreme
    # timestamps are still fuzzed via lineitem/orders (no watermarks).
    ts_jitter = ["ts - INTERVAL 3 DAY", "ts + INTERVAL 3 DAY",
                 "ts - INTERVAL 1 HOUR", "ts + INTERVAL '1' SECOND"]
    sel["events"] = f"""
      SELECT event_id, {mut('ts', 'event_id', 20, 0.05, ts_jitter)} AS ts,
             user_id,
             {etype_mut} AS event_type,
             {mut('value', 'event_id', 22, 0.06, HOSTILE_NUM)} AS value,
             {props_mut} AS props
      FROM {src('events')}"""
    sel["customer"] = f"""
      SELECT c_custkey, {mut('c_name', 'c_custkey', 30, 0.08, HOSTILE_STR)} AS c_name,
             c_nationkey,
             {mut('c_acctbal', 'c_custkey', 31, 0.08, HOSTILE_NUM)} AS c_acctbal,
             {mut('c_mktsegment', 'c_custkey', 32, 0.05, ["''", "'machinery'"])} AS c_mktsegment
      FROM {src('customer')}"""
    sel["part"] = f"""
      SELECT p_partkey, {mut('p_name', 'p_partkey', 40, 0.08, HOSTILE_STR)} AS p_name,
             p_brand, p_type,
             {mut('p_size', 'p_partkey', 41, 0.06, ['0', '-5', '1000000'])} AS p_size,
             {mut('p_retailprice', 'p_partkey', 42, 0.06, HOSTILE_NUM)} AS p_retailprice
      FROM {src('part')}"""
    sel["orders"] = f"""
      SELECT o_orderkey, o_custkey, o_orderstatus,
             {mut('o_totalprice', 'o_orderkey', 50, 0.06, HOSTILE_NUM)} AS o_totalprice,
             {mut('o_orderdate', 'o_orderkey', 51, 0.05, HOSTILE_TS)} AS o_orderdate,
             o_orderpriority
      FROM {src('orders')}"""
    sel["embeddings"] = f"""
      SELECT vec_id,
             CASE WHEN {u('vec_id', 60)} < 0.03
                    THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                  WHEN {u('vec_id', 60)} < 0.06
                    THEN list_transform(embedding, x -> CAST(x * 1e6 AS FLOAT))
                  WHEN {u('vec_id', 60)} < 0.09
                    THEN list_transform(embedding, x -> CAST(-x AS FLOAT))
                  ELSE embedding END AS embedding,
             label
      FROM {src('embeddings')}"""

elif mode == "nulls":
    k = "l_orderkey * 7 + l_linenumber"
    sel["lineitem"] = f"""
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             {nul('l_quantity', k, 1)} AS l_quantity,
             {nul('l_extendedprice', k, 2)} AS l_extendedprice,
             {nul('l_discount', k, 3)} AS l_discount,
             {nul('l_tax', k, 4)} AS l_tax,
             {nul('l_returnflag', k, 5, 0.04)} AS l_returnflag,
             {nul('l_linestatus', k, 6, 0.04)} AS l_linestatus,
             {nul('l_shipdate', k, 7)} AS l_shipdate
      FROM {src('lineitem')}"""
    sel["documents"] = f"""
      SELECT doc_id, {nul('text', 'doc_id', 10, 0.07)} AS text,
             {nul('lang', 'doc_id', 11)} AS lang,
             {nul('source', 'doc_id', 12)} AS source,
             {nul('n_chars', 'doc_id', 13)} AS n_chars
      FROM {src('documents')}"""
    sel["events"] = f"""
      SELECT event_id, {nul('ts', 'event_id', 20, 0.04)} AS ts, user_id,
             {nul('event_type', 'event_id', 21)} AS event_type,
             {nul('value', 'event_id', 22)} AS value,
             {nul('props', 'event_id', 23)} AS props
      FROM {src('events')}"""
    sel["customer"] = f"""
      SELECT c_custkey, {nul('c_name', 'c_custkey', 30)} AS c_name,
             {nul('c_nationkey', 'c_custkey', 31, 0.04)} AS c_nationkey,
             {nul('c_acctbal', 'c_custkey', 32)} AS c_acctbal,
             {nul('c_mktsegment', 'c_custkey', 33)} AS c_mktsegment
      FROM {src('customer')}"""
    sel["orders"] = f"""
      SELECT o_orderkey, o_custkey,
             {nul('o_orderstatus', 'o_orderkey', 40, 0.04)} AS o_orderstatus,
             {nul('o_totalprice', 'o_orderkey', 41)} AS o_totalprice,
             {nul('o_orderdate', 'o_orderkey', 42)} AS o_orderdate,
             {nul('o_orderpriority', 'o_orderkey', 43)} AS o_orderpriority
      FROM {src('orders')}"""
    sel["part"] = f"""
      SELECT p_partkey, {nul('p_name', 'p_partkey', 50)} AS p_name,
             {nul('p_brand', 'p_partkey', 51)} AS p_brand,
             {nul('p_type', 'p_partkey', 52)} AS p_type,
             {nul('p_size', 'p_partkey', 53)} AS p_size,
             {nul('p_retailprice', 'p_partkey', 54)} AS p_retailprice
      FROM {src('part')}"""
    sel["embeddings"] = f"""
      SELECT vec_id, {nul('embedding', 'vec_id', 60, 0.04)} AS embedding,
             {nul('label', 'vec_id', 61, 0.05)} AS label
      FROM {src('embeddings')}"""

elif mode == "tiny":
    nd = 7 + seed % 3
    ne = 5 + seed % 2
    nv = 13 + seed % 5
    nl = 37 + seed % 7
    sel["documents"] = (f"SELECT * FROM {src('documents')} "
                        f"ORDER BY doc_id LIMIT {nd}")
    sel["embeddings"] = (f"SELECT * FROM {src('embeddings')} "
                         f"ORDER BY vec_id LIMIT {ne}")
    sel["events"] = (f"SELECT * FROM {src('events')} "
                     f"ORDER BY event_id LIMIT {nv}")
    sel["lineitem"] = (f"SELECT * FROM {src('lineitem')} "
                       f"ORDER BY l_orderkey, l_linenumber LIMIT {nl}")
    sel["orders"] = (f"SELECT * FROM {src('orders')} o WHERE o.o_orderkey IN "
                     f"(SELECT l_orderkey FROM ({sel['lineitem']}) _l)")

elif mode == "nan":
    # Non-finite pool: quiet NaN, both infinities, negative zero, the
    # smallest denormal, max double. These are all representable in
    # parquet DOUBLE and survive the frozen-schema CAST unchanged.
    NONFIN = ["'NaN'::DOUBLE", "'Infinity'::DOUBLE",
              "'-Infinity'::DOUBLE", "-0.0", "5e-324",
              "1.7976931348623157e308"]
    k = "l_orderkey * 7 + l_linenumber"
    sel["lineitem"] = f"""
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             {mut('l_quantity', k, 1, 0.05, NONFIN)} AS l_quantity,
             {mut('l_extendedprice', k, 2, 0.05, NONFIN)} AS l_extendedprice,
             {mut('l_discount', k, 3, 0.05, NONFIN)} AS l_discount,
             {mut('l_tax', k, 4, 0.04, NONFIN)} AS l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM {src('lineitem')}"""
    sel["orders"] = f"""
      SELECT o_orderkey, o_custkey, o_orderstatus,
             {mut('o_totalprice', 'o_orderkey', 10, 0.05, NONFIN)} AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM {src('orders')}"""
    sel["customer"] = f"""
      SELECT c_custkey, c_name, c_nationkey,
             {mut('c_acctbal', 'c_custkey', 20, 0.06, NONFIN)} AS c_acctbal,
             c_mktsegment
      FROM {src('customer')}"""
    sel["supplier"] = f"""
      SELECT s_suppkey, s_name, s_nationkey,
             {mut('s_acctbal', 's_suppkey', 25, 0.06, NONFIN)} AS s_acctbal
      FROM {src('supplier')}"""
    sel["part"] = f"""
      SELECT p_partkey, p_name, p_brand, p_type, p_size,
             {mut('p_retailprice', 'p_partkey', 30, 0.06, NONFIN)} AS p_retailprice
      FROM {src('part')}"""
    sel["events"] = f"""
      SELECT event_id, ts, user_id, event_type,
             {mut('value', 'event_id', 40, 0.06, NONFIN)} AS value,
             props
      FROM {src('events')}"""
    # embeddings: whole-vector NaN, x*Inf (mixes +-Inf with NaN where
    # x=0), and a single poisoned leading component
    sel["embeddings"] = f"""
      SELECT vec_id,
             CASE WHEN {u('vec_id', 50)} < 0.02
                    THEN list_transform(embedding,
                           x -> CAST('NaN' AS FLOAT))
                  WHEN {u('vec_id', 50)} < 0.04
                    THEN list_transform(embedding,
                           x -> CAST(x * 'Infinity'::FLOAT AS FLOAT))
                  WHEN {u('vec_id', 50)} < 0.06
                    THEN list_concat([CAST('NaN' AS FLOAT)],
                           embedding[2:])
                  ELSE embedding END AS embedding,
             label
      FROM {src('embeddings')}"""

elif mode == "skew":
    big_ord = ("(SELECT min(l_orderkey) FROM "
               f"{src('lineitem')})")
    sel["lineitem"] = f"""
      SELECT CASE WHEN {u('l_orderkey * 7 + l_linenumber', 1)} < 0.85
                  THEN {big_ord} ELSE l_orderkey END AS l_orderkey,
             CASE WHEN {u('l_orderkey * 7 + l_linenumber', 2)} < 0.7
                  THEN (SELECT min(p_partkey) FROM {src('part')})
                  ELSE l_partkey END AS l_partkey,
             l_suppkey, l_linenumber,
             CASE WHEN {u('l_orderkey * 7 + l_linenumber', 3)} < 0.6
                  THEN 25.0 ELSE l_quantity END AS l_quantity,
             l_extendedprice,
             CASE WHEN {u('l_orderkey * 7 + l_linenumber', 4)} < 0.5
                  THEN 0.05 ELSE l_discount END AS l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM {src('lineitem')}"""
    sel["documents"] = f"""
      SELECT doc_id,
             CASE WHEN {u('doc_id', 10)} < 0.7
                  THEN 'the quick brown fox jumps over the lazy dog common duplicate text block for skew fuzzing'
                  ELSE text END AS text,
             lang, source,
             CASE WHEN {u('doc_id', 10)} < 0.7 THEN 93 ELSE n_chars END AS n_chars
      FROM {src('documents')}"""
    sel["events"] = f"""
      SELECT event_id, ts,
             CASE WHEN {u('event_id', 20)} < 0.8 THEN 0 ELSE user_id END AS user_id,
             CASE WHEN {u('event_id', 21)} < 0.9 THEN 'click' ELSE event_type END AS event_type,
             value, props
      FROM {src('events')}"""
    sel["embeddings"] = f"""
      SELECT vec_id,
             CASE WHEN {u('vec_id', 30)} < 0.6
                  THEN (SELECT embedding FROM {src('embeddings')}
                        ORDER BY vec_id LIMIT 1)
                  ELSE embedding END AS embedding,
             label
      FROM {src('embeddings')}"""
else:
    sys.exit(f"unknown mode {mode}")

for t in SCHEMAS:
    write(t, sel[t])

for t in SCHEMAS:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t} {n}")
