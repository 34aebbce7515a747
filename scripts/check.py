#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: schema (column names sorted), row count, and values (rows sorted,
exact match; floats compared both exactly and with 1e-9 rtol to flag
borderline queries).
"""
import json, sys, glob, os, threading
import duckdb
import pandas as pd
import numpy as np

# Per-oracle wall timeout (seconds). 0/unset = no timeout. Used for the
# large-SF gates where a handful of deliberately-quadratic REPLAY oracles
# (exact all-pairs cosine in SQL) are infeasible in DuckDB — the engine
# side still runs; the oracle is reported ORACLE-TIMEOUT, not hung.
TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_frame(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(d)])
    n_pass = n_fail = n_skip = 0
    for name in names:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        timer = None
        timed_out = []
        if TIMEOUT > 0:
            timer = threading.Timer(
                TIMEOUT, lambda: (timed_out.append(True), con.interrupt()))
            timer.start()
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            if timed_out:
                print(f"⏱ {name}: ORACLE-TIMEOUT after {TIMEOUT:.0f}s "
                      f"(engine rows={len(got)}; quadratic replay oracle)")
                n_skip += 1
            else:
                print(f"✗ {name}: oracle SQL failed: {e}")
                n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
        g, e = norm_frame(got), norm_frame(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: schema mismatch spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name}: rowcount spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        ok = True
        close_only = False
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            # The driver's hash compare is REPRESENTATION-sensitive: an
            # int64-vs-float64 dtype split ("500" vs "500.0") or a -0.0 on
            # one side only hash-mismatches even when values compare equal.
            # DuckDB's sum(BIGINT) → HUGEINT → float64 is the usual culprit
            # (fix: cast the oracle aggregate ::BIGINT); round() of a tiny
            # negative is the -0.0 one (fix: `round(...) + 0`).
            gf = np.issubdtype(g[c].dtype, np.floating)
            ef = np.issubdtype(e[c].dtype, np.floating)
            if gf != ef:
                print(f"✗ {name}.{c}: DTYPE split spark={g[c].dtype} "
                      f"duck={e[c].dtype} (driver hash will mismatch)")
                ok = False
            if gf and ef:
                gz = int(((gv == 0) & np.signbit(gv.astype(float))).sum())
                ez = int(((ev == 0) & np.signbit(ev.astype(float))).sum())
                if gz != ez:
                    print(f"✗ {name}.{c}: -0.0 split spark={gz} duck={ez} "
                          f"(driver hash will mismatch)")
                    ok = False
            if gf or ef:
                gv = gv.astype(float); ev = ev.astype(float)
                exact = np.array_equal(gv, ev, equal_nan=True)
                close = np.allclose(gv, ev, rtol=1e-9, atol=1e-12, equal_nan=True)
                if not exact and close:
                    close_only = True
                elif not close:
                    bad = np.where(~np.isclose(gv, ev, rtol=1e-9, atol=1e-12, equal_nan=True))[0][:3]
                    print(f"✗ {name}.{c}: value mismatch at rows {bad.tolist()}: "
                          f"spark={gv[bad].tolist()} duck={ev[bad].tolist()}")
                    ok = False
            else:
                if not (gv == ev).all():
                    bad = np.where(gv != ev)[0][:3]
                    print(f"✗ {name}.{c}: mismatch at {bad.tolist()}: "
                          f"spark={gv[bad].tolist()} duck={ev[bad].tolist()}")
                    ok = False
        if ok:
            n_pass += 1
            flag = " (float-close, not bit-exact!)" if close_only else ""
            print(f"✓ {name}: {len(g)} rows{flag}")
        else:
            n_fail += 1
    skip = f", {n_skip} oracle-timeout" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total{skip}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
