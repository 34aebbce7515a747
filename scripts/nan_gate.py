#!/usr/bin/env python3
"""NaN/Inf robustness gate: no-crash + run-to-run self-consistency.

The differential fuzz gate deliberately excludes non-finite inputs —
Spark and DuckDB legitimately disagree on NaN ordering/equality, so a
DuckDB diff cannot adjudicate them (FUZZ.md "deliberate domain
limits"). This gate checks the two properties that ARE well-defined
without an oracle:

  CRASH      — a query threw on the nan fixture (engine must degrade
               to NaN/NULL/filtered rows, never an exception)
  FLAP       — the same query on the same fixture in two fresh JVMs
               produced different answers (multiset compare, NaN==NaN,
               NULL==NULL via DuckDB set semantics). A flap means the
               answer depends on shuffle-fetch/summation order — the
               same defect class as the r15 unordered-limit landmine,
               and a latent driver-gate risk even on finite inputs.
  CRASH-FLAP — a query crashed in one run but not the other.

Usage:
  python3 scripts/nan_gate.py                 # nan:1 + finite control
  python3 scripts/nan_gate.py nan:3,nan:4     # explicit fixtures
  python3 scripts/nan_gate.py base            # control only (bit-
                                              # stability of the whole
                                              # catalog on sf0.001)
Exit 0 iff no findings.
"""
import os
import re
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/fuzz"


def sh(cmd, **kw):
    return subprocess.run(cmd, cwd=REPO, capture_output=True,
                          text=True, **kw)


def verify(fix, outd):
    v = sh(["scripts/run.sh", "graft.Verify", fix, outd],
           env=dict(os.environ, SPARK_GRAFT_CPUS="8"))
    crashes = dict(re.findall(r"\[verify\] (\S+) failed: (.*)", v.stderr))
    if v.returncode != 0 and not crashes:
        print(v.stderr[-4000:])
        sys.exit(f"Verify itself died for {fix}")
    return crashes


def compare(out_a, out_b, name):
    """Multiset-equal under DuckDB set semantics (hash grouping treats
    NaN==NaN and NULL==NULL as equal — exactly the identity we want)."""
    # graft.Verify writes each query as a DIRECTORY of part files
    a, b = f"{out_a}/{name}/*.parquet", f"{out_b}/{name}/*.parquet"
    con = duckdb.connect()
    try:
        na = con.execute(f"SELECT count(*) FROM '{a}'").fetchone()[0]
        nb = con.execute(f"SELECT count(*) FROM '{b}'").fetchone()[0]
        if na != nb:
            return f"rowcount {na} vs {nb}"
        d = con.execute(
            f"SELECT count(*) FROM ("
            f"(SELECT * FROM '{a}' EXCEPT ALL SELECT * FROM '{b}')"
            f" UNION ALL "
            f"(SELECT * FROM '{b}' EXCEPT ALL SELECT * FROM '{a}'))"
        ).fetchone()[0]
        return None if d == 0 else f"{d} differing rows (of {na})"
    except Exception as e:  # schema drift between runs is also a flap
        return f"compare error: {e}"
    finally:
        con.close()


def run_one(tag, fix):
    out_a, out_b = f"{WORK}/nanout_{tag}_a", f"{WORK}/nanout_{tag}_b"
    crashes_a = verify(fix, out_a)
    crashes_b = verify(fix, out_b)
    findings = []
    for q in sorted(set(crashes_a) | set(crashes_b)):
        if q in crashes_a and q in crashes_b:
            findings.append(("CRASH", q, crashes_a[q][:200]))
        else:
            where = "run A" if q in crashes_a else "run B"
            findings.append(("CRASH-FLAP", q,
                             f"crashed only in {where}"))
    names = sorted(
        f for f in os.listdir(out_a)
        if os.path.isdir(f"{out_a}/{f}")
        and f not in crashes_a and f not in crashes_b
        and os.path.isdir(f"{out_b}/{f}"))
    for q in names:
        diff = compare(out_a, out_b, q)
        if diff:
            findings.append(("FLAP", q, diff))
    return findings, len(names)


def main():
    plan = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["nan:1", "base"])
    os.makedirs(WORK, exist_ok=True)
    bad = 0
    for entry in plan:
        if entry == "base":
            tag, fix = "base", "/root/testdata/sf0.001"
        else:
            # composite modes chain like fuzz_gate ('nulls+nan:1' =
            # NaNs injected on top of the nulled tables)
            mode, seed = entry.split(":")
            tag = f"{mode.replace('+', '_')}_{seed}"
            fix = f"{WORK}/{tag}"
            base = None
            stages = mode.split("+")
            for i, m in enumerate(stages):
                dst = fix if i == len(stages) - 1 else f"{fix}__stage{i}"
                cmd = ["python3", "scripts/gen_fuzz.py", seed, dst, m]
                if base:
                    cmd.append(base)
                g = sh(cmd)
                if g.returncode != 0:
                    print(g.stdout, g.stderr)
                    sys.exit(f"gen_fuzz failed for {m} in {entry}")
                base = dst
        findings, n = run_one(tag, fix)
        status = "OK" if not findings else "FAIL"
        print(f"== {entry} {status} — {n} queries self-consistent, "
              f"{len(findings)} findings")
        for kind, q, msg in findings:
            print(f"   {kind} {q}: {msg}")
            bad += 1
    print(f"\nnan gate: {bad} findings")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
