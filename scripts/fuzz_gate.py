#!/usr/bin/env python3
"""Differential fuzz gate: adversarial fixtures × the full oracle catalog.

For each (mode, seed): generate a mutated fixture dir (gen_fuzz.py), run
graft.Verify over it (compiled classes via scripts/run.sh), then compare
every oracle-bearing query against DuckDB on the SAME fixture
(scripts/check.py). Reports three defect classes:

  CRASH    — engine query threw ([verify] <name> failed: ...)
  MISMATCH — engine and DuckDB disagree (✗ lines from check.py)
  ORACLE-CRASH — the DuckDB oracle SQL itself errored (also a finding:
             the SQL contract doesn't cover the input domain)

Usage:
  python3 scripts/fuzz_gate.py                       # default plan
  python3 scripts/fuzz_gate.py edge:1,nulls:2        # explicit runs
  python3 scripts/fuzz_gate.py edge:1 --only q_a,q_b # fast re-check
Exit 0 iff no crashes and no mismatches.
"""
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/fuzz"

DEFAULT_PLAN = ["edge:1", "edge:2", "nulls:1", "nulls:2",
                "tiny:1", "skew:1"]


def sh(cmd, **kw):
    return subprocess.run(cmd, cwd=REPO, capture_output=True,
                          text=True, **kw)


def run_one(mode, seed, only=None):
    """`mode` may be composite, e.g. 'skew+nulls': each stage's output
    dir becomes the next stage's base — nulls applied ON TOP of the
    skewed tables (interaction coverage: null-heavy hot keys hit the
    salted/banded paths differently than either mode alone)."""
    tag = mode.replace("+", "_")
    fix = f"{WORK}/{tag}_{seed}"
    outd = f"{WORK}/out_{tag}_{seed}"
    base = None  # gen_fuzz defaults to sf0.001
    stages = mode.split("+")
    for i, m in enumerate(stages):
        dst = fix if i == len(stages) - 1 else f"{fix}__stage{i}"
        cmd = ["python3", "scripts/gen_fuzz.py", str(seed), dst, m]
        if base:
            cmd.append(base)
        g = sh(cmd)
        if g.returncode != 0:
            print(g.stdout, g.stderr)
            sys.exit(f"gen_fuzz failed for {m} in {mode}:{seed}")
        base = dst
    cmd = ["scripts/run.sh", "graft.Verify", fix, outd]
    if only:
        cmd.append(only)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    v = sh(cmd, env=env)
    crashes = re.findall(r"\[verify\] (\S+) failed: (.*)", v.stderr)
    if v.returncode != 0 and not crashes:
        print(v.stderr[-4000:])
        sys.exit(f"Verify itself died for {mode}:{seed}")
    c = sh(["python3", "scripts/check.py", fix, outd])
    fails = [l for l in c.stdout.splitlines() if l.startswith("✗")]
    oracle_crash = [l for l in fails if "oracle SQL failed" in l]
    mismatch = [l for l in fails if "oracle SQL failed" not in l]
    m = re.search(r"(\d+) pass, (\d+) fail, (\d+) total", c.stdout)
    totals = m.groups() if m else ("?", "?", "?")
    return {"mode": mode, "seed": seed, "crashes": crashes,
            "mismatch": mismatch, "oracle_crash": oracle_crash,
            "totals": totals}


def main():
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    plan = argv[0].split(",") if argv else DEFAULT_PLAN
    os.makedirs(WORK, exist_ok=True)
    bad = 0
    for entry in plan:
        mode, seed = entry.split(":")
        r = run_one(mode, int(seed), only)
        p, f, t = r["totals"]
        status = ("OK" if not (r["crashes"] or r["mismatch"]
                               or r["oracle_crash"]) else "FAIL")
        print(f"== {mode}:{seed} {status} — {p} pass, {f} fail, {t} total, "
              f"{len(r['crashes'])} engine crashes")
        for name, msg in r["crashes"]:
            print(f"   CRASH {name}: {msg[:200]}")
            bad += 1
        for l in r["oracle_crash"]:
            print(f"   ORACLE-{l[:240]}")
            bad += 1
        for l in r["mismatch"]:
            print(f"   {l[:240]}")
            bad += 1
    print(f"\nfuzz gate: {bad} findings")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
