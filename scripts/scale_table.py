#!/usr/bin/env python3
"""Convert a graft.Soak two-dir TSV run into the per-query scaling table.

Usage: python3 scripts/scale_table.py soak.log [data_growth]
Reads `[soak]\tq\tdir\trows\tr1..\tsteady` lines, pairs each query's two
dirs (base first by command order), prints a markdown table sorted by
wall-ratio descending, and flags queries whose wall-time ratio exceeds
the data growth (default 10x) — super-linear suspects. Drill-style
queries (O(jobs) lifecycle ops) are expected to sit far BELOW the data
ratio; scan-bound queries near it.
"""
import sys
from collections import OrderedDict

path = sys.argv[1]
growth = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

runs = OrderedDict()  # q -> [(dir, rows, steady), ...]
for line in open(path):
    if not line.startswith("[soak]"):
        continue
    parts = line.rstrip("\n").split("\t")
    q, d, rows = parts[1], parts[2], parts[3]
    steady = float(parts[-1])
    runs.setdefault(q, []).append((d, rows, steady))

rows_out = []
for q, rs in runs.items():
    if len(rs) < 2:
        continue
    (d0, n0, t0), (d1, n1, t1) = rs[0], rs[1]
    ratio = t1 / t0 if t0 > 0 else float("inf")
    rratio = int(n1) / max(1, int(n0))
    rows_out.append((q, t0, t1, ratio, n0, n1, rratio))

rows_out.sort(key=lambda r: -r[3])
# a query whose OUTPUT grew at least as fast as its wall time is
# output-bound (the fixture's planted near-dup groups make pair-emitting
# answers grow ~quadratically in group size) — not a plan defect
flagged = [r for r in rows_out if r[3] > growth and r[6] < r[3]]
print(f"| query | sf0.1 s | sf1 s | wall ratio | rows ratio |")
print(f"|---|---|---|---|---|")
for q, t0, t1, ratio, n0, n1, rr in rows_out:
    mark = ""
    if ratio > growth:
        mark = (" output-bound" if rr >= ratio
                else " **<- super-linear**")
    print(f"| {q} | {t0:.2f} | {t1:.2f} | {ratio:.1f}x | {rr:.0f}x{mark} |")
tot0 = sum(r[1] for r in rows_out)
tot1 = sum(r[2] for r in rows_out)
print(f"\ntotal: sf0.1 {tot0:.1f}s -> sf1 {tot1:.1f}s "
      f"(ratio {tot1 / tot0:.2f}x at {growth:.0f}x data); "
      f"{len(flagged)} queries above the data-growth ratio")
