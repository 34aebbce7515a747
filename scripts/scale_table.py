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
    rows_out.append((q, t0, t1, ratio))

rows_out.sort(key=lambda r: -r[3])
flagged = [r for r in rows_out if r[3] > growth]
print(f"| query | sf0.1 s | sf1 s | ratio |")
print(f"|---|---|---|---|")
for q, t0, t1, ratio in rows_out:
    mark = " **<- super-linear**" if ratio > growth else ""
    print(f"| {q} | {t0:.2f} | {t1:.2f} | {ratio:.1f}x{mark} |")
tot0 = sum(r[1] for r in rows_out)
tot1 = sum(r[2] for r in rows_out)
print(f"\ntotal: sf0.1 {tot0:.1f}s -> sf1 {tot1:.1f}s "
      f"(ratio {tot1 / tot0:.2f}x at {growth:.0f}x data); "
      f"{len(flagged)} queries above the data-growth ratio")
