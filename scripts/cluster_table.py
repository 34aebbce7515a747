#!/usr/bin/env python3
"""Compare two BENCH_DETAILS jsonl files (same catalog, same sf) — the
local[32] single-process run vs the local-cluster[4,8] multi-JVM run —
and print the per-query process-boundary tax table.

Usage: python3 scripts/cluster_table.py local32.jsonl cluster.jsonl [top]

Both runs should be 1-rep, back-to-back in one wall-clock window (this
box's throughput varies ~2x across windows). The table sorts by ratio
descending and prints the worst `top` (default 25) plus summary stats;
queries under 0.2 s in the base run are pooled (per-job fixed overhead
dominates them and their individual ratios are noise).
"""
import json
import sys

base_path, clus_path = sys.argv[1], sys.argv[2]
top = int(sys.argv[3]) if len(sys.argv) > 3 else 25


def load(p):
    out = {}
    for line in open(p):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        if "query" not in d:  # trailing total-summary line
            continue
        out[d["query"]] = float(d["sec"])
    return out


base, clus = load(base_path), load(clus_path)
common = sorted(set(base) & set(clus))
rows = [(q, base[q], clus[q], clus[q] / base[q] if base[q] > 0 else float("inf"))
        for q in common]

big = [r for r in rows if r[1] >= 0.2]
small = [r for r in rows if r[1] < 0.2]
big.sort(key=lambda r: -r[3])

print("| query | local[32] s | local-cluster s | ratio |")
print("|---|---|---|---|")
for q, b, c, r in big[:top]:
    print(f"| {q} | {b:.2f} | {c:.2f} | {r:.1f}x |")

tb, tc = sum(r[1] for r in rows), sum(r[2] for r in rows)
sb, sc = sum(r[1] for r in small), sum(r[2] for r in small)
ratios = sorted(r[3] for r in big)
med = ratios[len(ratios) // 2] if ratios else 0.0
print(f"\ntotal: local[32] {tb:.1f}s -> local-cluster {tc:.1f}s "
      f"(ratio {tc / tb:.2f}x); median per-query ratio {med:.2f}x "
      f"over {len(big)} queries >=0.2s")
print(f"pooled {len(small)} sub-0.2s queries: {sb:.1f}s -> {sc:.1f}s "
      f"(ratio {sc / max(sb, 1e-9):.2f}x)")
