#!/usr/bin/env python3
"""Compare two sides of an ABBA bench: per-query min across each side's
runs, ratio table, geomean, and the queries beyond a threshold.

Usage: ab_compare.py A_run1.jsonl A_run2.jsonl -- B_run1.jsonl B_run2.jsonl
(A = new/HEAD, B = old/baseline; ratio = A/B, <1 means A faster)
"""
import json, sys, math

def load(paths):
    out = {}
    for p in paths:
        for line in open(p):
            line = line.strip()
            if not line or '"query"' not in line:
                continue
            d = json.loads(line)
            q = d["query"]
            v = d["sec"]
            out[q] = min(out.get(q, float("inf")), v)
    return out

sep = sys.argv.index("--")
a = load(sys.argv[1:sep])
b = load(sys.argv[sep + 1:])
common = sorted(set(a) & set(b))
rows = [(q, a[q], b[q], a[q] / b[q] if b[q] > 0 else float("nan"))
        for q in common]
tot_a = sum(a[q] for q in common)
tot_b = sum(b[q] for q in common)
geo = math.exp(sum(math.log(r) for _, _, _, r in rows if r > 0) / len(rows))
print(f"n={len(common)} total A={tot_a:.1f}s B={tot_b:.1f}s "
      f"ratio={tot_a/tot_b:.3f} geomean={geo:.3f}")
med = sorted(r for _, _, _, r in rows)[len(rows) // 2]
print(f"median per-query ratio={med:.3f}")
print("\n-- A slower than B by >20% (possible regressions) --")
for q, va, vb, r in sorted(rows, key=lambda x: -x[3]):
    if r > 1.2 and va > 0.3:
        print(f"{q:28s} A={va:7.2f} B={vb:7.2f} ratio={r:5.2f}")
print("\n-- A faster than B by >20% (wins) --")
for q, va, vb, r in sorted(rows, key=lambda x: x[3]):
    if r < 0.8 and vb > 0.3:
        print(f"{q:28s} A={va:7.2f} B={vb:7.2f} ratio={r:5.2f}")
