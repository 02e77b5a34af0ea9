#!/usr/bin/env python3
"""Render the sfA->sfB per-query bench ratio table (markdown) from two
Bench 'total_full' JSON lines. Usage:
  python3 tools/ratio_table.py <benchA.json> <benchB.json>
"""
import json
import sys


def load(p):
    for line in open(p):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("metric") == "total_full":
                return d["queries"]
    raise SystemExit(f"no total_full line in {p}")


a, b = load(sys.argv[1]), load(sys.argv[2])
rows = sorted(((q, a[q], b[q], b[q] / a[q]) for q in a if q in b and a[q] > 0),
              key=lambda r: -r[2])
print("| query | sfA s | sfB s | ratio |")
print("|---|---|---|---|")
for q, ta, tb, r in rows:
    print(f"| {q} | {ta:.2f} | {tb:.2f} | {r:.1f}× |")
print(f"\ntotals: sfA {sum(a[q] for q,_,_,_ in rows):.1f} s, "
      f"sfB {sum(tb for _,_,tb,_ in rows):.1f} s, "
      f"{len(rows)} queries")
