"""Compare two bench JSONs (e.g. sf1 vs sf0.1) and print per-query
scale ratios, sorted worst-first.

Usage: python tools/scale_ratio_report.py BENCH_small.json BENCH_big.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    rows = []
    for name, t_big in big.items():
        t_small = small.get(name)
        if t_small and t_small > 0:
            rows.append((t_big / t_small, name, t_small, t_big))
    rows.sort(reverse=True)
    print(f"{'ratio':>7}  {'small':>8}  {'big':>8}  query")
    for r, name, ts, tb in rows:
        print(f"{r:7.1f}  {ts:8.2f}  {tb:8.2f}  {name}")
    tot_s = sum(t for _, _, t, _ in rows)
    tot_b = sum(t for _, _, _, t in rows)
    print(f"\ntotals: {tot_s:.1f}s -> {tot_b:.1f}s ({tot_b / tot_s:.1f}x) over {len(rows)} shared queries")


if __name__ == "__main__":
    main()
