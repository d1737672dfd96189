#!/usr/bin/env python3
"""Per-query scaling slopes between two Bench subset artifacts.

Usage: scale_slopes.py <bench_small.json> <bench_big.json> <data_ratio>

Prints per-query slope = (t_big / t_small) / data_ratio — 1.0 is
perfectly linear scaling, < 1 is sublinear (fixed costs amortizing),
> 1 is superlinear (a scale smell worth a plan audit). Uses the
per-query MIN when available (least contamination by transient noise).
"""
import json
import sys


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3])
    qs = small.get("queries_min") or small["queries"]
    qb = big.get("queries_min") or big["queries"]
    rows = []
    for name in sorted(set(qs) & set(qb)):
        factor = qb[name] / qs[name]
        rows.append((factor / ratio, factor, qs[name], qb[name], name))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'small_s':>8s} {'big_s':>8s} {'factor':>7s} {'slope':>6s}")
    for slope, factor, ts, tb, name in rows:
        flag = "  <-- SUPERLINEAR" if slope > 1.3 else ""
        print(f"{name:34s} {ts:8.3f} {tb:8.3f} {factor:6.1f}x {slope:6.2f}{flag}")
    total_s = sum(qs[n] for _, _, _, _, n in rows)
    total_b = sum(qb[n] for _, _, _, _, n in rows)
    print(f"\n{'TOTAL':34s} {total_s:8.3f} {total_b:8.3f} "
          f"{total_b / total_s:6.1f}x {total_b / total_s / ratio:6.2f}")


if __name__ == "__main__":
    main()
