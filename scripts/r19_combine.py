#!/usr/bin/env python3
"""Combine the round-19 same-sitting scale runs into BENCH_r19_sf10.json.

Usage: r19_combine.py <bench_sf0.1.json> <bench_sf1.json> <bench_sf10.json>

Slopes use per-query MIN (least contamination by transient noise), the
scale_slopes.py convention: slope = (t_big/t_small)/data_ratio, 1.0 =
linear. Emits sf0.1->sf1 (10x), sf1->sf10 (10x) and sf0.1->sf10 (100x)
slopes per query, plus contention flags from each run's own calibration
series.
"""
import json
import sys


def main():
    s01 = json.load(open(sys.argv[1]))
    s1 = json.load(open(sys.argv[2]))
    s10 = json.load(open(sys.argv[3]))

    def mins(d):
        # Least-contaminated per-gate estimate: min-of-passes, further
        # floored by the post-suite retime where one exists (a co-tenant
        # burst covering a gate's ENTIRE 3-pass window inflates even its
        # min; the retime re-measures after the suite when the burst has
        # cleared, with the same warmup+median methodology).
        base = dict(d.get("queries_min") or d["queries"])
        for name, t in (d.get("queries_retimed") or {}).items():
            if name in base:
                base[name] = min(base[name], t)
        return base

    q01, q1, q10 = mins(s01), mins(s1), mins(s10)
    names = sorted(set(q01) & set(q1) & set(q10))
    slopes_01_1 = {n: round(q1[n] / q01[n] / 10, 3) for n in names}
    slopes_1_10 = {n: round(q10[n] / q1[n] / 10, 3) for n in names}
    slopes_01_10 = {n: round(q10[n] / q01[n] / 100, 4) for n in names}
    out = {
        "metric": "scale_anchor_sf0.1_sf1_sf10",
        "sf_small": "/root/testdata/sf0.1",
        "sf_mid": "target/sf1 (GenScale 10x of sf0.1, zipf 1.2 fixture)",
        "sf_big": "target/sf10 (GenScale 100x of sf0.1, zipf 1.2 fixture)",
        "note": ("Round-19 execution of the NOTES.md round-18 sf10 protocol: "
                 "the 22 lifecycle gates of BENCH_r17_sf1.json plus "
                 "q195_zipf_salted, same-sitting at all three scales, "
                 "min-of-passes, engine-only at sf1/sf10 (oracle pins at "
                 "sf0.01 via CORRECTNESS_r19.json and at sf1 via "
                 "CORRECTNESS_r19_sf1.json; in-gate pins assert inside the "
                 "engine at every scale). slope = (t_big/t_small)/ratio on "
                 "per-query MIN; 1.0 = linear, <1 sublinear."),
        "queries_sf0.1": {n: q01[n] for n in names},
        "queries_sf1": {n: q1[n] for n in names},
        "queries_sf10": {n: q10[n] for n in names},
        "slopes_sf0.1_to_sf1_ratio10": slopes_01_1,
        "slopes_sf1_to_sf10_ratio10": slopes_1_10,
        "slopes_sf0.1_to_sf10_ratio100": slopes_01_10,
        "total_sf0.1": round(sum(q01[n] for n in names), 3),
        "total_sf1": round(sum(q1[n] for n in names), 3),
        "total_sf10": round(sum(q10[n] for n in names), 3),
        "contended": {"sf0.1": s01.get("contended"),
                      "sf1": s1.get("contended"),
                      "sf10": s10.get("contended")},
        "failures": {"sf0.1": s01.get("failures"),
                     "sf1": s1.get("failures"),
                     "sf10": s10.get("failures")},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
