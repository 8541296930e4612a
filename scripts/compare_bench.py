#!/usr/bin/env python3
"""Compare two BENCH_full.json artifacts (builder vs driver, or round
over round), with calibration-aware normalization.

Usage: python3 scripts/compare_bench.py <old.json> <new.json>

Prints: common-query totals and ratio, median per-query delta and
ratio, the additive-vs-multiplicative decomposition by cost tier (the
round-10 method: a throughput epoch shows as uniform RATIO, a fixed
per-query overhead as uniform DELTA), the top regressions, and — when
both artifacts carry cal_1t/cal_nt (round-10+) — the
calibration-normalized ratio that separates box speed from code.
"""
import json
import statistics
import sys


def main():
    old, new = (json.load(open(p)) for p in sys.argv[1:3])
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so, sn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    print(f"common queries : {len(common)} (old has {len(qo)}, new has {len(qn)})")
    print(f"totals         : old={so:.1f}s new={sn:.1f}s ratio={sn / so:.3f}")
    deltas = [qn[k] - qo[k] for k in common]
    ratios = [qn[k] / qo[k] for k in common if qo[k] > 0]
    print(f"median per-q   : delta={statistics.median(deltas):+.3f}s "
          f"ratio={statistics.median(ratios):.3f}")
    for name, lo, hi in [("small(<0.3s)", 0, 0.3), ("mid", 0.3, 1.0),
                         ("big(>=1s)", 1.0, 1e9)]:
        ks = [k for k in common if lo <= qo[k] < hi]
        if not ks:
            continue
        d = statistics.median(qn[k] - qo[k] for k in ks)
        r = statistics.median(qn[k] / qo[k] for k in ks)
        print(f"  {name:13s} n={len(ks):3d} median_delta={d:+.3f}s median_ratio={r:.2f}")
    if "cal_1t" in old and "cal_1t" in new:
        c = new["cal_1t"] / old["cal_1t"]
        print(f"calibration    : cal_1t {old['cal_1t']:.2f}->{new['cal_1t']:.2f} "
              f"(box {c:.2f}x) | cpu-normalized total ratio {(sn / so) / c:.3f}")
    elif "cal_1t" in new:
        print(f"calibration    : new cal_1t={new['cal_1t']:.2f}s cal_nt={new.get('cal_nt', 0):.2f}s "
              "(old artifact predates calibration)")
    if "rounds" in new:
        print(f"new run rounds : {new['rounds']} (drift across rounds = accumulation, "
              "flat = ambient)")
    top = sorted(((qn[k] - qo[k], k) for k in common), reverse=True)[:10]
    print("top regressions:")
    for d, k in top:
        print(f"  {k:30s} {qo[k]:6.2f} -> {qn[k]:6.2f}  ({d:+.2f})")


if __name__ == "__main__":
    main()
