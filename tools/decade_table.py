#!/usr/bin/env python3
"""Emit a markdown decade-ratio table from two graft.Bench artifacts.

Usage: python3 tools/decade_table.py BENCH_FULL.json BENCH_SF1_FULL.json \
           [--top N] [--floor SEC]

The first artifact is the smaller scale (e.g. sf0.1), the second the
10x scale (e.g. sf1). Ratio = t_big / t_small; a perfectly linear
operator scores ~10x at a decade, so sub-10x is sub-linear-in-wall
and anything well above 10x is the superlinearity flag (the q132/qC2
class). Rows whose small-scale time is under --floor (default 0.02 s)
are noise-dominated and summarized, not listed.
"""
import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=", 1)[1] if "=" in a else True
            for a in sys.argv[1:] if a.startswith("--")}
    top = int(opts.get("--top", 25))
    floor = float(opts.get("--floor", 0.02))
    small = json.load(open(args[0]))
    big = json.load(open(args[1]))
    qs, qb = small["queries"], big["queries"]
    common = [k for k in qb if k in qs]
    rows = sorted(((qb[k] / qs[k], k) for k in common if qs[k] >= floor),
                  reverse=True)
    skipped = len(common) - len(rows)
    print(f"| query | {small.get('sf', 'small')} s | "
          f"{big.get('sf', 'big')} s | decade ratio |")
    print("|---|---|---|---|")
    for r, k in rows[:top]:
        print(f"| {k} | {qs[k]:.2f} | {qb[k]:.2f} | {r:.1f}x |")
    import statistics
    med = statistics.median(r for r, _ in rows)
    print(f"\naggregate: {sum(qs[k] for k in common):.1f} s -> "
          f"{sum(qb[k] for k in common):.1f} s "
          f"({sum(qb[k] for k in common) / sum(qs[k] for k in common):.2f}x "
          f"for 10x data); median per-query ratio {med:.2f}x over "
          f"{len(rows)} rows ({skipped} sub-{floor:g}s rows excluded); "
          f"rows >10x: {sum(1 for r, _ in rows if r > 10)}")


if __name__ == "__main__":
    main()
