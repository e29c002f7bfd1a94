"""Compare two committed BENCH_FULL_r{NN}.json files per query.

Usage:
    python tools/bench_compare.py BENCH_FULL_r05.json BENCH_FULL_r06.json
    python tools/bench_compare.py <old> <new> --threshold 1.25

Prints regressions (new/old >= threshold), improvements (<= 1/threshold),
and the suite totals. Full-suite timings are ordering-sensitive — treat
a flagged query as a candidate for an isolated cold re-measure (see
SCALE.md §Cold re-measures), not as a confirmed regression.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else float(
                sys.argv[sys.argv.index(a) + 1]
            )
    old = json.load(open(args[0]))["queries"]
    new = json.load(open(args[1]))["queries"]
    both = sorted(set(old) & set(new))
    print(f"overlap {len(both)} queries; "
          f"sum {sum(old[k] for k in both):.1f}s -> "
          f"{sum(new[k] for k in both):.1f}s")
    rows = [(k, old[k], new[k], new[k] / old[k]) for k in both if old[k] > 0]
    regs = sorted((r for r in rows if r[3] >= thr), key=lambda r: -r[3])
    imps = sorted((r for r in rows if r[3] <= 1 / thr), key=lambda r: r[3])
    for title, group in (("regressions", regs), ("improvements", imps)):
        print(f"{title} (x{thr:.2f}): {len(group)}")
        for k, o, n, r in group[:20]:
            print(f"  {r:5.2f}x  {o:7.2f} -> {n:7.2f}  {k}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("dropped:", only_old)
    if only_new:
        print("added:", only_new)


if __name__ == "__main__":
    main()
