"""Seat-window planner: prints the driver-window seat math that the
round notes have been recomputing by hand every round.

Three views, all derived from the same code the driver runs
(`__spark_entry__._seat_order` + the committed CORRECTNESS /
QUERY_DEFS artifacts — no second implementation to drift):

1. CURRENT: the window the next driver run will check — cohorts
   (never-checked / changed-since-confirmation / pins / staleness
   cohorts by last-confirmed round), plus the unseated tail.
2. PROJECTION: assume the current window lands green this round, then
   recompute — the following round's window and the oldest cohort's
   age, checked against the max-staleness invariants.
3. WHAT-IF (``--changed q1,q2``): recompute the CURRENT window as if
   those queries' def-hashes had changed (they seat first), print who
   gets bumped, and whether any bumped row would breach the
   staleness bounds — run this BEFORE committing a def-hash-changing
   batch to budget the seats (r09 kickoff discipline).

The staleness bounds mirror tests/test_driver_window.py
(MAX_CONFIRMATION_AGE / MAX_UNSEATED_AGE — the canonical values live
there; test_seat_plan_tool_bounds_match asserts the copies agree).

Usage:
    python tools/seat_plan.py [--changed name1,name2]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_CONFIRMATION_AGE = 5  # pinned copy — tests/test_driver_window.py
MAX_UNSEATED_AGE = 4


def _cohorts(names, last, changed):
    c = Counter()
    for n in names:
        if last.get(n, 0) == 0:
            c["never-checked"] += 1
        elif n in changed:
            c["changed"] += 1
        else:
            c[f"r{last[n]:02d}"] += 1
    return dict(sorted(c.items()))


def _describe(title, window, unseated, last, changed, nxt):
    print(f"== {title} (next driver round: r{nxt:02d}, window {len(window)})")
    print("   seated:  ", _cohorts(window, last, changed))
    print("   unseated:", _cohorts(unseated, last, changed))
    breaches = {
        n: last[n]
        for n in unseated
        if last.get(n, 0) and nxt - last[n] >= MAX_UNSEATED_AGE
    }
    hard = {
        n: last[n]
        for n in window + unseated
        if last.get(n, 0) and nxt - last[n] > MAX_CONFIRMATION_AGE
    }
    for label, bad in (("UNSEATED-AT-AGE-CAP", breaches), ("PAST-HARD-CAP", hard)):
        if bad:
            print(f"   !! {label}: {bad}")
    ok = not breaches and not hard
    print(f"   staleness invariants: {'OK' if ok else 'BREACHED'}")
    return ok


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--changed",
        default="",
        help="comma-separated query names to treat as def-hash-changed",
    )
    ns = p.parse_args()

    import __spark_entry__ as entry
    from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

    last = entry._last_checked_round()
    changed = entry._changed_since_confirmation(last)
    extra = {n for n in ns.changed.split(",") if n}
    unknown = extra - set(REGISTRY)
    if unknown:
        p.error(f"--changed names not in the registry: {sorted(unknown)}")
    pinned = [n for n in entry._PINNED_KV if n in REGISTRY]
    floor = sum(1 for n in pinned if n in entry._NEVER_RELEASE)
    nxt = entry._next_round()

    def order_with(ch):
        full = entry._seat_order(list(REGISTRY), last, ch, pinned, floor)
        return full[: entry.WINDOW], full[entry.WINDOW :]

    win, rest = order_with(changed)
    ok = _describe("CURRENT window", win, rest, last, changed, nxt)

    if extra:
        win2, rest2 = order_with(changed | extra)
        print(f"\n== WHAT-IF: +{len(extra)} changed "
              f"({', '.join(sorted(extra))})")
        bumped = sorted(set(win) - set(win2))
        seated = sorted(set(win2) - set(win))
        print("   newly seated:", seated or "(already seated)")
        print("   bumped out:  ", bumped or "(none)")
        ok = _describe("WHAT-IF window", win2, rest2, last,
                       changed | extra, nxt) and ok
        win = win2  # project from the what-if state

    # Projection: the planned window lands green at r{nxt}; what does
    # the FOLLOWING round look like? (Changed-set empties: the green
    # rows re-snapshot at their new hashes.)
    last2 = dict(last)
    last2.update({n: nxt for n in win})
    full3 = entry._seat_order(list(REGISTRY), last2, set(), pinned, floor)
    win3, rest3 = full3[: entry.WINDOW], full3[entry.WINDOW :]
    print()
    ok = _describe(
        f"PROJECTION r{nxt + 1:02d} (this window green, no new edits)",
        win3, rest3, last2, set(), nxt + 1,
    ) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
