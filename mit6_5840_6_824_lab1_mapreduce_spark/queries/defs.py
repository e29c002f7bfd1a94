"""Per-query definition hashes for the change-aware driver window.

The driver's CORRECTNESS artifact proves a query green **as of the
code that ran that round**. A later edit (e.g. the round-5 rounding
sweep) silently invalidates that proof, but the plain staleness
rotation in ``__spark_entry__`` would not re-seat the query until its
row aged out (round-5 verdict, task 1). The fix: snapshot a hash of
every query's definition at each round (``QUERY_DEFS_r{NN}.json``,
written by ``tools/dump_query_defs.py``); at ordering time, any query
whose current hash differs from the snapshot at its last-confirmed
round jumps the staleness queue.

The hash covers the two driver-visible inputs: the query function's
source text and its DuckDB oracle string (oracles are built at import
time, so helper-text changes that alter the emitted SQL — e.g. an
``exact_ratio_sql`` idiom change — show up here even when the call
site is untouched). A Spark-side helper change with an unchanged call
site and unchanged oracle is the one blind spot; the round-wide
pytest oracle-parity twin still covers semantics there.

STABILITY CONTRACT: this hash function must never change once
snapshots exist — changing it would mark every query "changed" and
blow the seat window. ``tools/dump_query_defs.py`` carries a pinned
inline copy for hashing historical checkouts that predate this
module; ``tests/test_driver_window.py`` asserts the two agree.
"""

from __future__ import annotations

import hashlib
import inspect

from .registry import Entry


def def_hash(entry: Entry) -> str:
    """sha256 over (fn source, oracle SQL), truncated to 16 hex chars."""
    try:
        src = inspect.getsource(entry.fn)
    except (OSError, TypeError):  # built/wrapped fn: fall back to repr
        src = repr(entry.fn)
    h = hashlib.sha256()
    h.update(src.encode("utf-8"))
    h.update(b"\x00")
    h.update((entry.oracle or "").encode("utf-8"))
    return h.hexdigest()[:16]


def current_defs() -> dict[str, str]:
    """Hash of every registered query's current definition."""
    from . import REGISTRY

    return {name: def_hash(e) for name, e in REGISTRY.items()}
