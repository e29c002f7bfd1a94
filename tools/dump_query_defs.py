"""Write QUERY_DEFS_r{NN}.json — per-query definition hashes for the
change-aware driver window (round-6; see queries/defs.py).

Usage:
    python tools/dump_query_defs.py <round-number> [<repo-root>]

Imports the query registry found at <repo-root> (default: the repo
containing this file) and writes QUERY_DEFS_r{NN}.json into the
CURRENT repo root. Passing a git-worktree path as <repo-root> lets
historical round snapshots be reconstructed from the round-boundary
commits (the code state the driver's correctness run actually saw).

The inline hash below is a pinned copy of ``queries.defs.def_hash``
for checkouts that predate that module; tests assert they agree.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import pathlib
import sys

HERE = pathlib.Path(__file__).resolve().parent.parent


def _def_hash(entry) -> str:  # pinned copy — must match queries/defs.py
    try:
        src = inspect.getsource(entry.fn)
    except (OSError, TypeError):
        src = repr(entry.fn)
    h = hashlib.sha256()
    h.update(src.encode("utf-8"))
    h.update(b"\x00")
    h.update((entry.oracle or "").encode("utf-8"))
    return h.hexdigest()[:16]


def main() -> None:
    rno = int(sys.argv[1])
    root = pathlib.Path(sys.argv[2]).resolve() if len(sys.argv) > 2 else HERE
    sys.path.insert(0, str(root))
    from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

    defs = {name: _def_hash(e) for name, e in sorted(REGISTRY.items())}
    out = HERE / f"QUERY_DEFS_r{rno:02d}.json"
    out.write_text(json.dumps(defs, indent=0, sort_keys=True) + "\n")
    print(f"{out}: {len(defs)} queries")


if __name__ == "__main__":
    main()
