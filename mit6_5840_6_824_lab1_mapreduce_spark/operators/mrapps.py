"""The reference's application workload (SURVEY §2.3) as (map, reduce)
UDF pairs for the parity engine, plus the registry that stands in for
the reference's .so plugin loader (S6, reference src/main/mrworker.go:32-49).

Data semantics only — the crash/timing side effects of the probe apps
(A3/A4/A6/A7) are engine invariants covered by the Spark scheduler and
asserted in tests, not reproduced as UDF side effects.
"""

from __future__ import annotations

from ..functions.tokenize import tokenize_py

# --- A1 wc (reference src/mrapps/wc.go:19-40) ---------------------------


def wc_map(filename: str, contents: str) -> list[tuple[str, str]]:
    return [(w, "1") for w in tokenize_py(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


# --- A2 indexer (reference src/mrapps/indexer.go:20-39) -----------------


def indexer_map(filename: str, contents: str) -> list[tuple[str, str]]:
    return [(w, filename) for w in set(tokenize_py(contents))]


def indexer_reduce(key: str, values: list[str]) -> str:
    docs = sorted(values)
    return f"{len(docs)} {','.join(docs)}"


# --- A4/A5 crash/nocrash data semantics (src/mrapps/nocrash.go:26-47) ---


def file_meta_map(filename: str, contents: str) -> list[tuple[str, str]]:
    return [
        ("a", filename),
        ("b", str(len(filename))),
        ("c", str(len(contents))),
        ("d", "xyzzy"),
    ]


def sorted_join_reduce(key: str, values: list[str]) -> str:
    return " ".join(sorted(values))


# --- A8 early_exit data semantics (src/mrapps/early_exit.go:19-36) ------


def early_exit_map(filename: str, contents: str) -> list[tuple[str, str]]:
    return [(filename, "1")]


def count_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


# --- S6: app registry (plugin-loader analog) ----------------------------

APPS: dict[str, tuple] = {
    "wc": (wc_map, wc_reduce),
    "indexer": (indexer_map, indexer_reduce),
    "nocrash": (file_meta_map, sorted_join_reduce),
    "crash": (file_meta_map, sorted_join_reduce),
    "early_exit": (early_exit_map, count_reduce),
}
