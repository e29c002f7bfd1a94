"""Randomized referee for the NDJSON ingest edge (round 6): the
corrupt-row quarantine is the property that keeps one bad crawl
record from killing a 100 TB ingest, and the fixed cases in
test_jsonl_source.py only pin two hand-written lines. Here random
interleavings of well-formed and broken lines are classified by an
exact pure-Python referee: a line is GOOD iff `json.loads` accepts it
AND yields an object — generation is restricted to unambiguous
territory (fields either exactly schema-typed or absent), so the
referee never has to re-implement Spark's type-coercion rules.

Covered axes the fixed cases don't reach: unicode text with quotes /
backslashes / newline escapes round-tripped through JSON escaping,
explicit nulls vs absent fields (both must surface as NULL, not
quarantine), unknown extra fields (ignored, not quarantine),
valid-JSON-but-not-an-object lines (scalars, arrays — quarantined),
truncated/garbage syntax, and files that are all-good, all-bad, and
interleaved."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
)

_text = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=0x1F64F, exclude_categories=["Cs"]
    ),
    max_size=20,
)

# A good line: schema-typed fields, each independently present,
# absent, or explicit null; plus an optional unknown extra field.
_good = st.fixed_dictionaries(
    {},
    optional={
        "doc_id": st.one_of(st.none(), st.integers(-(2**62), 2**62)),
        "text": st.one_of(st.none(), _text),
        "lang": st.one_of(st.none(), st.sampled_from(["en", "de", "zz"])),
        "source": st.one_of(st.none(), _text),
        "n_chars": st.one_of(st.none(), st.integers(0, 2**40)),
        "unknown_extra": st.integers(0, 9),
    },
).map(lambda d: ("good", json.dumps(d, ensure_ascii=False)))

# Bad lines: broken syntax, or valid JSON that is not an object.
_bad = st.one_of(
    st.sampled_from(
        [
            '{"doc_id": 1, "text": "unterminated',
            '{"doc_id": }',
            "not json at all",
            '{"a": 1,}',
            "[1, 2, 3]",
            '"just a string"',
            "42",
            "true",
            # NOT here: '{"doc_id": 1} trailing garbage' — Spark's
            # Jackson parser stops at the first complete value and
            # ACCEPTS the line (json.loads rejects it); that
            # engine-specific leniency is outside the referee's
            # unambiguous territory by design.
        ]
    ),
    _text.filter(lambda s: s.strip() and not _is_object_line(s)),
).map(lambda s: ("bad", s.replace("\n", " ").replace("\r", " ")))


def _is_object_line(s: str) -> bool:
    try:
        return isinstance(json.loads(s), dict)
    except (ValueError, RecursionError):
        return False


_lines = st.lists(st.one_of(_good, _bad), min_size=1, max_size=12)


def test_non_object_lines_quarantine_one_row_each(spark, tmp_path):
    """Deterministic pin for the shapes Hypothesis only samples: every
    non-object line — INCLUDING a top-level array, which Spark's JSON
    source can explode into one row per element for matching schemas —
    must surface as exactly ONE quarantined row carrying the raw
    line, never as multiple rows or a job failure."""
    bad = [
        '{"doc_id": 1, "text": "unterminated',
        '{"doc_id": }',
        "not json at all",
        '{"a": 1,}',
        "[1, 2, 3]",
        '"just a string"',
        "42",
        "true",
    ]
    good = '{"doc_id": 7, "text": "ok", "lang": "en"}'
    path = str(tmp_path / "pin.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(bad + [good]) + "\n")
    rows = read_jsonl(spark, path, DOCUMENTS_SCHEMA).collect()
    quarantined = sorted(
        r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None
    )
    assert quarantined == sorted(bad)
    kept = [r for r in rows if r["_corrupt_record"] is None]
    assert len(kept) == 1 and kept[0]["doc_id"] == 7


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_lines)
def test_quarantine_matches_python_referee(spark, tmp_path_factory, lines):
    tmp = tmp_path_factory.mktemp("randjsonl")
    path = str(tmp / "part.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        for _, line in lines:
            f.write(line + "\n")

    rows = read_jsonl(spark, path, DOCUMENTS_SCHEMA).collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]

    expect_good = [
        json.loads(line) for tag, line in lines if _is_object_line(line)
    ]
    expect_bad = sorted(
        line for tag, line in lines if not _is_object_line(line)
    )

    # Quarantined rows carry the raw line verbatim, parsed columns null
    assert sorted(r["_corrupt_record"] for r in bad) == expect_bad
    for r in bad:
        assert all(
            r[c] is None for c in r.asDict() if c != "_corrupt_record"
        )

    # Good rows: every schema column equals the referee's value (absent
    # and explicit-null both read back as None); multiset compare since
    # the reader does not promise line order across splits.
    def key(d):
        return tuple(
            (d.get(c) if d.get(c) is not None else None)
            for c in ("doc_id", "text", "lang", "source", "n_chars")
        )

    assert sorted(map(key, expect_good), key=repr) == sorted(
        (key(r.asDict()) for r in good), key=repr
    )
