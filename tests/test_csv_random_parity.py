"""Randomized referee for the CSV ingest edge (round 6), sibling of
`test_jsonl_random_parity.py`: random interleavings of clean and
broken rows classified by a pure-Python referee. Generation stays in
unambiguous territory (no quotes/commas/newlines inside values, longs
either exact ints or empty), so the referee never re-implements the
CSV dialect — a row is GOOD iff it has exactly the schema's arity and
every long field is an optional plain integer.

Covered axes beyond the fixed cases in test_csv_source.py: empty
fields (→ NULL for both long and string columns, NOT quarantine),
fully-empty rows, under- and over-length rows (quarantined), bad
integers (quarantined), and the measured PERMISSIVE partial-parse
contract — quarantined rows keep whatever still parsed (a bad long
nulls only that column; length mismatches keep the matching prefix),
which downstream quarantine triage relies on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.sources.csv import read_csv

_SCHEMA = "k long, v string, n long"

_int_field = st.one_of(
    st.just(""), st.integers(-(2**62), 2**62).map(str)
)
_str_field = st.text(
    alphabet="abcdefghijklmnop0123456789_", max_size=8
)

_good = st.tuples(_int_field, _str_field, _int_field).map(
    lambda t: ("good", ",".join(t))
)
_bad = st.one_of(
    # under-length: one separator short
    st.tuples(_int_field, _str_field).map(lambda t: ",".join(t)),
    # over-length: one field too many
    st.tuples(_int_field, _str_field, _int_field, _str_field).map(
        lambda t: ",".join(t)
    ),
    # bad integer in a long column
    st.tuples(_str_field.filter(lambda s: not _is_opt_int(s)), _str_field,
              _int_field).map(lambda t: ",".join(t)),
).map(lambda s: ("bad", s))


def _is_opt_int(s: str) -> bool:
    if s == "":
        return True
    try:
        int(s)
        return True
    except ValueError:
        return False


_rows = st.lists(st.one_of(_good, _bad), min_size=1, max_size=12)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_rows)
def test_csv_quarantine_matches_python_referee(
    spark, tmp_path_factory, rows
):
    tmp = tmp_path_factory.mktemp("randcsv")
    path = str(tmp / "part.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("k,v,n\n")
        for _, line in rows:
            f.write(line + "\n")

    got = read_csv(spark, path, _SCHEMA).collect()
    clean = [r for r in got if r["_corrupt_record"] is None]
    bad = [r for r in got if r["_corrupt_record"] is not None]

    def referee(line: str):
        parts = line.split(",")
        if len(parts) != 3:
            return None
        k, v, n = parts
        if not (_is_opt_int(k) and _is_opt_int(n)):
            return None
        return (
            int(k) if k else None,
            v if v else None,
            int(n) if n else None,
        )

    expect_clean = [referee(line) for _, line in rows]
    expect_bad = sorted(line for e, (_, line) in zip(expect_clean, rows)
                        if e is None)
    expect_clean = [e for e in expect_clean if e is not None]

    assert sorted(r["_corrupt_record"] for r in bad) == expect_bad
    assert sorted(
        ((r["k"], r["v"], r["n"]) for r in clean), key=repr
    ) == sorted(expect_clean, key=repr)


def test_csv_partial_parse_contract_on_quarantined_rows(spark, tmp_path):
    """Deterministic pin of the measured PERMISSIVE behavior the
    quarantine_split docstring promises: a bad long nulls ONLY its
    column, an under-length row keeps the parsed prefix, an
    over-length row keeps the schema-width prefix."""
    path = str(tmp_path / "pin.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("k,v,n\n")
        f.write("notint,w,50\n")
        f.write("3,y\n")
        f.write("4,z,40,extra\n")
    rows = {
        r["_corrupt_record"]: (r["k"], r["v"], r["n"])
        for r in read_csv(spark, path, _SCHEMA).collect()
    }
    assert rows == {
        "notint,w,50": (None, "w", 50),
        "3,y": (3, "y", None),
        "4,z,40,extra": (4, "z", 40),
    }
