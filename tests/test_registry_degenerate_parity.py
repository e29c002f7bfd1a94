"""Registry-wide degenerate-input regressions (round 6).

At 100 TB some partition, tenant slice, or date range is always
empty — an engine that throws or silently diverges on empty input
fails in production long before it fails on a benchmark. The
triage tool (``tools/degenerate_sweep.py``) runs EVERY registered
query against two adversarial fixtures on both engines; this module
pins what that sweep found plus the cheap per-finding regressions:

- ``sketch_join_estimate`` threw ANSI DIVIDE_BY_ZERO on an empty
  merged KMV sketch (the one unguarded raw double division);
- ``vocab_coverage_topk`` emitted 4 all-NULL rows on an empty corpus
  where the oracle emitted none ("no tokens -> no coverage marks");
- ``multimodal_resize``'s oracle digest went NULL on an empty-text
  document: DuckDB 1.0 ``array_to_string([], '')`` is NULL while
  Spark ``array_join``/``concat_ws`` give '' — a new cross-engine
  trap, pinned below;
- Spark ``rollup``/``cube`` emit ZERO rows over empty input while
  DuckDB (per the SQL standard) emits the grand-total grouping-set
  row — a real engine divergence we PIN rather than paper over with
  an extra union+aggregate in every production plan (SCALE.md
  §"Empty-input contract").

The full 143-query x 2-fixture sweep (~15 min) runs under
``SPARK_GRAFT_SWEEP=1`` — same opt-in pattern as the perf floors.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY
from tests.oracle_check import compare_query, duckdb_connect
from tools.degenerate_sweep import write_fixture


@pytest.fixture(scope="session")
def degen_empty(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("degen") / "empty"), "empty")


@pytest.fixture(scope="session")
def degen_minimal(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("degen") / "minimal"), "minimal")


@pytest.fixture(scope="session")
def degen_unicode(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("degen") / "unicode"), "unicode")


# ------------------------------------------------- per-finding regressions


def test_sketch_join_estimate_empty_sketch_no_crash(spark, degen_empty):
    """Empty merged sketch (m_merged = 0): inter_est's raw double
    division threw DIVIDE_BY_ZERO under ANSI before the nullif guard;
    the contract is NULL estimates on an empty key universe."""
    e = REGISTRY["sketch_join_estimate"]
    compare_query(spark, e.fn, e.oracle, degen_empty, "sketch_join_estimate")
    row = e.fn(spark, degen_empty).collect()[0]
    assert row.m_merged == 0
    assert row.jaccard_est is None and row.inter_est is None
    assert row.union_est == 0.0


def test_vocab_coverage_topk_empty_corpus_no_rows(spark, degen_empty):
    """Zero tokens -> zero coverage marks on BOTH engines (Spark's
    global aggregate used to emit 4 all-NULL threshold rows)."""
    e = REGISTRY["vocab_coverage_topk"]
    compare_query(spark, e.fn, e.oracle, degen_empty, "vocab_coverage_topk")
    assert e.fn(spark, degen_empty).count() == 0


def test_multimodal_resize_empty_payload_digest(spark, degen_minimal):
    """A zero-byte asset resizes to a zero-byte payload whose digest
    is md5('') — a REAL digest, not NULL (the oracle needed a
    coalesce around DuckDB's NULL array_to_string on empty lists)."""
    e = REGISTRY["multimodal_resize"]
    compare_query(spark, e.fn, e.oracle, degen_minimal, "multimodal_resize")
    rows = {r.asset_id: r for r in e.fn(spark, degen_minimal).collect()}
    empty_doc = rows[1]  # doc_id 1 has text '' in the minimal fixture
    assert empty_doc.orig_bytes == 0 and empty_doc.resized_bytes == 0
    assert empty_doc.resized_digest == "d41d8cd98f00b204e9800998ecf8427e"


def test_events_props_json_nonnumeric_prop_parity(spark, degen_unicode):
    """Spark's typed from_json nulls a non-numeric k ('{"k":"héllo"}');
    the oracle's plain CAST(json_extract(...)) THREW a DuckDB
    ConversionException (round-6 unicode sweep). The oracle now
    mirrors the typed-field contract with json_type + TRY_CAST."""
    e = REGISTRY["events_props_json"]
    compare_query(spark, e.fn, e.oracle, degen_unicode, "events_props_json")


# Adversarial props payloads for the typed-JSON-field contract: every
# coercion class Spark's PERMISSIVE from_json decides — integral in
# and out of int64, doubles, numeric strings, unicode strings, bools,
# null, missing key, wrong key, nested object, malformed JSON,
# whitespace padding. Deliberately EXCLUDED: a valid document with
# trailing content ('{"k": 5} extra') — Spark's lenient parser
# extracts from the first document while DuckDB's strict parser
# rejects the input, a pinned parity-domain restriction (see
# test_json_trailing_content_divergence_pinned).
_PROPS = st.sampled_from(
    [
        '{"k": 87}',
        '{"k": -3}',
        '{"k": 9223372036854775807}',
        '{"k": 99999999999999999999}',
        '{"k": 3.5}',
        '{"k": 3.0}',
        '{"k": "12"}',
        '{"k": "héllo"}',
        '{"k": true}',
        '{"k": null}',
        "{}",
        '{"j": 5}',
        '{"k": {"n": 1}}',
        '{"k": [1]}',
        "not json",
        "",
        '{"k": 5}   ',
        '  {"k": 5}',
    ]
)


def test_json_trailing_content_divergence_pinned(spark):
    """PINNED divergence: Spark's from_json parses the FIRST JSON
    document and tolerates trailing content ('{"k": 5} extra' -> 5,
    '{"k": 5}{"k": 6}' -> 5); DuckDB's strict parser rejects the
    whole input (TRY_CAST to JSON -> NULL), and no DuckDB function
    exposes prefix-parsing. The typed-JSON oracle parity domain is
    therefore SINGLE-document props (whitespace padding fine); an
    ingest producing concatenated/trailing-garbage JSON must be
    cleaned upstream. If either half breaks, an engine changed its
    JSON parser — re-derive the contract."""
    from pyspark.sql import functions as F2

    rows = spark.createDataFrame(
        [('{"k": 5} extra',), ('{"k": 5}{"k": 6}',)], "props string"
    ).select(F2.from_json("props", "struct<k: bigint>").getField("k").alias("k"))
    assert [r.k for r in rows.collect()] == [5, 5]  # Spark: first doc wins
    con = duckdb.connect()
    try:
        got = [
            con.sql(
                "SELECT CASE WHEN json_type(TRY_CAST(? AS JSON), '$.k')"
                " IN ('BIGINT','UBIGINT')"
                " THEN TRY_CAST(json_extract(?, '$.k') AS BIGINT) END",
                params=[p, p],
            ).fetchone()[0]
            for p in ['{"k": 5} extra', '{"k": 5}{"k": 6}']
        ]
    finally:
        con.close()
    assert got == [None, None]  # DuckDB: strict parser rejects both


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_PROPS, min_size=1, max_size=24), st.randoms())
def test_events_props_json_random_payload_parity(spark, tmp_path_factory, props, rnd):
    """Property battery for the typed-field contract: random mixes of
    every JSON coercion class through the full Spark-vs-oracle
    compare. Generalizes the 10-shape manual probe that designed the
    json_type + TRY_CAST oracle twin."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("propsjson"))
    n = len(props)
    # single-FILE parquet (pyarrow): DuckDB's read_parquet takes the
    # exact path, not the directory Spark's writer would produce
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 0, 0, i % 60) for i in range(n)],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 5 for i in range(n)], type=pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(
                [float(rnd.randint(0, 500)) / 100.0 for _ in range(n)]
            ),
            "props": pa.array(props),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    e = REGISTRY["events_props_json"]
    compare_query(spark, e.fn, e.oracle, d, "events_props_json")


def test_multimodal_strict_ascii_contract_is_loud(spark, degen_unicode):
    """assets_from_documents synthesizes byte payloads from text;
    the char-based oracles require single-byte stand-ins, so strict
    mode must raise a SELF-DESCRIBING error on non-ASCII text (not
    silently corrupt digests). The escape hatch (strict=False, drop
    such rows) is part of the documented contract."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        assets_from_documents,
    )
    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

    docs = table(spark, degen_unicode, "documents")
    # The guard lives in the payload column expression, so a plan
    # that prunes the payload never evaluates it (select(asset_id)
    # does NOT raise — column pruning removes the raise_error).
    # Consume the payload, as every registered consumer does:
    with pytest.raises(Exception, match="non-ASCII"):
        assets_from_documents(docs).select(F.octet_length("content")).collect()
    dropped = assets_from_documents(docs, strict=False)
    assert dropped.count() == 0  # every unicode-fixture doc is non-ASCII


# ------------------------------------------------------ pinned divergences


def test_duckdb_array_to_string_empty_list_is_null():
    """Cross-engine trap (round 6): DuckDB 1.0 array_to_string([], '')
    returns NULL; Spark's array_join/concat_ws return ''. Any oracle
    that md5s / concats a possibly-empty list must coalesce. If this
    test ever fails, the sandbox's DuckDB changed behavior — re-audit
    the coalesce sites (multimodal_resize) before trusting parity."""
    con = duckdb.connect()
    try:
        null_res, md5_empty = con.sql(
            "SELECT array_to_string([], ''), md5('')"
        ).fetchone()
    finally:
        con.close()
    assert null_res is None
    assert md5_empty == "d41d8cd98f00b204e9800998ecf8427e"


def test_spark_array_join_empty_list_is_empty_string(spark):
    row = spark.range(1).select(
        F.array_join(F.array().cast("array<string>"), "").alias("j")
    ).collect()[0]
    assert row.j == ""


@pytest.mark.parametrize("qname", ["sales_rollup", "docs_cube_stats"])
def test_rollup_cube_empty_input_divergence_pinned(spark, degen_empty, qname):
    """PINNED divergence: over EMPTY input, SQL-standard grouping sets
    (DuckDB) emit the grand-total row of the () grouping set
    (count 0, NULL aggregates); Spark's rollup/cube emit no rows.
    Both queries agree wherever the input is non-empty (the minimal
    fixture and every sf dir), so the driver gate is unaffected; a
    production job that needs the grand-total row on an empty slice
    unions a global aggregate (SCALE.md §"Empty-input contract").
    If either half of this pin breaks, an engine changed semantics —
    re-run tools/degenerate_sweep.py before trusting parity."""
    e = REGISTRY[qname]
    assert e.fn(spark, degen_empty).count() == 0  # Spark: no rows
    con = duckdb_connect(degen_empty)
    try:
        odf = con.sql(e.oracle).df()
    finally:
        con.close()
    assert len(odf) == 1  # DuckDB: the () grouping-set row
    assert odf["n_items" if qname == "sales_rollup" else "n_docs"].iloc[0] == 0


# -------------------------------------------------- opt-in full sweep


_SWEEP = os.environ.get("SPARK_GRAFT_SWEEP") == "1"

# Pinned-divergence allowlists live in the tool so the standalone
# sweep's exit status and these tests can never disagree.
from tools.degenerate_sweep import ALLOWLIST

EMPTY_ALLOWLIST = ALLOWLIST["empty"]


@pytest.mark.skipif(not _SWEEP, reason="full degenerate sweep: set SPARK_GRAFT_SWEEP=1")
@pytest.mark.parametrize("qname", sorted(REGISTRY))
def test_sweep_empty(spark, degen_empty, qname):
    if qname in EMPTY_ALLOWLIST:
        pytest.skip("pinned rollup/cube empty-input divergence")
    e = REGISTRY[qname]
    if e.oracle is None:
        e.fn(spark, degen_empty).count()
    else:
        compare_query(spark, e.fn, e.oracle, degen_empty, qname)


@pytest.mark.skipif(not _SWEEP, reason="full degenerate sweep: set SPARK_GRAFT_SWEEP=1")
@pytest.mark.parametrize("qname", sorted(REGISTRY))
def test_sweep_minimal(spark, degen_minimal, qname):
    e = REGISTRY[qname]
    if e.oracle is None:
        e.fn(spark, degen_minimal).count()
    else:
        compare_query(spark, e.fn, e.oracle, degen_minimal, qname)


# Queries whose unicode-input behavior is the DESIGNED strict-ASCII
# failure of the text->binary stand-in (see
# test_multimodal_strict_ascii_contract_is_loud).
UNICODE_ALLOWLIST = ALLOWLIST["unicode"]


@pytest.mark.skipif(not _SWEEP, reason="full degenerate sweep: set SPARK_GRAFT_SWEEP=1")
@pytest.mark.parametrize("qname", sorted(REGISTRY))
def test_sweep_unicode(spark, degen_unicode, qname):
    if qname in UNICODE_ALLOWLIST:
        pytest.skip("designed strict-ASCII stand-in contract")
    e = REGISTRY[qname]
    if e.oracle is None:
        e.fn(spark, degen_unicode).count()
    else:
        compare_query(spark, e.fn, e.oracle, degen_unicode, qname)


@pytest.fixture(scope="session")
def degen_nulls(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("degen") / "nulls"), "nulls")


@pytest.mark.skipif(not _SWEEP, reason="full degenerate sweep: set SPARK_GRAFT_SWEEP=1")
@pytest.mark.parametrize("qname", sorted(REGISTRY))
def test_sweep_nulls(spark, degen_nulls, qname):
    """True SQL NULLs in every nullable column (round 7): NULL
    propagation through regexp/HOF/md5 paths, NULL group and join
    keys, NULL money/timestamps, NULL embedding lists and elements.
    r08 landed the null-handling fixes (SCALE.md §Null-input
    contract), so only the class-(d) loud multimodal guards remain
    pinned; everything else must hash-match."""
    if qname in ALLOWLIST["nulls"]:
        pytest.skip("designed loud strict-guard on NULL text (class d)")
    e = REGISTRY[qname]
    if e.oracle is None:
        e.fn(spark, degen_nulls).count()
    else:
        compare_query(spark, e.fn, e.oracle, degen_nulls, qname)


@pytest.fixture(scope="session")
def degen_timewarp(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("degen") / "timewarp"), "timewarp")


@pytest.mark.skipif(not _SWEEP, reason="full degenerate sweep: set SPARK_GRAFT_SWEEP=1")
@pytest.mark.parametrize("qname", sorted(REGISTRY))
def test_sweep_timewarp(spark, degen_timewarp, qname):
    """Negative-epoch / epoch-zero / leap-day / far-future timestamps
    through every query — floor-vs-truncate bucketing and calendar
    divergences only show below epoch, which no sf fixture contains."""
    if qname in ALLOWLIST["timewarp"]:
        pytest.skip("pinned divergence (see ALLOWLIST)")
    e = REGISTRY[qname]
    if e.oracle is None:
        e.fn(spark, degen_timewarp).count()
    else:
        compare_query(spark, e.fn, e.oracle, degen_timewarp, qname)


@pytest.fixture(scope="session")
def degen_clique(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("degen") / "clique"), "clique")


@pytest.mark.skipif(not _SWEEP, reason="full degenerate sweep: set SPARK_GRAFT_SWEEP=1")
@pytest.mark.parametrize("qname", sorted(REGISTRY))
def test_sweep_clique(spark, degen_clique, qname):
    """Maximal duplication through every query: 24 byte-identical
    docs put the hot-bucket caps in their total-drop regime, the
    uncapped verify path on a 276-pair clique, CC on one component,
    and one user owning a 40-event session (hot-key skew)."""
    if qname in ALLOWLIST["clique"]:
        pytest.skip("pinned divergence (see ALLOWLIST)")
    e = REGISTRY[qname]
    if e.oracle is None:
        e.fn(spark, degen_clique).count()
    else:
        compare_query(spark, e.fn, e.oracle, degen_clique, qname)


def test_null_sort_order_engine_divergence_pinned(spark):
    """Root cause behind the round-7 nulls-fixture pin class (b):
    Spark ASC sorts NULLs FIRST, DuckDB ASC sorts NULLs LAST — any
    rank/ntile/limit keyed on a nullable expression without an
    explicit NULLS clause diverges cross-engine while being
    internally consistent on each engine. Pinned so an engine
    version change that silently aligns (or further splits) the
    defaults is noticed — the landed r08 class-(b) fix (explicit
    NULLS LAST on every nullable sort key, tie-breaks included)
    depends on this fact."""
    import duckdb

    svals = [
        r.v
        for r in spark.createDataFrame([(1,), (None,), (2,)], "v int")
        .orderBy("v")
        .collect()
    ]
    assert svals == [None, 1, 2], "Spark ASC should be NULLS FIRST"
    ovals = [
        r[0]
        for r in duckdb.sql(
            "SELECT v FROM (VALUES (1), (NULL), (2)) t(v) ORDER BY v"
        ).fetchall()
    ]
    assert ovals == [1, 2, None], "DuckDB ASC should be NULLS LAST"
    # And the documented remedy really does align them:
    svals_f = [
        r.v
        for r in spark.createDataFrame([(1,), (None,), (2,)], "v int")
        .orderBy(F.col("v").asc_nulls_last())
        .collect()
    ]
    assert svals_f == ovals
