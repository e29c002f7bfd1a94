"""Temporal-join, set-operation, and grouping-set queries.

As-of and range joins are the two temporal operators Spark has no
built-in for; the implementations (operators/joins.py) are pure
DataFrame compositions — one hash shuffle each, no theta-joins. The
DuckDB oracles use the engine-native formulations (ASOF JOIN, plain
inequality join), so the compare proves the scalable rewrites are
semantically lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join_backward, dedupe_latest, range_join_bucketed
from ..plans import table
from ._util import exact_ratio_spark, exact_ratio_sql
from .registry import query

_US_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _us_str(col, alias: str):
    """Microsecond-precision timestamp string (DuckDB: strftime %f)."""
    return F.date_format(col, _US_FMT).alias(alias)


@query(
    "events_asof_last_purchase",
    oracle=r"""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    pur AS (
      SELECT user_id, ts, max_by(value, event_id) AS value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT c.event_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           p.value AS purchase_value
    FROM clicks c ASOF LEFT JOIN pur p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click annotated with the user's most
    recent purchase at-or-before the click. Spark side is the
    union+window formulation (one shuffle by user_id); the oracle is
    DuckDB's native ASOF JOIN — matching results prove equivalence."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), "event_id", F.col("value").alias("p_value")
    )
    pur = dedupe_latest(pur, keys=["user_id", "p_ts"], order_desc=["event_id"]).drop(
        "event_id"
    )
    joined = asof_join_backward(
        clicks, pur, key="user_id", left_ts="ts", right_ts="p_ts",
        payload_cols=["p_ts", "p_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        _us_str(F.col("ts"), "click_ts"),
        _us_str(F.col("p_ts"), "purchase_ts"),
        F.col("p_value").alias("purchase_value"),
    )


@query(
    "events_error_click_window",
    oracle=r"""
    SELECT e.event_id, e.user_id, count(*) AS n_clicks
    FROM events e
    JOIN events c
      ON c.user_id = e.user_id
     AND c.event_type = 'click'
     AND c.ts > e.ts
     AND c.ts <= e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    """,
)
def events_error_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within 10 minutes after each error, counted
    per error. Spark side buckets time at the range width and
    equi-joins on (user_id, bucket) — never a theta-join — then
    applies the exact interval predicate."""
    ev = table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id",
        F.col("ts").alias("e_ts"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e_end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    joined = range_join_bucketed(
        clicks, errors, key="user_id", point_ts="c_ts",
        range_start="e_ts", range_end="e_end", bucket_seconds=600,
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_clicks")
    )


@query(
    "custkeys_1995_1996_not_1997",
    oracle=r"""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def custkeys_1995_1996_not_1997(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers ordering in both 1995 and 1996 but
    not 1997 — INTERSECT then EXCEPT (both distinct variants).
    Catalyst plans these as aggregate + semi/anti joins; each leg's
    year predicate pushes down to the parquet scan."""
    o = table(spark, sf_dir, "orders")
    by_year = lambda y: o.where(F.year("o_orderdate") == y).select("o_custkey")  # noqa: E731
    return by_year(1995).intersect(by_year(1996)).subtract(by_year(1997))


@query(
    "docs_cube_stats",
    oracle=r"""
    SELECT lang, source, count(*) AS n_docs,
           {avg} AS avg_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    """.replace("{avg}", exact_ratio_sql("sum(n_chars)", "count(*)", 4)),
)
def docs_cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (lang, source): all four grouping sets in one pass
    (Catalyst Expand + single aggregate — one shuffle, not four
    scans). avg derived from exact integer sum / count so the value
    hash is engine-stable."""
    d = table(spark, sf_dir, "documents")
    return d.cube("lang", "source").agg(
        F.count("*").alias("n_docs"),
        # Integer-exact half-up average (round-5 tie-class sweep).
        exact_ratio_spark("sum(n_chars)", "count(1)", 4).alias("avg_chars"),
    )


@query(
    "late_shipment_priority",
    oracle=r"""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join with a non-equi
    residual): orders from 1996 having any lineitem shipped >60 days
    after the order date, counted by priority. The date filter prunes
    the orders scan before the join (PushedFilters)."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sel = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
