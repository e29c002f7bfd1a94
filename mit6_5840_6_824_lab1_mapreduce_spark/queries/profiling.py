"""Data-engineering surface: slowly-changing-dimension history,
table profiling, and embedding quantization.

These are the warehouse-side companions to the corpus operators: the
SCD-2 build is how a 100 TB pipeline versions dimension state from an
event stream without mutating history; the column profiler is the
one-pass data-quality scan run before any training job trusts a new
drop; int8 quantization is the storage/serving compression step for
embedding tables (4x smaller than float32, exactness graded here by
an integer-exact reconstruction-error certificate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import EMB_OK_SQL, SCALE, embedding_populated, quantized
from ..plans import table
from ._util import ts_str
from .registry import query


@query(
    "scd2_user_state_history",
    oracle=r"""
    WITH m AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS seg
      FROM m
    ),
    g AS (
      SELECT user_id, seg, max(event_type) AS state,
             min(ts) AS vf, count(*) AS n_events
      FROM s GROUP BY user_id, seg
    )
    SELECT user_id, CAST(seg AS BIGINT) AS seg, state,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY seg),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(n_events AS BIGINT) AS n_events,
           lead(vf) OVER (PARTITION BY user_id ORDER BY seg) IS NULL
             AS is_current
    FROM g
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from the event log:
    each user's event_type stream collapses into state intervals with
    valid_from / valid_to / is_current — consecutive repeats merge,
    every change opens a new versioned row. The standard
    lag-marks-change → running-sum-segments → group → lead-closes-
    interval composition; fully deterministic via (ts, event_id)
    ordering.

    Scale shape: both windows and the groupBy share the ONE user_id
    shuffle; at 100 TB the dimension build is incremental (merge the
    day's changes into the open rows via the upsert operator), but
    the segment derivation per user is exactly this plan."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1)
        .otherwise(0)
        .alias("chg"),
    )
    seg = marked.withColumn(
        "seg",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    g = seg.groupBy("user_id", "seg").agg(
        F.max("event_type").alias("state"),
        F.min("ts").alias("vf"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("seg")
    nxt = F.lead("vf").over(w2)
    return g.select(
        "user_id",
        "seg",
        "state",
        ts_str("vf", "valid_from"),
        ts_str(nxt, "valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


_ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_sql_for(col: str) -> str:
    if col == "o_orderdate":
        lo = f"strftime(min({col}), '%Y-%m-%d %H:%M:%S')"
        hi = f"strftime(max({col}), '%Y-%m-%d %H:%M:%S')"
    elif col == "o_totalprice":
        lo = f"CAST(CAST(min({col}) AS DECIMAL(18,2)) AS VARCHAR)"
        hi = f"CAST(CAST(max({col}) AS DECIMAL(18,2)) AS VARCHAR)"
    else:
        lo = f"CAST(min({col}) AS VARCHAR)"
        hi = f"CAST(max({col}) AS VARCHAR)"
    return (
        f"SELECT '{col}' AS column_name, "
        f"count(*) - count({col}) AS n_nulls, "
        f"count(DISTINCT {col}) AS n_distinct, "
        f"{lo} AS min_val, {hi} AS max_val FROM orders"
    )


@query(
    "profile_orders_columns",
    oracle=" UNION ALL ".join(_profile_sql_for(c) for c in _ORDERS_COLS),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over `orders`: per column, null
    count, exact distinct count, and min/max rendered to canonical
    strings (dates formatted, money as 2dp decimal) — the
    data-quality scan a pipeline runs on every new drop before
    trusting it.

    Scale shape: ONE scan computes every per-column aggregate in a
    single groupBy-less aggregate (Spark fuses the distinct counts
    via expand), then stack() unpivots the 1-row result to the
    per-column report. No per-column re-scan, no driver loop."""
    o = table(spark, sf_dir, "orders", spread=True)
    aggs = []
    for c in _ORDERS_COLS:
        col = F.col(c)
        if c == "o_orderdate":
            lo = F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss")
            hi = F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss")
        elif c == "o_totalprice":
            lo = F.min(col).cast("decimal(18,2)").cast("string")
            hi = F.max(col).cast("decimal(18,2)").cast("string")
        else:
            lo = F.min(col).cast("string")
            hi = F.max(col).cast("string")
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"nn_{c}"),
            F.countDistinct(col).alias(f"nd_{c}"),
            lo.alias(f"lo_{c}"),
            hi.alias(f"hi_{c}"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, lo_{c}, hi_{c}" for c in _ORDERS_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_ORDERS_COLS)}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_val, max_val)"
        )
    )


@query(
    "embedding_quantize_int8",
    oracle=rf"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}, 0) AS BIGINT)) AS qv
      FROM embeddings
      WHERE {EMB_OK_SQL}
    ),
    am AS (
      SELECT label,
             max(list_max(list_transform(qv, x -> abs(x)))) AS amax_q
      FROM q GROUP BY label
    ),
    j AS (
      SELECT vec_id, q.label, qv, amax_q,
             list_transform(qv,
               x -> CAST(round(x * 127.0 / nullif(amax_q, 0)) AS BIGINT))
               AS q8
      FROM q JOIN am ON q.label = am.label
    )
    SELECT vec_id, label, amax_q,
           CAST(list_sum(q8) AS BIGINT) AS q8_sum,
           CAST(list_sum(list_transform(q8, x -> abs(x))) AS BIGINT) AS q8_l1,
           CAST(list_sum(list_transform(range(1, len(qv) + 1),
                i -> (qv[i] * 127 - q8[i] * amax_q)
                   * (qv[i] * 127 - q8[i] * amax_q))) AS BIGINT) AS q_err2
    FROM j
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding table with a
    per-label absmax scale (the standard serving-compression layout:
    one scale per group, q = round(v * 127 / absmax)). Emits exact
    integer certificates per vector — q8 checksum, L1 mass, and the
    squared reconstruction error in scaled units (qv*127 - q8*absmax
    is EXACT int64 arithmetic) — so the driver's hash-compare pins
    the full quantize/dequantize round trip, not a float
    approximation of it.

    Scale shape: rides the repo-wide int64 quantization contract
    (`operators/similarity.py`); the per-label absmax is a tiny
    aggregate broadcast back; everything else is per-row array HOFs
    in whole-stage codegen. One corpus pass + one broadcast join."""
    emb = table(spark, sf_dir, "embeddings")
    # r08 nulls contract: the shared NULL-vector drop rule (class c).
    q = emb.where(embedding_populated()).select(
        "vec_id", "label", quantized(F.col("embedding")).alias("qv")
    )
    am = q.groupBy("label").agg(
        F.max(
            F.array_max(F.transform("qv", lambda x: F.abs(x)))
        ).alias("amax_q")
    )
    # nullif on the scale (round-6 fuzz class): a label whose every
    # embedding quantizes to zero (dead vectors) has amax_q = 0, and
    # 0.0/0 THROWS under ANSI — one dead label would kill the job.
    # Quantization against a zero scale is undefined: q8/sums are
    # NULL on both engines (oracle spells nullif too).
    j = q.join(F.broadcast(am), "label").withColumn(
        "q8",
        F.transform(
            "qv",
            lambda x: F.round(
                x * 127.0
                / F.nullif(F.col("amax_q").cast("double"), F.lit(0.0)),
                0,
            ).cast("long"),
        ),
    )
    err = F.zip_with(
        "qv",
        "q8",
        lambda x, y: (x * 127 - y * F.col("amax_q"))
        * (x * 127 - y * F.col("amax_q")),
    )
    lsum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return j.select(
        "vec_id",
        "label",
        "amax_q",
        lsum(F.col("q8")).alias("q8_sum"),
        lsum(F.transform("q8", lambda x: F.abs(x))).alias("q8_l1"),
        lsum(err).alias("q_err2"),
    )
