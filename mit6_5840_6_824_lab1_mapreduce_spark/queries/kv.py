"""KV surface (SURVEY §2.4) exposed as oracle-checked queries.

The driver ships no op-log table, so one is derived deterministically
from ``events`` (identical arithmetic on both engines):
  seq        = event_id                     (Raft commit order stand-in)
  client_id  = user_id % 50
  request_id = floor(event_id / 3)          (monotone per client; collisions
                                             within a client model clerk retries)
  op         = click/signup→Put, purchase/error→Append, view→Get
  key        = 'k' || (user_id % 20)
  value      = digits extracted from props JSON
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.kv import replay_final_state
from ..plans import table
from .registry import query

_OPS_SQL = r"""
  SELECT event_id AS seq,
         user_id % 50 AS client_id,
         CAST(floor(event_id / 3) AS BIGINT) AS request_id,
         CASE event_type
           WHEN 'click' THEN 'Put' WHEN 'signup' THEN 'Put'
           WHEN 'purchase' THEN 'Append' WHEN 'error' THEN 'Append'
           ELSE 'Get' END AS op,
         'k' || CAST(user_id % 20 AS VARCHAR) AS key,
         regexp_extract(props, '[0-9]+') AS value
  FROM events
"""


def ops_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("seq"),
        (F.col("user_id") % 50).alias("client_id"),
        F.floor(F.col("event_id") / 3).cast("long").alias("request_id"),
        F.when(F.col("event_type").isin("click", "signup"), "Put")
        .when(F.col("event_type").isin("purchase", "error"), "Append")
        .otherwise("Get")
        .alias("op"),
        F.concat(F.lit("k"), (F.col("user_id") % 20).cast("string")).alias("key"),
        F.regexp_extract("props", "[0-9]+", 0).alias("value"),
    )


def _replay_sql(ops_cte: str) -> str:
    """DuckDB restatement of replay_final_state over an ops CTE body:
    high-water dedup (server.go:128-134) → last Put per key → deduped
    Appends after it, concatenated in commit order."""
    return rf"""
    WITH ops AS ({ops_cte}),
    muts AS (
      SELECT * FROM (
        SELECT *, max(request_id) OVER (
                    PARTITION BY client_id ORDER BY seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
        FROM ops WHERE op <> 'Get'
      ) WHERE hw IS NULL OR request_id > hw
    ),
    last_put AS (
      SELECT key, max(seq) FILTER (WHERE op = 'Put') AS put_seq
      FROM muts GROUP BY key
    ),
    base AS (
      SELECT m.key, m.value AS base_value
      FROM muts m JOIN last_put lp ON m.key = lp.key AND m.seq = lp.put_seq
    ),
    appended AS (
      SELECT m.key, string_agg(m.value, '' ORDER BY m.seq) AS app
      FROM muts m JOIN last_put lp ON m.key = lp.key
      WHERE m.op = 'Append' AND (lp.put_seq IS NULL OR m.seq > lp.put_seq)
      GROUP BY m.key
    )
    SELECT lp.key AS key,
           coalesce(b.base_value, '') || coalesce(a.app, '') AS value
    FROM last_put lp
    LEFT JOIN base b ON lp.key = b.key
    LEFT JOIN appended a ON lp.key = a.key
    """


@query("kv_final_state", oracle=_replay_sql(_OPS_SQL))
def kv_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1-K5: final state after exactly-once replay of the derived op
    log. Scales as two shuffles (dedup window, per-key agg); no state
    on the driver."""
    return replay_final_state(ops_from_events(spark, sf_dir))


@query(
    "kv_get_at_seq",
    oracle=_replay_sql(
        rf"""
      SELECT * FROM ({_OPS_SQL})
      WHERE seq <= (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)
    """
    ),
)
def kv_get_at_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 linearizable read at a log position: the reference serves a
    Get at the Raft index where it commits (src/kvraft/server.go:52-81,
    176-185) — restated as replay of the op-log PREFIX seq ≤ S, here
    S = floor(max(seq)/2) computed in-plan (scalar agg broadcast; no
    driver round-trip). A single-key Get is a filter on this state;
    emitting every key's value at S keeps the query set-valued.
    Same two shuffles as kv_final_state, on half the log."""
    ops = ops_from_events(spark, sf_dir)
    thr = ops.agg(F.floor(F.max("seq") / 2).cast("long").alias("_thr"))
    prefix = (
        ops.join(F.broadcast(thr))
        .where(F.col("seq") <= F.col("_thr"))
        .drop("_thr")
    )
    return replay_final_state(prefix)


@query(
    "kv_duplicate_suppression",
    oracle=rf"""
    WITH ops AS ({_OPS_SQL}),
    marked AS (
      SELECT client_id,
             CASE WHEN max(request_id) OVER (
                    PARTITION BY client_id ORDER BY seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  >= request_id
                  THEN 1 ELSE 0 END AS suppressed
      FROM ops WHERE op <> 'Get'
    )
    SELECT client_id,
           count(*) AS n_ops,
           CAST(sum(suppressed) AS BIGINT) AS n_suppressed
    FROM marked GROUP BY client_id
    """,
)
def kv_duplicate_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 observability: per client, how many mutating ops the
    high-water rule suppresses (request_id ≤ running max over
    preceding commits — the reference's lastRequestId check,
    server.go:128-134) vs applied."""
    ops = ops_from_events(spark, sf_dir).where(F.col("op") != "Get")
    w = (
        Window.partitionBy("client_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hw = F.max("request_id").over(w)
    marked = ops.select(
        "client_id",
        F.when(hw >= F.col("request_id"), 1).otherwise(0).alias("suppressed"),
    )
    return marked.groupBy("client_id").agg(
        F.count("*").alias("n_ops"),
        F.sum("suppressed").cast("long").alias("n_suppressed"),
    )


@query(
    "kv_client_stats",
    oracle=rf"""
    WITH ops AS ({_OPS_SQL}),
    marked AS (
      SELECT *, max(request_id) OVER (
                  PARTITION BY client_id ORDER BY seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
      FROM ops WHERE op <> 'Get'
    )
    SELECT client_id,
           count(*) AS n_mutations,
           CAST(sum(CASE WHEN hw IS NOT NULL AND request_id <= hw
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
           max(request_id) AS request_high_water,
           count(DISTINCT key) AS n_keys_touched
    FROM marked GROUP BY client_id
    """,
)
def kv_client_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 observability: per client, how many mutations arrived, how
    many the exactly-once rule suppressed as duplicates, the request
    high-water mark, and key-touch fan-out — the server-side dedup
    counters an operator dashboards when diagnosing clerk retry
    storms (reference keeps exactly this state per client,
    src/kvraft/server.go:128-134; this query exposes it).

    Same single client-partitioned window as the replay path, then a
    per-client aggregate — state never leaves the executors."""
    ops = ops_from_events(spark, sf_dir)
    muts = ops.where(F.col("op") != "Get")
    w = (
        Window.partitionBy("client_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = muts.withColumn("hw", F.max("request_id").over(w))
    suppressed = (
        F.col("hw").isNotNull() & (F.col("request_id") <= F.col("hw"))
    ).cast("int")
    return marked.groupBy("client_id").agg(
        F.count("*").alias("n_mutations"),
        F.sum(suppressed).cast("long").alias("n_suppressed"),
        F.max("request_id").alias("request_high_water"),
        F.countDistinct("key").alias("n_keys_touched"),
    )
