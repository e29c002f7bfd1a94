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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kv import dedup_ops, replay_final_state
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


@query(
    "kv_final_state",
    oracle=rf"""
    WITH ops AS ({_OPS_SQL}),
    muts AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY client_id, request_id
                                     ORDER BY seq) AS rn
        FROM ops WHERE op <> 'Get'
      ) WHERE rn = 1
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
    """,
)
def kv_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1-K5: final state after exactly-once replay of the derived op
    log. Scales as two shuffles (dedup window, per-key agg); no state
    on the driver."""
    return replay_final_state(ops_from_events(spark, sf_dir))


@query(
    "kv_duplicate_suppression",
    oracle=rf"""
    WITH ops AS ({_OPS_SQL})
    SELECT client_id,
           count(*) AS n_ops,
           count(*) - count(DISTINCT request_id) AS n_suppressed
    FROM ops WHERE op <> 'Get'
    GROUP BY client_id
    """,
)
def kv_duplicate_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 observability: per client, how many mutating ops were
    retries (duplicate request ids) vs applied."""
    ops = ops_from_events(spark, sf_dir).where(F.col("op") != "Get")
    return ops.groupBy("client_id").agg(
        F.count("*").alias("n_ops"),
        (F.count("*") - F.countDistinct("request_id")).alias("n_suppressed"),
    )
