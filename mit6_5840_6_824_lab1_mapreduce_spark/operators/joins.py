"""Temporal join operators Spark lacks as built-ins: backward as-of
join and bucketed range join.

Both are expressed as compositions of existing DataFrame ops (the
preferred implementation tier — no Python in the data path):

- **as-of join**: union the two sides with a tag column and run ONE
  window pass per key (carry-forward of the latest right payload).
  Cost is a single shuffle on the join key — the same price as an
  equi-join — instead of the quadratic per-key product a naive
  ``l.ts >= r.ts`` theta-join would cost. This is the standard
  log-merge formulation used by time-series stores.
- **range join**: explode each range into fixed-width time buckets
  and equi-join points on (key, bucket), then apply the exact
  inequality. Work scales with (range length / bucket width) per
  range — constant when buckets are sized to the typical range —
  and the shuffle is hash-partitioned by (key, bucket), so skew is
  bounded by bucket population, never by the full key product.

Reference parity note: the reference engine (MIT 6.5840 lab,
`src/mr/worker.go`) has no join operators at all (SURVEY §2.5);
these belong to the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """For every left row, attach the payload of the latest right row
    with ``right.ts <= left.ts`` for the same key (null payload when
    no such row exists) — a backward as-of LEFT join.

    ``right`` must have at most one row per (key, right_ts); callers
    dedupe with an explicit tiebreaker so results are deterministic.

    Physical shape: union + one window over (key ORDER BY ts, tag)
    with right rows sorting before left rows at equal timestamps
    (so an exactly-simultaneous right row matches, as in DuckDB's
    ASOF JOIN). The payload is carried as ONE struct column with
    ``last(ignorenulls=True)`` — struct-level carry keeps fields from
    different right rows from mixing when individual payload fields
    are legitimately null.
    """
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("_p")).schema["_p"].dataType
        ).alias("_p"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("_l")).schema["_l"].dataType
        ).alias("_l"),
        F.struct(*payload_cols).alias("_p"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "_match", F.last("_p", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_tag") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_match.{p}").alias(p) for p in payload_cols],
    )
    return out


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    key: str,
    point_ts: str,
    range_start: str,
    range_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner join of point rows onto range rows of the same key with
    ``range_start < point_ts <= range_end``, via time-bucket
    equi-join (no theta-join, no per-key cross product).

    Each range row is exploded into the buckets its interval covers
    (``len/width + 1`` rows — choose ``bucket_seconds`` ≈ the typical
    range length so this stays ~2); points map to exactly one bucket,
    so no post-join dedup is needed. Output: all columns of both
    inputs (caller projects).
    """
    us = int(bucket_seconds) * 1_000_000
    p = points.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(point_ts)) / us)
    )
    r = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(range_start)) / us),
                F.floor(F.unix_micros(F.col(range_end)) / us),
            )
        ),
    )
    joined = p.join(r, on=[key, "_bucket"]).where(
        (F.col(point_ts) > F.col(range_start))
        & (F.col(point_ts) <= F.col(range_end))
    )
    return joined.drop("_bucket")


def dedupe_latest(
    df: DataFrame, keys: list[str], order_desc: list[str | Column]
) -> DataFrame:
    """One row per key group: the first under ``order_desc`` ordering
    (descending). Deterministic when the ordering is a total order."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() if isinstance(c, str) else c for c in order_desc]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
