"""Windowed streaming aggregation over the events stream — the
incremental twin of queries/events.events_hourly_agg, with a watermark
bounding state for late data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream the events table (parquet TIMESTAMP(NANOS)).

    Streaming sources need a declared schema, but how the reader
    surfaces a nanos timestamp differs by Spark version (nanos-as-long
    under the legacy conf vs a natively µs-floored TIMESTAMP_NTZ), so
    probe the batch-resolved type once and declare the matching stream
    schema; both paths emit identical µs `timestamp` values (session
    TZ is pinned UTC)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = spark.read.parquet(sf_dir).schema["ts"].dataType
    ts_decl = "long" if isinstance(probed, LongType) else probed.simpleString()
    schema = (
        f"event_id long, ts {ts_decl}, user_id long, event_type string, "
        "value double, props string"
    )
    raw = spark.readStream.schema(schema).parquet(f"{sf_dir}")
    if isinstance(probed, LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_event_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with a watermark: state
    for a window is dropped once the watermark passes — bounded memory
    at any scale. Append mode emits each window exactly once."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def user_session_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (30-min inactivity gap) — the
    streaming twin of the batch sessionization query. Spark merges
    overlapping per-event windows into sessions incrementally; the
    watermark closes sessions once no on-time event can extend them,
    so state stays bounded regardless of stream length."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )
