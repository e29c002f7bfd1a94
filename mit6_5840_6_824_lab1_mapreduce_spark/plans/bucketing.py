"""Ingest-time bucketing: pre-shuffle tables on their join key ONCE at
write time so every subsequent join/aggregation on that key runs with
no exchange at all.

This is the 100 TB answer to the one large fact-fact edge in the
schema (lineitem ⋈ orders on orderkey): a shuffle of 100 TB per query
is the single most expensive physical step; bucketing amortizes it to
one write. Spark reads bucketed tables with ``outputPartitioning`` =
HashPartitioning(bucket keys), and Catalyst drops the Exchange on
both sides (verified by ``tests/test_bucketing.py``).

Sizing rule: n_buckets ≈ table_bytes / target_partition_bytes
(~128-256 MB); both join sides MUST use the same n_buckets and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    n_buckets: int,
    path: str,
    sort_keys: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) parquet
    table registered as ``table_name``. Sorting within buckets lets
    sort-merge joins skip the per-task sort too."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, *keys)
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
