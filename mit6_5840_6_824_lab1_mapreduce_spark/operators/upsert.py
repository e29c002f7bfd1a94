"""MERGE / upsert into a partitioned parquet table.

The reference's only mutation surface is the KV machine's
Put/Append (src/kvraft/KVMachine.go:15-28 — last-writer-wins upsert);
this operator is its table-scale restatement: apply a batch of
upserts to a date-partitioned fact table, rewriting ONLY the
partitions the batch touches.

100 TB posture:
- Dynamic partition overwrite (`partitionOverwriteMode=dynamic`)
  means a merge that touches 2 of 3000 day-partitions rewrites 2
  directories; everything else is untouched bytes.
- The target is re-read with an `isin(touched)` partition filter, so
  the scan prunes to the touched directories (PartitionFilters in the
  plan) — the merge cost scales with the update's footprint, not the
  table size.
- The touched-partition list is the ONLY thing collected to the
  driver; it is bounded by the update batch's partition count, never
  by row count.
- Last-writer-wins is a per-key window (update beats existing, then
  an optional ordering column breaks ties within the batch) — one
  shuffle by key over the touched slice only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _table_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check (works for file:, hdfs:, s3a: URIs)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    order_col: str | None = None,
) -> list[str]:
    """Upsert `updates` into the parquet table at `target_path`
    (partitioned by `partition_col`): rows whose `key_cols` match an
    existing row replace it; new keys are inserted. Only partitions
    present in `updates` are rewritten. Returns the touched partition
    values (driver-side list, bounded by the batch's partition
    fan-out).

    Within a single batch, `order_col` (descending) picks the winner
    among duplicate keys; across batch-vs-existing the batch wins.

    Precondition (standard for partition-scoped MERGE): a key's
    partition value is stable — an update must arrive in the
    partition the key already lives in (true by construction when
    the partition derives from the key, e.g. an event's day). An
    update that MOVES a key to a new partition would insert it there
    while the stale row survives in the old, untouched partition;
    only a full-key merge (scan all partitions) can honor moves, and
    that forfeits the touched-partitions-only scaling this operator
    exists for.
    """
    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    if not touched:
        return touched

    if not _table_exists(spark, target_path):
        # first batch of a streaming sink: nothing to merge against —
        # still dedupe within the batch, then create the table
        target_schema = updates.schema
        # JVM-pure empty relation (r13; see session.local_rows_df):
        # the createDataFrame([], schema) form cost one empty
        # Python-backed partition per core per downstream action.
        from ..session import local_rows_df

        target_slice = local_rows_df(spark, [], target_schema).withColumn(
            "_src", F.lit(0)
        )
    else:
        target_slice = (
            spark.read.parquet(target_path)
            .where(F.col(partition_col).isin(touched))
            .withColumn("_src", F.lit(0))
        )
    out_cols = [c for c in target_slice.columns if c != "_src"]
    batch = updates.withColumn("_src", F.lit(1))
    order = [F.desc("_src")] + ([F.desc(order_col)] if order_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    merged = (
        # allowMissingColumns: the batch may carry an order_col the
        # target lacks; it is used for precedence then projected away
        target_slice.unionByName(batch, allowMissingColumns=True)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*out_cols)
    )
    # Spark (correctly) refuses to overwrite a path that appears as a
    # source in the same plan; localCheckpoint materializes the merged
    # slice (bounded by the touched partitions, not the table) and
    # severs the lineage so the overwrite is legal.
    merged = merged.localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            target_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return touched
