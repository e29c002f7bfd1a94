"""Parquet table loaders for the driver's synthetic star schema.

Parquet + DataFrame reads give predicate pushdown and column pruning
for free (verify via ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# Conservative stand-in for spark.sql.files.maxPartitionBytes (128 MiB
# default): used only to ESTIMATE how many splits the scan already
# yields, so the documents repartition guard can stay pure-DataFrame
# (no .rdd handle) without shuffling a corpus whose big files would
# split into enough partitions on their own.
_SPLIT_BYTES = 128 * 1024 * 1024


def _estimated_scan_partitions(files: list[str]) -> int:
    """Lower-bound estimate of scan partitions: one per file plus one
    per additional split of a large file. Sizes are only statable for
    local paths; remote schemes fall back to the file count (still a
    valid lower bound — splitting only adds partitions)."""
    est = 0
    for f in files:
        path = f.removeprefix("file:")
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0
        est += 1 + size // _SPLIT_BYTES
    return est

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Spark versions that
        # reject nanos in the vectorized reader honor the legacy conf
        # and surface ts as a nanos long (convert: ns → µs floor, the
        # same value DuckDB sees); newer readers ignore the conf and
        # floor to a TIMESTAMP_NTZ natively. Branch on the resolved
        # type; both paths end at a plain µs TIMESTAMP (session TZ is
        # pinned UTC, so the NTZ→TIMESTAMP cast is a reinterpret).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if name == "documents":
        # The doc pipelines (shingle/gram/token explode, decode UDFs)
        # do heavy per-row expansion, but the testdata ships documents
        # as ONE small parquet file → a 1-partition scan would run
        # every explode single-threaded. Spread rows across the
        # cluster first; the text shuffle is tiny relative to the
        # expansion it parallelizes. Guarded: on a real corpus the
        # scan already has >= cluster-parallelism partitions and the
        # shuffle is skipped entirely.
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        par = spark.sparkContext.defaultParallelism
        if _estimated_scan_partitions(df.inputFiles()) < par:
            df = df.repartition(par)
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}
