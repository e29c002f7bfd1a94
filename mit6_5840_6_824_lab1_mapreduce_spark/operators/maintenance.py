"""Table maintenance: small-file compaction.

The operational reality of a 100 TB lake: streaming sinks and
fine-grained upserts leave thousands of small files per partition,
and scan parallelism + NameNode/listing pressure degrade long before
capacity does. Compaction rewrites a parquet directory to a target
file size, preserving content exactly.

Atomicity note (deliberate, documented): raw parquet has no
transaction log, so the swap is write-tmp → delete-old → rename-tmp
(two metadata ops on the target FS). A reader racing the swap can see
a missing directory; table formats (Iceberg/Delta/Hudi) exist to
close exactly that gap with a manifest commit. The compaction MATH —
target file count from byte size, content-preserving rewrite — is
identical there; this operator is the raw-parquet edition, same
committer guarantees as the reference's atomic output rename
(/root/reference/src/mr/worker.go:180-219) per directory.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .upsert import _table_exists

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


def table_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory —
    driver-side metadata listing only (bounded by file count)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n, total = 0, 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            n += 1
            total += f.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> tuple[int, int]:
    """Rewrite the parquet directory at `path` into
    ceil(total_bytes / target_file_bytes) files. Returns
    (files_before, files_after). Content-preserving by construction
    (same rows, schema unchanged); row order within the table is not
    part of the parquet contract and may change."""
    if not _table_exists(spark, path):
        raise FileNotFoundError(path)
    n_before, total = table_file_stats(spark, path)
    n_target = max(1, -(-total // target_file_bytes))
    if n_target >= n_before:
        return n_before, n_before  # already compact enough; no-op
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jold = jvm.org.apache.hadoop.fs.Path(path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = jold.getFileSystem(conf)
    fs.delete(jold, True)
    fs.rename(jtmp, jold)
    n_after, _ = table_file_stats(spark, path)
    return n_before, n_after
