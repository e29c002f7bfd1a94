"""NDJSON (JSON-lines) source/sink — the interchange format the
reference's intermediate files use (SURVEY §2.1 S2/S3: mr-X-Y files
are JSON-encoded KeyValue lines, src/mr/worker.go:95-103). Inside the
engine that role belongs to Spark's shuffle; this module is the
EXTERNAL edge: corpora arriving as .jsonl[.gz] (the de-facto format
for crawled/text datasets) and results leaving the same way.

Scale notes:
- ALWAYS pass an explicit schema on read: schema inference is a full
  extra pass over 100 TB before the real scan starts.
- Plain .jsonl splits by line; .gz files do NOT split (one file = one
  task) — shard compressed corpora upstream, or recompress to a
  splittable codec. Either way the reader parallelism is file-level
  for .gz and byte-range for plain text.
- JSON parsing is ~5-10× the CPU of a parquet scan of the same data;
  the standard pipeline ingests jsonl once, writes parquet, and every
  downstream query reads parquet (`plans/tables.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines → DataFrame with a DECLARED schema (no inference
    pass). Corrupt lines land in a `_corrupt_record` quarantine column
    instead of failing the job (PERMISSIVE), so one bad crawl record
    can't kill a 100 TB ingest."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, compress: bool = False) -> None:
    """DataFrame → JSON-lines directory (one shard per partition —
    shard count is the caller's partitioning, exactly like the
    reference's nReduce output fan-out)."""
    w = df.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
