"""CSV source/sink — the other interchange edge next to NDJSON
(`sources/jsonl.py`). The reference's own output format is already a
delimited text file ("key value" lines, src/mr/worker.go:120-124);
CSV is that same edge generalized to multi-column tabular drops,
which is how scraped metadata / label tables usually arrive.

Scale notes (same contract as jsonl):
- ALWAYS pass an explicit schema: inference costs a full extra pass
  and silently widens types between drops (schema drift).
- Plain .csv splits by byte range; .gz shards do not split — one
  file = one task, so shard upstream.
- `multiLine` (quoted newlines) disables splitting — avoid it at
  scale; quarantine the offending rows upstream instead.
- Malformed rows land in a `_corrupt_record` quarantine column
  (PERMISSIVE), never fail the ingest; count them, alert on a
  threshold, keep going — one bad row must not kill a 100 TB job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV → DataFrame with a DECLARED schema and corrupt-row
    quarantine (PERMISSIVE + `_corrupt_record`)."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows): clean rows drop the quarantine
    column; quarantined rows keep the FULL row — `_corrupt_record`
    holds the raw line, and the typed columns carry whatever
    PERMISSIVE could still parse (CSV keeps per-column partials: a
    bad long nulls only that column; under-/over-length rows keep
    the matching prefix — unlike the JSON edge, which nulls every
    typed column of a corrupt line; measured, round 6).
    Spark refuses predicates over ONLY the corrupt column of a raw
    CSV scan (it would require a second parse); caching the parsed
    batch first is the documented pattern (same as the jsonl edge).
    The cache is one ingest drop — bounded, not the corpus — and the
    caller unpersists it once both sides are consumed."""
    df = df.cache()
    clean = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.where(F.col("_corrupt_record").isNotNull())
    return clean, bad


def write_csv(
    df: DataFrame, path: str, header: bool = True, compress: bool = False
) -> None:
    """DataFrame → CSV directory, one shard per partition (the
    caller's partitioning is the output fan-out, exactly like the
    reference's nReduce output files)."""
    w = df.write.mode("overwrite").option("header", str(header).lower())
    if compress:
        w = w.option("compression", "gzip")
    w.csv(path)
