"""SURVEY §2.3 app workload restated as DataFrame queries over the
driver's ``documents`` table (doc_id stands in for the filename).

These are the oracle-checked correctness surface for the MapReduce
parity engine's data semantics; the RDD engine itself is differential-
tested against its sequential oracle in tests/ (SURVEY §5.1 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import LETTER_SPLIT_RE
from ..plans import table
from .registry import query

def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc"),
        F.explode(F.split(F.col("text"), LETTER_SPLIT_RE)).alias("word"),
    ).where(F.col("word") != "")


@query(
    "wc_wordcount",
    oracle=r"""
    SELECT word, count(*) AS cnt
    FROM (
      SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
      FROM documents
    ) t
    WHERE word <> ''
    GROUP BY word
    """,
)
def wc_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 word count (reference src/mrapps/wc.go:19-40): split on
    non-letters, count per token, case-sensitive.

    Plan shape at scale: partial_count → shuffle by word → final_count
    (map-side combine; shuffle volume ∝ distinct words)."""
    return _words(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


@query(
    "indexer_inverted_index",
    oracle=r"""
    WITH toks AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc,
             unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
      FROM documents
    ),
    pairs AS (SELECT DISTINCT doc, word FROM toks WHERE word <> '')
    SELECT word,
           count(*) AS n_docs,
           string_agg(doc, ',' ORDER BY doc) AS docs_csv
    FROM pairs
    GROUP BY word
    """,
)
def indexer_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 inverted index (reference src/mrapps/indexer.go:20-39):
    per-document word dedup, then word → (count, sorted comma-joined
    doc list)."""
    pairs = _words(spark, sf_dir).distinct()
    return (
        pairs.groupBy("word")
        .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
        .select(
            "word",
            F.size("docs").cast("long").alias("n_docs"),
            F.array_join("docs", ",").alias("docs_csv"),
        )
    )


@query(
    "file_meta",
    oracle=r"""
    WITH kv AS (
      SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
      UNION ALL
      SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'd', 'xyzzy' FROM documents
    )
    SELECT key, string_agg(value, ' ' ORDER BY value) AS out
    FROM kv
    GROUP BY key
    """,
)
def file_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 crash/nocrash data semantics (reference
    src/mrapps/nocrash.go:26-47): four fixed keys per file
    (a→name, b→len(name), c→len(contents), d→'xyzzy'); reduce =
    space-join of lexicographically sorted values."""
    docs = table(spark, sf_dir, "documents")
    kv = docs.select(
        F.expr(
            "stack(4,"
            " 'a', cast(doc_id as string),"
            " 'b', cast(length(cast(doc_id as string)) as string),"
            " 'c', cast(length(text) as string),"
            " 'd', 'xyzzy') as (key, value)"
        )
    )
    return kv.groupBy("key").agg(
        F.array_join(F.sort_array(F.collect_list("value")), " ").alias("out")
    )
