"""PII scrubbing over the document corpus — the C4/RefinedWeb-style
cleaning step every web-scale training pipeline runs before anything
else: find emails / URLs / phone numbers, count them, and redact them
with typed placeholder tokens.

All pure JVM regexp expressions (detect = ``regexp_extract_all``,
redact = chained ``regexp_replace``) — one corpus scan, zero shuffles,
zero Python. The patterns use only constructs with identical semantics
in Java regex (Spark) and RE2 (DuckDB): character classes, bounded
repetition, alternation — no lookarounds.

The raw synthetic corpus contains no PII, so each pattern is
exercised by deterministically augmenting a slice of documents with a
synthetic email / URL / phone inside the query itself — identically
on both engines, which is exactly what proves detection & redaction
equivalence end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import table
from .registry import query

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[A-Za-z0-9./_-]+"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "text_pii_scrub",
    oracle=rf"""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' see https://data.example.org/doc/' || CAST(doc_id AS VARCHAR)
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END
             AS t
      FROM documents
    ), red AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(regexp_replace(t,
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{URL_RE}', '<URL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g') AS clean
      FROM aug
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{URL_RE}')) AS BIGINT) AS n_urls,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           length(clean) AS clean_chars,
           md5(clean) AS clean_digest
    FROM red
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect + redact emails, URLs, and phone numbers in one scan.
    Redaction order is fixed (email, then URL, then phone) so the
    digest of the cleaned text is comparable across engines; counts
    are measured on the pre-redaction text. At 100 TB this is a
    narrow map — no shuffle, fully whole-stage-codegen."""
    d = table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" see https://data.example.org/doc/"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    t = d.select("doc_id", aug.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
            URL_RE,
            "<URL>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(URL_RE), 0)).cast("long").alias("n_urls"),
        F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.length(clean).cast("long").alias("clean_chars"),
        F.md5(F.encode(clean, "UTF-8")).alias("clean_digest"),
    )
