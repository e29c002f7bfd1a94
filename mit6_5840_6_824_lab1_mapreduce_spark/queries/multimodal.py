"""Multimodal-column queries: metadata extraction over opaque binary
payloads. The Pandas-UDF decode path (operators/multimodal.py) is
covered by pytest; this oracle-checked query covers the JVM-side
plumbing — binary encode, digesting, typed metadata, deterministic
pseudo-features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import table
from .registry import query


@query(
    "multimodal_asset_meta",
    oracle=r"""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           ascii(substr(md5(text), 1, 1)) + 0 AS f0,
           ascii(substr(md5(text), 9, 1)) + 0 AS f1,
           ascii(substr(md5(text), 17, 1)) + 0 AS f2,
           ascii(substr(md5(text), 25, 1)) + 0 AS f3
    FROM documents
    """,
)
def multimodal_asset_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata + deterministic pseudo-features over binary
    payloads (documents stand in for image/audio bytes; the real
    decode slot is the mapInPandas stage in operators/multimodal.py)."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.encode(F.col("text"), "UTF-8"))
    feat = lambda pos: F.ascii(h.substr(pos, 1)).alias(f"f{(pos - 1) // 8}")  # noqa: E731
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        h.alias("digest"),
        feat(1),
        feat(9),
        feat(17),
        feat(25),
    )
