"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched Pandas-UDF processing over ``mapInPandas``.

Design (the 100 TB shape):
- assets live as ``binary`` columns with a struct of typed metadata
  (modality, byte size, digest) — written as parquet, so scans prune
  to metadata-only unless the payload is selected;
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages (Arrow batches, no per-row Python overhead);
  partition count governs decode parallelism, and payloads never pass
  through the driver.

The container has no image/audio codecs, so the decode step is
STUBBED: ``decode_asset`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic md5-derived feature
vector stands in. The Spark-side plumbing — schema, batching, UDF
signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, modality string, content binary, "
    "meta struct<n_bytes: long, digest: string>"
)

FEATURE_SCHEMA = "asset_id long, modality string, n_bytes long, feature array<double>"

FEATURE_DIM = 8


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Demo asset table: document text as an opaque utf-8 payload with
    typed metadata (stands in for image/audio bytes).

    ASCII contract, ENFORCED: the DuckDB oracles for these pipelines
    slice/measure with char-based string functions, which equal the
    Spark side's byte semantics only for single-byte text. A
    non-ASCII document would silently desync n_bytes / frame
    boundaries / resized digests, so any row where octet_length ≠
    char length fails fast here. (Real binary payloads come from real
    binary columns and never pass through this text stand-in.)"""
    ascii_ok = F.octet_length(F.col("text")) == F.length(F.col("text"))
    content = F.when(ascii_ok, F.encode(F.col("text"), "UTF-8")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("assets_from_documents: non-ASCII text in doc_id="),
                F.col("doc_id").cast("string"),
                F.lit("; char-based oracles require single-byte payload stand-ins"),
            )
        )
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        content.alias("content"),
        F.struct(
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
            F.md5(content).alias("digest"),
        ).alias("meta"),
    )


def decode_asset(content: bytes, modality: str, fake: bool = False) -> list[float]:
    """Decode one payload to a feature vector.

    Real codecs (PIL / torchaudio / av) are not in this container —
    the real branch is intentionally unimplemented; `fake=True`
    produces a deterministic md5-derived vector with the same shape
    contract the real decoder would have."""
    if not fake:
        raise NotImplementedError(
            f"no codec available for modality={modality!r}; "
            "install decoders or pass fake=True"
        )
    digest = hashlib.md5(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, schema-stable.
    Batch shape: iterator of pandas DataFrames with the asset schema;
    output rows carry the decoded feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "feature": [
                        decode_asset(bytes(c), m, fake=fake)
                        for c, m in zip(pdf["content"], pdf["modality"])
                    ],
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over opaque payloads: slice the byte stream at
    a fixed stride (the video-frame analog; real frame extraction
    plugs into the same mapInPandas slot). Pure JVM byte slicing."""
    return assets.select(
        "asset_id",
        "modality",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        (F.octet_length("content") / every_n_bytes).cast("int"),
                        F.lit(1),
                    ),
                ),
                lambda i: F.struct(
                    (i - 1).cast("long").alias("frame_idx"),
                    F.substring(
                        F.col("content"), (i - 1) * every_n_bytes + 1, every_n_bytes
                    ).alias("frame"),
                ),
            )
        ).alias("f"),
    ).select("asset_id", "modality", "f.frame_idx", "f.frame")


def resize_assets(assets: DataFrame, stride: int = 4) -> DataFrame:
    """'Resize' over opaque payloads: deterministic 1-in-`stride` byte
    downsample (the image-resize analog; a real resampler plugs into
    this same mapInPandas slot). Output keeps the asset key, original
    size, and the resized payload."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [bytes(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "orig_bytes": [len(c) for c in content],
                    "resized": [c[::stride] for c in content],
                }
            )

    return assets.mapInPandas(
        run, schema="asset_id long, modality string, orig_bytes long, resized binary"
    )
