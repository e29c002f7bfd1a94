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

Decode status by modality:
- **audio: REAL.** Payloads are RIFF/WAV containers; ``decode_asset``
  parses them with stdlib ``wave`` (no external codecs needed) and
  returns header fields + PCM statistics (RMS, peak, mean). The
  deterministic generator ``wav_payload`` produces the test corpus.
- image/video: the container has no codecs (PIL/av), so those
  branches raise ``NotImplementedError`` unless ``fake=True``, in
  which case a deterministic md5-derived feature vector stands in.
The Spark-side plumbing — schema, batching, UDF signatures — is real
and tested for all three.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
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


def assets_from_documents(docs: DataFrame, strict: bool = True) -> DataFrame:
    """Demo asset table: document text as an opaque utf-8 payload with
    typed metadata (stands in for image/audio bytes).

    ASCII contract: the DuckDB oracles for these pipelines
    slice/measure with char-based string functions, which equal the
    Spark side's byte semantics only for single-byte text. A
    non-ASCII document would silently desync n_bytes / frame
    boundaries / resized digests. ``strict=True`` (default) fails
    fast on the first such row; ``strict=False`` drops non-ASCII
    rows instead — the documented opt-out for callers feeding
    real-world accented text who want the pipeline to proceed on the
    representable subset. (Real binary payloads come from real binary
    columns and never pass through this text stand-in.)"""
    ascii_ok = F.octet_length(F.col("text")) == F.length(F.col("text"))
    if strict:
        content = F.when(ascii_ok, F.encode(F.col("text"), "UTF-8")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("assets_from_documents: non-ASCII text in doc_id="),
                    F.col("doc_id").cast("string"),
                    F.lit(
                        "; char-based oracles require single-byte payload "
                        "stand-ins (pass strict=False to drop such rows)"
                    ),
                )
            )
        )
    else:
        docs = docs.where(ascii_ok)
        content = F.encode(F.col("text"), "UTF-8")
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


# Deterministic WAV generation contract (shared verbatim with the SQL
# oracle, which recomputes the features arithmetically from the same
# formula — parsing the container on one side, generating it on the
# other, is what proves the decode lossless):
#   n_frames(id)  = 32 + id % 32
#   sample(id, i) = (id*131 + i*7919) % 2048 - 1024      (int16, mono)
AUDIO_RATE = 8000
AUDIO_N_BASE = 32
AUDIO_N_MOD = 32


def wav_samples(asset_id: int) -> list[int]:
    n = AUDIO_N_BASE + asset_id % AUDIO_N_MOD
    return [((asset_id * 131 + i * 7919) % 2048) - 1024 for i in range(n)]


def wav_payload(asset_id: int) -> bytes:
    """A real, deterministic RIFF/WAV container: 16-bit PCM mono at
    AUDIO_RATE, samples from the formula above. stdlib-only."""
    samples = wav_samples(asset_id)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(AUDIO_RATE)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def with_audio_payloads(assets: DataFrame) -> DataFrame:
    """Swap the text stand-in payload for a REAL WAV container on
    modality='audio' rows (image/video rows pass through untouched);
    meta is re-derived from the new bytes. Arrow-batched mapInPandas —
    payload construction happens on the executors, never the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                wav_payload(int(aid)) if m == "audio" else bytes(c)
                for aid, m, c in zip(pdf["asset_id"], pdf["modality"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content": content,
                    "meta": [
                        {"n_bytes": len(c), "digest": hashlib.md5(c).hexdigest()}
                        for c in content
                    ],
                }
            )

    return assets.mapInPandas(run, schema=ASSET_SCHEMA)


def audio_wav_assets(docs: DataFrame) -> DataFrame:
    """Audio asset table built directly from document ids (modality
    assignment ``doc_id % 3 == 1``, as in ``assets_from_documents``):
    one narrow id column enters the Arrow stage and full WAV
    containers come out, built on the executors. Use this instead of
    ``with_audio_payloads`` when the pipeline consumes only audio rows
    — the 100 TB rule it encodes: never ship payload bytes into a
    Python stage that is about to overwrite them (column pruning can't
    save you once the bytes are in the Arrow batch)."""
    ids = docs.where(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("asset_id")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [wav_payload(int(a)) for a in pdf["asset_id"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": ["audio"] * len(content),
                    "content": content,
                    "meta": [
                        {"n_bytes": len(c), "digest": hashlib.md5(c).hexdigest()}
                        for c in content
                    ],
                }
            )

    return ids.mapInPandas(run, schema=ASSET_SCHEMA)


def audio_features_df(docs: DataFrame) -> DataFrame:
    """Fused audio build→decode in ONE Arrow stage: ids in, decoded
    features out. The WAV container round-trip is still real — bytes
    are built with ``wave`` and parsed back with ``wave`` inside the
    batch — but the payload never crosses a stage boundary. Chaining
    two ``mapInPandas`` stages costs a second JVM↔Python Arrow hop per
    batch; at 100 TB that's the difference between one decode pass and
    paying the serialization toll twice for bytes that exist only as
    an intermediate."""
    ids = docs.where(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("asset_id")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [wav_payload(int(a)) for a in pdf["asset_id"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": ["audio"] * len(payloads),
                    "n_bytes": [len(c) for c in payloads],
                    "feature": [decode_asset(c, "audio") for c in payloads],
                }
            )

    return ids.mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_asset(content: bytes, modality: str, fake: bool = False) -> list[float]:
    """Decode one payload to a feature vector.

    audio: REAL decode — stdlib ``wave`` parses the RIFF container
    (channels, sample width, frame rate, frame count) and the PCM
    frames yield RMS / peak / mean. Feature layout (FEATURE_DIM=8):
    [n_channels, sampwidth, framerate, n_frames, rms, peak, mean,
    duration_sec].

    image/video: real codecs (PIL / av) are not in this container —
    those branches are intentionally unimplemented; `fake=True`
    produces a deterministic md5-derived vector with the same shape
    contract the real decoder would have."""
    if modality == "audio" and content[:4] == b"RIFF":
        with wave.open(io.BytesIO(content), "rb") as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            nf = w.getnframes()
            raw = w.readframes(nf)
        samples = struct.unpack(f"<{nf * nch}h", raw)
        n = len(samples)
        rms = math.sqrt(sum(s * s for s in samples) / n)
        peak = float(max(abs(s) for s in samples))
        mean = sum(samples) / n
        return [float(nch), float(sw), float(rate), float(nf), rms, peak, mean, nf / rate]
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
