"""Binary-file source for multimodal assets (SURVEY §7 phase 4).

``spark.read.format("binaryFile")`` is the ingestion edge for raw
image/audio/video files: one row per file with (path, modificationTime,
length, content). ``read_binary_assets`` maps that surface onto the
repo's asset schema (operators/multimodal.py) so everything downstream
— metadata pruning, mapInPandas decode, frame sampling — runs
identically whether assets came from a parquet column or a directory
of files.

Scale notes:
- binaryFile is NOT splittable (one file = one task input); decode
  parallelism therefore equals file count — fine for media corpora
  (many files), wrong for few giant archives (un-tar upstream).
- `pathGlobFilter` / `recursiveFileLookup` push file pruning into
  the listing, and the `length` metadata column arrives without
  reading payload bytes, so size-based filtering (e.g. skip > 1 GiB)
  never touches content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# modality inferred from file extension — the ingestion-time contract;
# anything unrecognized stays NULL and is routed to quarantine by the
# caller rather than guessed.
_EXT_MODALITY = {
    "wav": "audio",
    "png": "image",
    "jpg": "image",
    "jpeg": "image",
    "mp4": "video",
}


def read_binary_assets(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Directory of media files → the asset schema:
    (asset_id, modality, content, meta{n_bytes, digest}).

    asset_id is the xxhash64 of the file path — stable across runs
    and executors; payload-derived ids would force a full read before
    partition pruning could happen."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    modality = F.create_map(
        *[F.lit(x) for kv in _EXT_MODALITY.items() for x in kv]
    )[ext]
    return raw.select(
        F.xxhash64("path").alias("asset_id"),
        modality.alias("modality"),
        F.col("content"),
        F.struct(
            F.col("length").cast("long").alias("n_bytes"),
            F.md5("content").alias("digest"),
        ).alias("meta"),
    )
