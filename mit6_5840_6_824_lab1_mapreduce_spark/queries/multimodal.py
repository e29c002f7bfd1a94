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
from ._util import det_round_col, det_round_sql
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


@query(
    "multimodal_frame_sample",
    oracle=r"""
    WITH a AS (
      SELECT doc_id AS asset_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             text,
             greatest(CAST(floor(length(text) / 64.0) AS INTEGER), 1) AS n_frames
      FROM documents
    )
    SELECT asset_id, modality,
           CAST(i - 1 AS BIGINT) AS frame_idx,
           md5(substr(text, (i - 1) * 64 + 1, 64)) AS frame_digest
    FROM a, unnest(range(1, n_frames + 1)) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride frame sampling over opaque payloads (video-frame
    analog): pure JVM byte slicing via transform+explode — no Python,
    no shuffle; output rows scale with payload bytes / stride. Frames
    are emitted as digests (the payload itself never needs to leave
    the executor)."""
    from ..operators.multimodal import assets_from_documents, frame_sample

    assets = assets_from_documents(table(spark, sf_dir, "documents"))
    frames = frame_sample(assets, every_n_bytes=64)
    return frames.select(
        "asset_id",
        "modality",
        F.col("frame_idx"),
        F.md5(F.col("frame")).alias("frame_digest"),
    )


@query(
    "multimodal_feature_extract",
    oracle=r"""
    WITH audio AS (
      SELECT doc_id, 32 + doc_id % 32 AS nf FROM documents WHERE doc_id % 3 = 1
    ), smp AS (
      SELECT doc_id, nf, (doc_id * 131 + i * 7919) % 2048 - 1024 AS s
      FROM audio, unnest(range(0, nf)) AS t(i)
    ), astats AS (
      SELECT doc_id,
             CAST(44 + 2 * nf AS BIGINT) AS n_bytes,
             (CASE WHEN abs(1.0 + 2.0 + 8000.0 + nf
                   + sqrt(sum(s * s) / count(*))
                   + max(abs(s))
                   + sum(s) / CAST(count(*) AS DOUBLE)
                   + nf / 8000.0) >= 9007199254.740992 THEN (1.0 + 2.0 + 8000.0 + nf
                   + sqrt(sum(s * s) / count(*))
                   + max(abs(s))
                   + sum(s) / CAST(count(*) AS DOUBLE)
                   + nf / 8000.0) ELSE CAST(floor((1.0 + 2.0 + 8000.0 + nf
                   + sqrt(sum(s * s) / count(*))
                   + max(abs(s))
                   + sum(s) / CAST(count(*) AS DOUBLE)
                   + nf / 8000.0) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS feat_sum
      FROM smp GROUP BY doc_id, nf
    ), img AS (
      SELECT doc_id, 4 + doc_id % 8 AS w, 3 + doc_id % 5 AS h
      FROM documents WHERE doc_id % 3 = 0
    ), ipx AS (
      SELECT doc_id, w, h,
             (doc_id * 7 + k * 11) % 256 AS r,
             (doc_id * 13 + k * 17) % 256 AS g,
             (doc_id * 19 + k * 23) % 256 AS b
      FROM img, unnest(range(0, w * h)) AS t(k)
    ), istats AS (
      SELECT doc_id,
             CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
             (CASE WHEN abs(CAST(w AS DOUBLE) + h + 24 + w * h
                   + sum(r) / CAST(count(*) AS DOUBLE)
                   + sum(g) / CAST(count(*) AS DOUBLE)
                   + sum(b) / CAST(count(*) AS DOUBLE)
                   + 54 + ((3 * w + 3) // 4) * 4 * h) >= 9007199254.740992 THEN (CAST(w AS DOUBLE) + h + 24 + w * h
                   + sum(r) / CAST(count(*) AS DOUBLE)
                   + sum(g) / CAST(count(*) AS DOUBLE)
                   + sum(b) / CAST(count(*) AS DOUBLE)
                   + 54 + ((3 * w + 3) // 4) * 4 * h) ELSE CAST(floor((CAST(w AS DOUBLE) + h + 24 + w * h
                   + sum(r) / CAST(count(*) AS DOUBLE)
                   + sum(g) / CAST(count(*) AS DOUBLE)
                   + sum(b) / CAST(count(*) AS DOUBLE)
                   + 54 + ((3 * w + 3) // 4) * 4 * h) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS feat_sum
      FROM ipx GROUP BY doc_id, w, h
    ), vid AS (
      SELECT doc_id, 4 + doc_id % 6 AS w, 2 + doc_id % 4 AS h,
             2 + doc_id % 4 AS nf
      FROM documents WHERE doc_id % 3 = 2
    ), vpx AS (
      SELECT doc_id, w, h, nf,
             (doc_id * 11 + k * 29) % 256 AS r,
             (doc_id * 17 + k * 31) % 256 AS g,
             (doc_id * 23 + k * 37) % 256 AS b
      FROM vid, unnest(range(0, w * h * nf)) AS t(k)
    ), vstats AS (
      SELECT doc_id,
             CAST(224 + nf * (8 + ((3 * w + 3) // 4) * 4 * h) AS BIGINT)
               AS n_bytes,
             (CASE WHEN abs(CAST(w AS DOUBLE) + h + nf + 10
                   + sum(r) / CAST(count(*) AS DOUBLE)
                   + sum(g) / CAST(count(*) AS DOUBLE)
                   + sum(b) / CAST(count(*) AS DOUBLE)
                   + 224 + nf * (8 + ((3 * w + 3) // 4) * 4 * h)) >= 9007199254.740992 THEN (CAST(w AS DOUBLE) + h + nf + 10
                   + sum(r) / CAST(count(*) AS DOUBLE)
                   + sum(g) / CAST(count(*) AS DOUBLE)
                   + sum(b) / CAST(count(*) AS DOUBLE)
                   + 224 + nf * (8 + ((3 * w + 3) // 4) * 4 * h)) ELSE CAST(floor((CAST(w AS DOUBLE) + h + nf + 10
                   + sum(r) / CAST(count(*) AS DOUBLE)
                   + sum(g) / CAST(count(*) AS DOUBLE)
                   + sum(b) / CAST(count(*) AS DOUBLE)
                   + 224 + nf * (8 + ((3 * w + 3) // 4) * 4 * h)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END)
               AS feat_sum
      FROM vpx GROUP BY doc_id, w, h, nf
    )
    SELECT d.doc_id AS asset_id,
           CASE WHEN d.doc_id % 3 = 0 THEN 'image'
                WHEN d.doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CASE WHEN d.doc_id % 3 = 1 THEN a.n_bytes
                WHEN d.doc_id % 3 = 0 THEN i.n_bytes
                ELSE v.n_bytes END AS n_bytes,
           CASE WHEN d.doc_id % 3 = 1 THEN a.feat_sum
                WHEN d.doc_id % 3 = 0 THEN i.feat_sum
                ELSE v.feat_sum END AS feat_sum
    FROM documents d
      LEFT JOIN astats a ON d.doc_id = a.doc_id
      LEFT JOIN istats i ON d.doc_id = i.doc_id
      LEFT JOIN vstats v ON d.doc_id = v.doc_id
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end decode over ALL THREE modalities, every one REAL:
    audio rows are WAV containers, image rows uncompressed BMP,
    video rows uncompressed AVI — each built and parsed inside its
    own fused Arrow `mapInPandas` stage, fed by a single pruned id
    column, with the payload never crossing a stage boundary
    (`audio_features_df` / `image_features_df` / `video_features_df`).
    The oracle recomputes all three decode paths arithmetically in
    SQL. At scale this is the pattern: pay the Python/Arrow toll
    exactly once per modality, exactly where a real codec runs;
    everything around the decode stays in whole-stage codegen."""
    from ..operators.multimodal import (
        audio_features_df,
        image_features_df,
        video_features_df,
    )

    docs = table(spark, sf_dir, "documents")
    # det_round: the fold is a deterministic left-assoc double sum
    # matching the oracle's written-order sum; native round(double, 6)
    # is tie-divergent cross-engine (round-5 sweep).
    fold = det_round_col(
        F.aggregate("feature", F.lit(0.0), lambda acc, x: acc + x)
    ).alias("feat_sum")
    audio = audio_features_df(docs).select("asset_id", "modality", "n_bytes", fold)
    image = image_features_df(docs).select("asset_id", "modality", "n_bytes", fold)
    video = video_features_df(docs).select("asset_id", "modality", "n_bytes", fold)
    return audio.unionByName(image).unionByName(video)


@query(
    "multimodal_audio_decode",
    oracle=r"""
    WITH audio AS (
      SELECT doc_id AS asset_id, 32 + doc_id % 32 AS nf
      FROM documents WHERE doc_id % 3 = 1
    ), smp AS (
      SELECT asset_id, nf, (asset_id * 131 + i * 7919) % 2048 - 1024 AS s
      FROM audio, unnest(range(0, nf)) AS t(i)
    )
    SELECT asset_id,
           1 AS n_channels,
           2 AS sampwidth,
           8000 AS sample_rate,
           CAST(nf AS BIGINT) AS n_frames,
           (CASE WHEN abs(sqrt(sum(s * s) / count(*))) >= 9007199254.740992 THEN (sqrt(sum(s * s) / count(*))) ELSE CAST(floor((sqrt(sum(s * s) / count(*))) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS rms,
           CAST(max(abs(s)) AS DOUBLE) AS peak,
           (CASE WHEN abs(sum(s) / CAST(count(*) AS DOUBLE)) >= 9007199254.740992 THEN (sum(s) / CAST(count(*) AS DOUBLE)) ELSE CAST(floor((sum(s) / CAST(count(*) AS DOUBLE)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS mean_amp
    FROM smp GROUP BY asset_id, nf
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, no fake anywhere: audio assets are RIFF/WAV
    containers parsed by stdlib `wave` inside the mapInPandas stage
    (`decode_asset` with fake=False); the oracle regenerates the PCM
    stream arithmetically from the deterministic formula. Container
    built on one side, parsed on the other — the decode is verified
    lossless field by field (header + signal statistics).

    Reference analog: the UDF surface is the whole engine
    (/root/reference/src/mr/worker.go:32-33) — decode is the modern
    map UDF."""
    from ..operators.multimodal import audio_wav_assets, extract_features

    docs = table(spark, sf_dir, "documents")
    feats = extract_features(audio_wav_assets(docs), fake=False)  # raises if not real
    f = F.col("feature")
    return feats.select(
        "asset_id",
        f[0].cast("int").alias("n_channels"),
        f[1].cast("int").alias("sampwidth"),
        f[2].cast("int").alias("sample_rate"),
        f[3].cast("long").alias("n_frames"),
        det_round_col(f[4]).alias("rms"),
        f[5].alias("peak"),
        det_round_col(f[6]).alias("mean_amp"),
    )


@query(
    "multimodal_image_decode",
    oracle=r"""
    WITH img AS (
      SELECT doc_id AS asset_id, 4 + doc_id % 8 AS w, 3 + doc_id % 5 AS h
      FROM documents WHERE doc_id % 3 = 0
    ), px AS (
      SELECT asset_id, w, h,
             (asset_id * 7 + k * 11) % 256 AS r,
             (asset_id * 13 + k * 17) % 256 AS g,
             (asset_id * 19 + k * 23) % 256 AS b
      FROM img, unnest(range(0, w * h)) AS t(k)
    )
    SELECT asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           24 AS bpp,
           CAST(w * h AS BIGINT) AS n_pixels,
           (CASE WHEN abs(sum(r) / CAST(count(*) AS DOUBLE)) >= 9007199254.740992 THEN (sum(r) / CAST(count(*) AS DOUBLE)) ELSE CAST(floor((sum(r) / CAST(count(*) AS DOUBLE)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS mean_r,
           (CASE WHEN abs(sum(g) / CAST(count(*) AS DOUBLE)) >= 9007199254.740992 THEN (sum(g) / CAST(count(*) AS DOUBLE)) ELSE CAST(floor((sum(g) / CAST(count(*) AS DOUBLE)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS mean_g,
           (CASE WHEN abs(sum(b) / CAST(count(*) AS DOUBLE)) >= 9007199254.740992 THEN (sum(b) / CAST(count(*) AS DOUBLE)) ELSE CAST(floor((sum(b) / CAST(count(*) AS DOUBLE)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS mean_b,
           CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS file_bytes
    FROM px GROUP BY asset_id, w, h
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no fake anywhere: image assets are
    uncompressed 24-bit BMP containers built byte-for-byte (headers,
    bottom-up rows, 4-byte row padding) and parsed back by stdlib
    `struct` inside the fused Arrow `mapInPandas` stage (`decode_asset`
    with fake=False); the oracle regenerates the pixel grid
    arithmetically from the deterministic formula. Container built on
    one side, parsed on the other — dimensions, pixel count, and
    per-channel means are verified field by field, which catches any
    mistake in offset handling, row order, padding, or BGR layout.

    Reference analog: decode is the modern map UDF
    (/root/reference/src/mr/worker.go:32-33)."""
    from ..operators.multimodal import image_features_df

    feats = image_features_df(table(spark, sf_dir, "documents"))
    f = F.col("feature")
    return feats.select(
        "asset_id",
        f[0].cast("long").alias("width"),
        f[1].cast("long").alias("height"),
        f[2].cast("int").alias("bpp"),
        f[3].cast("long").alias("n_pixels"),
        det_round_col(f[4]).alias("mean_r"),
        det_round_col(f[5]).alias("mean_g"),
        det_round_col(f[6]).alias("mean_b"),
        f[7].cast("long").alias("file_bytes"),
    )


@query(
    "multimodal_resize",
    oracle=r"""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           length(text) AS orig_bytes,
           CAST(length(text) + 3 AS BIGINT) // 4 AS resized_bytes,
           md5(coalesce(array_to_string(
                 list_transform(range(1, length(text) + 1, 4),
                                i -> substr(text, CAST(i AS INTEGER), 1)), ''), ''))
             AS resized_digest
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize slot of the decode pipeline: 1-in-4 byte downsample via
    mapInPandas (Arrow batches; payloads never leave the executors),
    verified by digest against a pure-SQL restatement. A real image
    resampler drops into the same stage with the same schema."""
    from ..operators.multimodal import assets_from_documents, resize_assets

    assets = assets_from_documents(table(spark, sf_dir, "documents"))
    r = resize_assets(assets, stride=4)
    return r.select(
        "asset_id",
        "modality",
        "orig_bytes",
        F.octet_length("resized").cast("long").alias("resized_bytes"),
        F.md5("resized").alias("resized_digest"),
    )


@query(
    "multimodal_video_decode",
    oracle=r"""
    WITH vid AS (
      SELECT doc_id AS asset_id, 4 + doc_id % 6 AS w, 2 + doc_id % 4 AS h,
             2 + doc_id % 4 AS nf
      FROM documents WHERE doc_id % 3 = 2
    ), px AS (
      SELECT asset_id, w, h, nf,
             (asset_id * 11 + k * 29) % 256 AS r,
             (asset_id * 17 + k * 31) % 256 AS g,
             (asset_id * 23 + k * 37) % 256 AS b
      FROM vid, unnest(range(0, w * h * nf)) AS t(k)
    )
    SELECT asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(nf AS BIGINT) AS n_frames,
           10 AS fps,
           (CASE WHEN abs(sum(r) / CAST(count(*) AS DOUBLE)) >= 9007199254.740992 THEN (sum(r) / CAST(count(*) AS DOUBLE)) ELSE CAST(floor((sum(r) / CAST(count(*) AS DOUBLE)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS mean_r,
           (CASE WHEN abs(sum(g) / CAST(count(*) AS DOUBLE)) >= 9007199254.740992 THEN (sum(g) / CAST(count(*) AS DOUBLE)) ELSE CAST(floor((sum(g) / CAST(count(*) AS DOUBLE)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS mean_g,
           (CASE WHEN abs(sum(b) / CAST(count(*) AS DOUBLE)) >= 9007199254.740992 THEN (sum(b) / CAST(count(*) AS DOUBLE)) ELSE CAST(floor((sum(b) / CAST(count(*) AS DOUBLE)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS mean_b,
           CAST(224 + nf * (8 + ((3 * w + 3) // 4) * 4 * h) AS BIGINT)
             AS file_bytes
    FROM px GROUP BY asset_id, w, h, nf
    """,
)
def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, no fake anywhere: video assets are
    uncompressed AVI containers (RIFF hdrl/movi lists, raw 24-bit
    bottom-up DIB frames) built byte-for-byte and parsed back by
    stdlib `struct` inside the fused Arrow `mapInPandas` stage
    (`decode_asset` with fake=False, walking the movi chunk list);
    the oracle regenerates every frame's pixel grid arithmetically.
    Dimensions, frame count, fps (from dwMicroSecPerFrame), padded
    per-frame pixel means, and the exact container byte size are
    verified field by field — any mistake in chunk walking, row
    padding, frame ordering, or BGR layout breaks the hash.

    Reference analog: decode is the modern map UDF
    (/root/reference/src/mr/worker.go:32-33)."""
    from ..operators.multimodal import video_features_df

    feats = video_features_df(table(spark, sf_dir, "documents"))
    f = F.col("feature")
    return feats.select(
        "asset_id",
        f[0].cast("long").alias("width"),
        f[1].cast("long").alias("height"),
        f[2].cast("long").alias("n_frames"),
        f[3].cast("int").alias("fps"),
        det_round_col(f[4]).alias("mean_r"),
        det_round_col(f[5]).alias("mean_g"),
        det_round_col(f[6]).alias("mean_b"),
        f[7].cast("long").alias("file_bytes"),
    )


# ------------------------------------------------- r10 (promoted r11)
# The three round-10 COMPRESSED codecs — PNG (stdlib zlib), G.711
# mu-law/A-law (ITU-T formulas), MS-RLE8 (run-length) — staged under
# the hold-at-155 seat policy in r10 and promoted to @query in r11
# (r10 verdict task 1; registry 158). Each carries a fully arithmetic
# DuckDB oracle (the G.711 expansion and the RLE8 palette are
# closed-form integer arithmetic, recomputed by the oracle from the
# generation contract — the same container-built-on-one-side /
# recomputed-on-the-other proof shape as the uncompressed decode
# queries above).


@query(
    "multimodal_png_decode",
    oracle=rf"""
    WITH img AS (
      SELECT doc_id AS asset_id, 4 + doc_id % 8 AS w, 3 + doc_id % 5 AS h
      FROM documents WHERE doc_id % 3 = 0
    ), px AS (
      SELECT asset_id, w, h,
             (asset_id * 7 + k * 11) % 256 AS r,
             (asset_id * 13 + k * 17) % 256 AS g,
             (asset_id * 19 + k * 23) % 256 AS b
      FROM img, unnest(range(0, w * h)) AS t(k)
    )
    SELECT asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           24 AS bpp,
           CAST(w * h AS BIGINT) AS n_pixels,
           {det_round_sql("sum(r) / CAST(count(*) AS DOUBLE)")} AS mean_r,
           {det_round_sql("sum(g) / CAST(count(*) AS DOUBLE)")} AS mean_g,
           {det_round_sql("sum(b) / CAST(count(*) AS DOUBLE)")} AS mean_b
    FROM px GROUP BY asset_id, w, h
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED image decode (round 10), no fake anywhere:
    image assets are PNG containers — DEFLATE-compressed scanlines,
    filter types cycling all five per row — built byte-for-byte with
    correct chunk CRCs and inflated + defiltered back by stdlib
    `zlib`/`struct` inside the fused Arrow `mapInPandas` stage
    (`decode_asset` with fake=False). The oracle regenerates the
    pixel grid arithmetically from the generation contract (the SAME
    formula as `multimodal_image_decode`'s BMP — the two queries
    cross-check each other's decoders exactly); file size is
    excluded because a DEFLATE stream length has no closed form.

    Reference analog: decode is the modern map UDF
    (/root/reference/src/mr/worker.go:32-33)."""
    from ..operators.multimodal import png_features_df

    feats = png_features_df(table(spark, sf_dir, "documents"))
    f = F.col("feature")
    return feats.select(
        "asset_id",
        f[0].cast("long").alias("width"),
        f[1].cast("long").alias("height"),
        f[2].cast("int").alias("bpp"),
        f[3].cast("long").alias("n_pixels"),
        det_round_col(f[4]).alias("mean_r"),
        det_round_col(f[5]).alias("mean_g"),
        det_round_col(f[6]).alias("mean_b"),
    )


@query(
    "multimodal_g711_decode",
    oracle=rf"""
    WITH audio AS (
      SELECT doc_id AS asset_id, 32 + doc_id % 32 AS nf
      FROM documents WHERE doc_id % 3 = 1
    ), cw AS (
      SELECT asset_id, nf, (asset_id * 31 + k * 37) % 256 AS c
      FROM audio, unnest(range(0, nf)) AS t(k)
    ), smp AS (
      -- G.711 expansion in pure integer arithmetic (ITU-T): even
      -- asset ids decode as A-law, odd as mu-law — mirroring the
      -- Spark side's per-asset law choice.
      SELECT asset_id, nf,
        CASE WHEN asset_id % 2 = 1 THEN
          CASE WHEN (255 - c) >= 128
               THEN -((((255 - c) % 16) * 8 + 132) * (1 << (((255 - c) // 16) % 8)) - 132)
               ELSE ((((255 - c) % 16) * 8 + 132) * (1 << (((255 - c) // 16) % 8)) - 132) END
        ELSE
          CASE WHEN xor(c, 85) >= 128
               THEN (CASE WHEN (xor(c, 85) // 16) % 8 = 0
                          THEN (xor(c, 85) % 16) * 16 + 8
                          ELSE ((xor(c, 85) % 16) * 16 + 264) * (1 << ((xor(c, 85) // 16) % 8 - 1)) END)
               ELSE -(CASE WHEN (xor(c, 85) // 16) % 8 = 0
                           THEN (xor(c, 85) % 16) * 16 + 8
                           ELSE ((xor(c, 85) % 16) * 16 + 264) * (1 << ((xor(c, 85) // 16) % 8 - 1)) END) END
        END AS s
      FROM cw
    )
    SELECT asset_id,
           1 AS n_channels,
           1 AS sampwidth,
           8000 AS sample_rate,
           CAST(nf AS BIGINT) AS n_frames,
           {det_round_sql("sqrt(sum(s * s) / count(*))")} AS rms,
           CAST(max(abs(s)) AS DOUBLE) AS peak,
           {det_round_sql("sum(s) / CAST(count(*) AS DOUBLE)")} AS mean_amp
    FROM smp GROUP BY asset_id, nf
    """,
)
def multimodal_g711_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED audio decode (round 10), no fake anywhere:
    audio assets are G.711 WAV containers (A-law for even asset ids,
    mu-law for odd — format tags 6/7, hand-built to spec with fact
    chunk) decoded through the pure ITU-T expansion formulas inside
    the fused Arrow `mapInPandas` stage (`decode_asset` with
    fake=False). The oracle re-derives every 16-bit sample from the
    codeword stream with the SAME expansion restated as integer SQL
    arithmetic — a full second implementation of the codec, not a
    replay — then matches header fields and signal statistics.
    `sampwidth` is the STORED width (1 codeword byte per sample).

    Reference analog: decode is the modern map UDF
    (/root/reference/src/mr/worker.go:32-33)."""
    from ..operators.multimodal import g711_features_df

    feats = g711_features_df(table(spark, sf_dir, "documents"))
    f = F.col("feature")
    return feats.select(
        "asset_id",
        f[0].cast("int").alias("n_channels"),
        f[1].cast("int").alias("sampwidth"),
        f[2].cast("int").alias("sample_rate"),
        f[3].cast("long").alias("n_frames"),
        det_round_col(f[4]).alias("rms"),
        f[5].alias("peak"),
        det_round_col(f[6]).alias("mean_amp"),
    )


@query(
    "multimodal_rle8_decode",
    oracle=rf"""
    WITH vid AS (
      SELECT doc_id AS asset_id,
             4 + doc_id % 6 AS w, 2 + doc_id % 4 AS h, 2 + doc_id % 4 AS nf
      FROM documents WHERE doc_id % 3 = 2
    ), px AS (
      -- palette[rle8_index]: both closed-form; y counts from the
      -- bottom row per DIB order (symmetric over the full grid, but
      -- stated to match the generator's contract)
      SELECT asset_id, w, h, nf,
             ((asset_id * 3 + f * 5 + y * 7 + (x // 3)) % 256) AS idx
      FROM vid,
           unnest(range(0, nf)) AS tf(f),
           unnest(range(0, h)) AS ty(y),
           unnest(range(0, w)) AS tx(x)
    )
    SELECT asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(nf AS BIGINT) AS n_frames,
           10 AS fps,
           {det_round_sql("sum((idx * 7) % 256) / CAST(count(*) AS DOUBLE)")} AS mean_r,
           {det_round_sql("sum((idx * 13) % 256) / CAST(count(*) AS DOUBLE)")} AS mean_g,
           {det_round_sql("sum((idx * 19) % 256) / CAST(count(*) AS DOUBLE)")} AS mean_b
    FROM px GROUP BY asset_id, w, h, nf
    """,
)
def multimodal_rle8_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED video decode (round 10), no fake anywhere:
    video assets are MS-RLE8 AVI containers (biCompression=1, frames
    mixing encoded and absolute modes with EOL/EOB escapes, palette
    in strf) decoded by the run-length walk inside the fused Arrow
    `mapInPandas` stage (`decode_asset` with fake=False). The oracle
    recomputes every pixel's palette color from the closed-form
    index/palette contract; container byte size is excluded (the RLE
    stream length has no tidy closed form).

    Reference analog: decode is the modern map UDF
    (/root/reference/src/mr/worker.go:32-33)."""
    from ..operators.multimodal import rle8_features_df

    feats = rle8_features_df(table(spark, sf_dir, "documents"))
    f = F.col("feature")
    return feats.select(
        "asset_id",
        f[0].cast("long").alias("width"),
        f[1].cast("long").alias("height"),
        f[2].cast("long").alias("n_frames"),
        f[3].cast("int").alias("fps"),
        det_round_col(f[4]).alias("mean_r"),
        det_round_col(f[5]).alias("mean_g"),
        det_round_col(f[6]).alias("mean_b"),
    )
