"""Tests for the multimodal binary-column plumbing: schema, Arrow
batch shape, stubbed decode contract, frame sampling."""

from __future__ import annotations

import pytest

from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
    FEATURE_DIM,
    assets_from_documents,
    decode_asset,
    extract_features,
    frame_sample,
)
from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def assets(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(30)
    return assets_from_documents(docs).cache()


def test_asset_schema_and_metadata(assets):
    row = assets.first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["content"])
    assert len(row["meta"]["digest"]) == 32
    assert assets.select("modality").distinct().count() == 3


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_asset(b"bytes", "image", fake=False)
    f = decode_asset(b"bytes", "image", fake=True)
    assert len(f) == FEATURE_DIM
    assert f == decode_asset(b"bytes", "audio", fake=True)  # deterministic


def test_extract_features_mapinpandas(assets, spark):
    feats = extract_features(assets, fake=True)
    rows = feats.collect()
    assert len(rows) == assets.count()
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # determinism across runs
    again = {r["asset_id"]: r["feature"] for r in extract_features(assets, fake=True).collect()}
    for r in rows:
        assert again[r["asset_id"]] == r["feature"]


def test_frame_sample_covers_payload(assets):
    frames = frame_sample(assets, every_n_bytes=64)
    g = frames.groupBy("asset_id").count()
    n = dict((r["asset_id"], r["count"]) for r in g.collect())
    for row in assets.select("asset_id", "meta.n_bytes").collect():
        expected = max(row["n_bytes"] // 64, 1)
        assert n[row["asset_id"]] == expected


def test_wav_payload_real_decode_roundtrip():
    """Audio decode is REAL: a generated RIFF/WAV container parsed by
    stdlib `wave` must hand back exactly the header fields and PCM
    statistics implied by the generation formula — no fake flag."""
    import math

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        AUDIO_RATE,
        wav_payload,
        wav_samples,
    )

    for asset_id in (1, 4, 31, 97, 1000):
        payload = wav_payload(asset_id)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        samples = wav_samples(asset_id)
        feats = decode_asset(payload, "audio", fake=False)
        n = len(samples)
        nch, sw, rate, nf, rms, peak, mean, dur = feats
        assert (nch, sw, rate, nf) == (1.0, 2.0, float(AUDIO_RATE), float(n))
        assert rms == math.sqrt(sum(s * s for s in samples) / n)
        assert peak == max(abs(s) for s in samples)
        assert mean == sum(samples) / n
        assert dur == n / AUDIO_RATE


def test_bmp_payload_real_decode_roundtrip():
    """Image decode is REAL: a generated uncompressed 24-bit BMP
    parsed by stdlib `struct` must hand back exactly the dimensions
    and per-channel means implied by the generation formula — no fake
    flag. Exercises row padding (w=4 → no pad, w=5..7 → 1-3 pad
    bytes) and the bottom-up row order."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        bmp_dims,
        bmp_payload,
        decode_asset,
    )

    for asset_id in (0, 3, 6, 9, 33, 1002):
        payload = bmp_payload(asset_id)
        assert payload[:2] == b"BM"
        w, h = bmp_dims(asset_id)
        n = w * h
        feats = decode_asset(payload, "image", fake=False)
        mr = sum((asset_id * 7 + k * 11) % 256 for k in range(n)) / n
        mg = sum((asset_id * 13 + k * 17) % 256 for k in range(n)) / n
        mb = sum((asset_id * 19 + k * 23) % 256 for k in range(n)) / n
        assert feats == [float(w), float(h), 24.0, float(n), mr, mg, mb,
                         float(54 + (3 * w + 3) // 4 * 4 * h)]


def test_bmp_decode_rejects_unsupported_raster():
    """Anything but the uncompressed 24-bit raster needs a codec —
    the decoder must say so, not mis-parse."""
    import struct as _struct

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        bmp_payload,
        decode_asset,
    )

    payload = bytearray(bmp_payload(3))
    _struct.pack_into("<H", payload, 28, 8)  # claim 8-bit palette raster
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_asset(bytes(payload), "image", fake=False)


def test_image_features_df_real_decode_in_pipeline(spark):
    """fake=False image decode end to end through the fused Arrow
    stage: every doc_id % 3 == 0 row comes back with the features the
    formula implies."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        bmp_dims,
        image_features_df,
    )
    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table as load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = {r["asset_id"]: r for r in image_features_df(docs).collect()}
    expected_ids = {
        r["doc_id"] for r in docs.select("doc_id").collect() if r["doc_id"] % 3 == 0
    }
    assert rows.keys() == expected_ids
    for aid, r in rows.items():
        w, h = bmp_dims(aid)
        assert r["modality"] == "image"
        assert r["feature"][:4] == [float(w), float(h), 24.0, float(w * h)]
        assert r["n_bytes"] == 54 + (3 * w + 3) // 4 * 4 * h


def test_with_audio_payloads_swaps_only_audio(assets, spark):
    """The payload-swap stage must leave image/video rows bit-identical
    and give every audio row a parseable WAV whose meta matches the new
    bytes."""
    import hashlib

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        wav_payload,
        with_audio_payloads,
    )

    before = {r["asset_id"]: r for r in assets.collect()}
    after = {r["asset_id"]: r for r in with_audio_payloads(assets).collect()}
    assert before.keys() == after.keys()
    for aid, row in after.items():
        content = bytes(row["content"])
        assert row["meta"]["n_bytes"] == len(content)
        assert row["meta"]["digest"] == hashlib.md5(content).hexdigest()
        if row["modality"] == "audio":
            assert content == wav_payload(aid)
        else:
            assert content == bytes(before[aid]["content"])


def test_extract_features_real_audio_in_pipeline(assets):
    """fake=False over audio-only assets must succeed end to end (the
    decode path is real), and still raise for image/video."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        with_audio_payloads,
    )
    from pyspark.sql import functions as F

    audio = with_audio_payloads(assets).where(F.col("modality") == "audio")
    rows = extract_features(audio, fake=False).collect()
    assert rows and all(r["feature"][2] == 8000.0 for r in rows)
    non_audio = assets.where(F.col("modality") != "audio")
    with pytest.raises(Exception, match="no codec available"):
        extract_features(non_audio, fake=False).collect()


def test_audio_wav_assets_matches_payload_swap(spark):
    """The pruned-input audio builder (id column in, WAV out) must
    produce exactly the audio rows the full payload-swap stage does —
    it's the same table, minus the Arrow toll on bytes that were about
    to be overwritten."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        audio_wav_assets,
        with_audio_payloads,
    )
    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table as load_table
    from pyspark.sql import functions as F

    # Not the module `assets` fixture: its limit(30) subset is plan-
    # dependent, and both sides here must see the same rows.
    docs = load_table(spark, SF_SMOKE, "documents")
    via_swap = {
        r["asset_id"]: r
        for r in with_audio_payloads(assets_from_documents(docs))
        .where(F.col("modality") == "audio")
        .collect()
    }
    via_ids = {r["asset_id"]: r for r in audio_wav_assets(docs).collect()}
    assert via_swap.keys() == via_ids.keys()
    for aid, row in via_ids.items():
        assert bytes(row["content"]) == bytes(via_swap[aid]["content"])
        assert row["meta"] == via_swap[aid]["meta"]
        assert row["modality"] == "audio"


def test_non_ascii_strict_false_drops_with_ascii_kept(spark):
    """strict=False is the documented opt-out: non-ASCII rows are
    dropped, ASCII rows flow through unchanged."""
    docs = spark.createDataFrame(
        [(1, "plain ascii"), (2, "café non-ascii")], "doc_id long, text string"
    )
    rows = assets_from_documents(docs, strict=False).collect()
    assert [r["asset_id"] for r in rows] == [1]


def test_non_ascii_document_fails_fast(spark):
    """The char-based SQL oracles only hold for single-byte text, so
    the asset builder must reject non-ASCII payload stand-ins instead
    of silently desyncing byte counts (round-1 advice)."""
    import pytest

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        assets_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "plain ascii"), (2, "café non-ascii")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="non-ASCII or NULL text in doc_id=2"):
        assets_from_documents(docs).collect()


def test_binary_file_source_to_asset_schema(spark, tmp_path):
    """binaryFile ingestion edge: a directory of real WAV files (plus
    a file of unknown type) lands in the asset schema with correct
    modality, byte counts, digests — and the unknown extension maps
    to NULL modality, not a guess. The decoded features of an
    ingested file equal decoding its payload directly (the source
    adds nothing and loses nothing)."""
    import hashlib

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        decode_asset,
        extract_features,
        wav_payload,
    )
    from mit6_5840_6_824_lab1_mapreduce_spark.sources import read_binary_assets

    payloads = {f"a{i}.wav": wav_payload(i) for i in range(3)}
    payloads["notes.txt"] = b"not a media file"
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    assets = read_binary_assets(spark, str(tmp_path))
    rows = {r.asset_id: r for r in assets.collect()}
    assert len(rows) == 4
    by_digest = {r.meta.digest: r for r in rows.values()}
    for name, blob in payloads.items():
        r = by_digest[hashlib.md5(blob).hexdigest()]
        assert r.meta.n_bytes == len(blob)
        assert bytes(r.content) == blob
        assert r.modality == ("audio" if name.endswith(".wav") else None)

    wavs = assets.where(assets.modality == "audio")
    feat_rows = extract_features(wavs, fake=False).collect()
    assert len(feat_rows) == 3
    one = wavs.limit(1).collect()[0]
    direct = decode_asset(bytes(one.content), "audio", fake=False)
    via_df = [r.feature for r in feat_rows if r.asset_id == one.asset_id][0]
    assert list(via_df) == list(direct)


def test_avi_payload_real_decode_roundtrip():
    """Video decode is REAL: a generated uncompressed AVI (RIFF
    hdrl/movi, raw bottom-up DIB frames) parsed by stdlib `struct`
    must hand back exactly the dimensions, frame count, fps, and
    per-channel means implied by the generation formula — no fake
    flag. Exercises row padding, multi-frame chunk walking, and the
    exact container size."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        avi_dims,
        avi_payload,
        decode_asset,
    )

    for asset_id in (2, 5, 8, 11, 35, 1004):
        payload = avi_payload(asset_id)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
        w, h, nf = avi_dims(asset_id)
        n = w * h * nf
        feats = decode_asset(payload, "video", fake=False)
        mr = sum((asset_id * 11 + k * 29) % 256 for k in range(n)) / n
        mg = sum((asset_id * 17 + k * 31) % 256 for k in range(n)) / n
        mb = sum((asset_id * 23 + k * 37) % 256 for k in range(n)) / n
        row_size = (3 * w + 3) // 4 * 4
        assert feats == [
            float(w), float(h), float(nf), 10.0, mr, mg, mb,
            float(224 + nf * (8 + row_size * h)),
        ]


def test_avi_decode_rejects_compressed_stream():
    """A compressed video stream needs a codec — the decoder must say
    so, not mis-parse the frames."""
    import struct as _struct

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        avi_payload,
        decode_asset,
    )

    payload = bytearray(avi_payload(5))
    # flip biCompression in the strf BITMAPINFOHEADER to MJPG-ish
    pos = bytes(payload).find(b"strf") + 8 + 16
    _struct.pack_into("<I", payload, pos, 1)
    with pytest.raises(NotImplementedError, match="uncompressed"):
        decode_asset(bytes(payload), "video", fake=False)


def test_video_features_df_real_decode_in_pipeline(spark):
    """The fused Arrow stage decodes REAL AVI containers for every
    video-modality doc id (doc_id % 3 == 2) with stable schema."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        avi_dims,
        video_features_df,
    )
    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

    from .conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    rows = video_features_df(docs).collect()
    want = {r.doc_id for r in docs.select("doc_id").collect() if r.doc_id % 3 == 2}
    assert {r.asset_id for r in rows} == want
    for r in rows:
        w, h, nf = avi_dims(r.asset_id)
        assert (r.feature[0], r.feature[1], r.feature[2]) == (w, h, nf)
        assert r.modality == "video" and r.n_bytes == r.feature[7]


def test_png_payload_real_compressed_decode_roundtrip():
    """The COMPRESSED image codec path is REAL (round 10): a generated
    PNG — DEFLATE via stdlib zlib, correct chunk CRCs, scanlines
    filtered with filter y % 5 so all five spec filters appear — must
    decode back to exactly the per-channel means the generation
    formula implies, for RGB (color type 2) and RGBA (type 6). Asset
    ids cover h in 3..7, so Average (row 3) and Paeth (row 4) rows are
    exercised, not just the vapid None/Sub/Up prefix."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        bmp_dims,
        decode_asset,
        png_payload,
    )

    for asset_id in (0, 2, 4, 9, 33, 1002):  # heights 3,5,7,7,6,5
        for rgba in (False, True):
            payload = png_payload(asset_id, rgba=rgba)
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
            w, h = bmp_dims(asset_id)
            n = w * h
            feats = decode_asset(payload, "image", fake=False)
            mr = sum((asset_id * 7 + k * 11) % 256 for k in range(n)) / n
            mg = sum((asset_id * 13 + k * 17) % 256 for k in range(n)) / n
            mb = sum((asset_id * 19 + k * 23) % 256 for k in range(n)) / n
            assert feats == [
                float(w), float(h), 32.0 if rgba else 24.0, float(n),
                mr, mg, mb, float(len(payload)),
            ]


def test_png_bmp_cross_format_feature_parity():
    """Same pixels, two containers: PNG and BMP payloads of one
    asset_id must decode to identical dimensions and channel means —
    the decoders are exact oracles for each other (only bpp and
    file_bytes may differ)."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        bmp_payload,
        decode_asset,
        png_payload,
    )

    for asset_id in range(0, 40):
        p = decode_asset(png_payload(asset_id), "image")
        b = decode_asset(bmp_payload(asset_id), "image")
        assert p[:2] == b[:2] and p[3] == b[3]          # w, h, n_pixels
        assert p[4:7] == b[4:7]                          # mean_r/g/b exact


def test_png_decode_rejects_exotic_rasters():
    """16-bit, palette, and interlaced PNGs still need a codec lib —
    the decoder must say so, not mis-parse. A truncated IDAT must
    also fail loudly (zlib error or scanline-size check), never
    return wrong means."""
    import struct as _struct

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        decode_asset,
        png_payload,
    )

    base = png_payload(7)
    ihdr_off = 8 + 8  # sig + IDHR length/type
    for field_off, val, label in ((8, 16, "depth"), (9, 3, "palette"), (12, 1, "interlace")):
        payload = bytearray(base)
        payload[ihdr_off + field_off] = val
        with pytest.raises(NotImplementedError, match="PNG decode supports"):
            decode_asset(bytes(payload), "image", fake=False)
    # Truncate the IDAT payload: zlib refuses, or the scanline check does.
    import zlib as _zlib

    trunc = base[: len(base) // 2]
    with pytest.raises((NotImplementedError, _zlib.error)):
        decode_asset(trunc, "image", fake=False)


def test_png_decode_through_arrow_stage(spark):
    """Spark-side plumbing for the compressed codec: PNG payloads
    flow through the SAME mapInPandas extract_features stage as every
    other modality — Arrow batches of binary in, schema-stable
    feature rows out, fake=False end to end."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        bmp_dims,
        extract_features,
        png_payload,
    )

    rows = [(i, "image", png_payload(i, rgba=bool(i % 2)), (None, None))
            for i in range(12)]
    assets = spark.createDataFrame(
        rows,
        "asset_id long, modality string, content binary, "
        "meta struct<n_bytes: long, digest: string>",
    )
    got = {r.asset_id: r for r in extract_features(assets, fake=False).collect()}
    assert set(got) == set(range(12))
    for i, r in got.items():
        w, h = bmp_dims(i)
        assert (r.feature[0], r.feature[1]) == (w, h)
        assert r.feature[2] == (32.0 if i % 2 else 24.0)
        assert r.n_bytes == r.feature[7]


def test_g711_compressed_audio_decode_lossless_roundtrip():
    """The COMPRESSED audio codec path is REAL (round 10): G.711
    mu-law and A-law WAV containers (format tags 7/6, hand-built to
    spec — wave can't write non-PCM) decode through the pure ITU-T
    expansion formulas. The generator emits CODEWORDS, so decode is
    lossless by construction: a PCM WAV holding the decoded samples
    is an exact cross-format oracle — identical channel count, rate,
    frame count, rms, peak, mean, duration; only the STORED sampwidth
    differs (1 codeword byte vs 2 PCM bytes)."""
    import io as _io
    import struct as _struct
    import wave as _wave

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        AUDIO_RATE,
        _ALAW_TABLE,
        _ULAW_TABLE,
        decode_asset,
        g711_codes,
        g711_wav_payload,
    )

    for asset_id in (0, 5, 17, 33, 1002):
        for law, table in (("ulaw", _ULAW_TABLE), ("alaw", _ALAW_TABLE)):
            payload = g711_wav_payload(asset_id, law)
            feats = decode_asset(payload, "audio", fake=False)
            samples = [table[c] for c in g711_codes(asset_id)]
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(AUDIO_RATE)
                w.writeframes(_struct.pack(f"<{len(samples)}h", *samples))
            pcm = decode_asset(buf.getvalue(), "audio", fake=False)
            assert feats[0] == pcm[0] == 1.0
            assert (feats[1], pcm[1]) == (1.0, 2.0)  # stored widths
            assert feats[2] == pcm[2] == float(AUDIO_RATE)
            assert feats[3:] == pcm[3:]


def test_g711_expansion_tables_match_reference_implementation():
    """Bit-exactness of the pure-Python G.711 expansions against
    CPython's audioop (the Sun reference implementation) for ALL 256
    codewords of both laws. Gated: audioop is deprecated-for-removal
    (gone in 3.13); the formulas stand alone — this test just pins
    them to the reference while an independent oracle exists."""
    audioop = pytest.importorskip("audioop")
    import struct as _struct

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        _ALAW_TABLE,
        _ULAW_TABLE,
    )

    for c in range(256):
        assert _ULAW_TABLE[c] == _struct.unpack("<h", audioop.ulaw2lin(bytes([c]), 2))[0]
        assert _ALAW_TABLE[c] == _struct.unpack("<h", audioop.alaw2lin(bytes([c]), 2))[0]


def test_wav_unknown_format_tag_rejected():
    """A WAV with a format tag the decoder doesn't implement (e.g.
    2 = ADPCM) must raise NotImplementedError, not mis-parse."""
    import struct as _struct

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        decode_asset,
        g711_wav_payload,
    )

    payload = bytearray(g711_wav_payload(3))
    fpos = payload.find(b"fmt ")
    _struct.pack_into("<H", payload, fpos + 8, 2)  # claim ADPCM
    with pytest.raises(NotImplementedError, match="WAV format tag 2"):
        decode_asset(bytes(payload), "audio", fake=False)


def test_rle8_compressed_video_decode_roundtrip():
    """The COMPRESSED video codec path is REAL (round 10): MS-RLE8
    AVI containers (biCompression=1, palette in strf, '00dc' frames
    mixing encoded mode, absolute mode, EOL and EOB escapes) decode
    to exactly the per-channel means the closed-form
    palette[rle8_index] oracle implies."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        VIDEO_FPS,
        avi_dims,
        decode_asset,
        rle8_avi_payload,
        rle8_index,
        rle8_palette,
    )

    pal = rle8_palette()
    for asset_id in (0, 3, 7, 14, 23, 1002):
        w, h, nf = avi_dims(asset_id)
        feats = decode_asset(rle8_avi_payload(asset_id), "video", fake=False)
        n = w * h * nf
        sr = sg = sb = 0
        for f in range(nf):
            for y in range(h):
                for x in range(w):
                    r, g, b = pal[rle8_index(asset_id, f, y, x)]
                    sr += r
                    sg += g
                    sb += b
        assert feats[:7] == [
            float(w), float(h), float(nf), float(VIDEO_FPS),
            sr / n, sg / n, sb / n,
        ]
        assert feats[7] == len(rle8_avi_payload(asset_id))


def test_rle8_decoder_refuses_delta_and_overflow():
    """The RLE8 decoder fails loudly on the delta escape (position
    jump — undefined pixels) and on runs that overflow a row; it must
    never guess means from malformed data."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        _rle8_frame_counts,
    )

    with pytest.raises(NotImplementedError, match="delta"):
        _rle8_frame_counts(bytes((0, 2, 1, 1, 0, 1)), 4, 2)
    with pytest.raises(NotImplementedError, match="overflows"):
        _rle8_frame_counts(bytes((200, 5, 0, 1)), 4, 2)
    # Early EOB: undrawn pixels count as palette index 0.
    counts = _rle8_frame_counts(bytes((2, 9, 0, 1)), 4, 2)
    assert counts[9] == 2 and counts[0] == 6 and sum(counts) == 8


def test_compressed_codecs_through_arrow_stage(spark):
    """Spark-side plumbing for ALL round-10 compressed codecs in one
    mixed-modality frame: G.711 audio + RLE8 video + PNG image flow
    through the same mapInPandas extract_features stage, fake=False,
    schema-stable."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        avi_dims,
        bmp_dims,
        extract_features,
        g711_wav_payload,
        png_payload,
        rle8_avi_payload,
    )

    rows = []
    for i in range(9):
        if i % 3 == 0:
            rows.append((i, "image", png_payload(i), (None, None)))
        elif i % 3 == 1:
            rows.append((i, "audio", g711_wav_payload(i, "ulaw" if i % 2 else "alaw"), (None, None)))
        else:
            rows.append((i, "video", rle8_avi_payload(i), (None, None)))
    assets = spark.createDataFrame(
        rows,
        "asset_id long, modality string, content binary, "
        "meta struct<n_bytes: long, digest: string>",
    )
    got = {r.asset_id: r for r in extract_features(assets, fake=False).collect()}
    assert set(got) == set(range(9))
    for i, r in got.items():
        if i % 3 == 0:
            assert (r.feature[0], r.feature[1]) == bmp_dims(i)
        elif i % 3 == 1:
            assert r.feature[1] == 1.0  # stored G.711 codeword width
        else:
            w, h, nf = avi_dims(i)
            assert (r.feature[0], r.feature[1], r.feature[2]) == (w, h, nf)


def test_g711_decode_survives_metadata_chunk_containing_fourcc_bytes():
    """Regression (r10 self-review, reproduced live): chunk location
    must be a real RIFF walk, not content.find — a LIST/INFO metadata
    chunk BEFORE the data chunk whose text contains the substrings
    'data' or 'fmt ' must not be mistaken for the chunk headers. The
    decoder previously returned silently wrong statistics here."""
    import struct as _struct

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        decode_asset,
        g711_wav_payload,
    )

    base = g711_wav_payload(7, "ulaw")
    want = decode_asset(base, "audio", fake=False)
    # Rebuild the container with a LIST/INFO chunk (ICMT comment
    # holding decoy fourcc bytes) inserted before fmt/fact/data.
    icmt = b"my database has fmt data everywhere"
    if len(icmt) & 1:
        icmt += b"\0"
    info = b"INFO" + b"ICMT" + _struct.pack("<I", len(icmt)) + icmt
    lst = b"LIST" + _struct.pack("<I", len(info)) + info
    body = lst + base[12:]  # original chunks after RIFF/WAVE header
    tampered = b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got = decode_asset(tampered, "audio", fake=False)
    # file_bytes is not part of the audio layout; every field must
    # survive the metadata chunk untouched.
    assert got == want


def test_pcm_non_16bit_sampwidth_rejected():
    """ADVICE r11: an 8-bit PCM WAV must raise the dispatcher's
    promised NotImplementedError, not an opaque struct.error from the
    hard-coded '<...h' unpack."""
    import io as _io
    import wave as _wave

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        decode_asset,
    )

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit PCM
        w.setframerate(8000)
        w.writeframes(bytes(range(64)))
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_asset(buf.getvalue(), "audio", fake=False)


def test_g711_zero_channel_fmt_rejected():
    """ADVICE r11: a malformed G.711 container claiming nChannels=0
    must raise a loud codec error, not ZeroDivisionError."""
    import struct as _struct

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        decode_asset,
        g711_wav_payload,
    )

    payload = bytearray(g711_wav_payload(5))
    fpos = payload.find(b"fmt ")
    _struct.pack_into("<H", payload, fpos + 10, 0)  # nChannels = 0
    with pytest.raises(NotImplementedError, match="nChannels=0"):
        decode_asset(bytes(payload), "audio", fake=False)


def test_wav_empty_data_and_zero_rate_rejected():
    """Review r11: zero decoded samples (empty G.711 data chunk) and a
    zero sample rate must raise the loud codec error, never
    ZeroDivisionError / ValueError-from-empty-max."""
    import struct as _struct

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        decode_asset,
        g711_wav_payload,
    )

    base = bytearray(g711_wav_payload(5))
    fpos = base.find(b"fmt ")

    # Empty data chunk: truncate the data payload to zero bytes. Walk
    # the chunks to find the data header (never .find on fourccs).
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import (
        _wav_chunks,
    )

    for cc, off, size in _wav_chunks(bytes(base)):
        if cc == b"data":
            empty = bytes(base[: off - 8]) + b"data" + _struct.pack("<I", 0)
            break
    empty = b"RIFF" + _struct.pack("<I", len(empty) - 8 + 4) + empty[8:]
    with pytest.raises(NotImplementedError, match="n_samples=0"):
        decode_asset(empty, "audio", fake=False)

    # Zero sample rate in the fmt chunk.
    zero_rate = bytearray(g711_wav_payload(5))
    _struct.pack_into("<I", zero_rate, fpos + 12, 0)  # nSamplesPerSec = 0
    with pytest.raises(NotImplementedError, match="rate=0"):
        decode_asset(bytes(zero_rate), "audio", fake=False)
