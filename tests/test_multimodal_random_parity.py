"""Randomized container-parse parity for the multimodal decode paths
(round 6) — the random-battery pattern applied to ``decode_asset``.

The golden round-trip tests prove the fixed deterministic corpora
decode losslessly; this battery generates containers the fixtures
never produce and checks the parser's arithmetic against an
INDEPENDENT ground truth (numpy float64 over the raw pixel/sample
arrays, not the parser's own summation), so a shared bug in
generator+parser cannot self-confirm.

Adversarial axes per format:
- WAV: stereo interleave, 1-frame payloads, all-zero PCM (peak=0),
  extreme int16 values (±32767/-32768), odd frame counts;
- BMP: widths across the full 4-byte row-padding cycle, NEGATIVE
  height (top-down row order — valid BMP the fixed corpus never
  emits), 1x1 rasters, saturated channels;
- AVI: JUNK chunks inside the movi list (alignment padding real
  muxers emit), an idx1 index chunk after movi, ODD-sized chunks
  (exercising the word-alignment skip), frame pixel bytes that spell
  '00db' (the reason the parser walks chunks instead of find()).

Pure-Python: ``decode_asset`` is a plain function, so this battery
costs no Spark session.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.operators.multimodal import decode_asset

REL = 1e-9  # independent-arithmetic comparison tolerance


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- WAV


@settings(max_examples=40, deadline=None)
@given(
    nch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    n_frames=st.integers(min_value=1, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    extreme=st.booleans(),
)
def test_wav_decode_matches_numpy(nch, rate, n_frames, seed, extreme):
    if extreme:
        # saturate: alternate int16 min/max plus zeros
        base = np.array([32767, -32768, 0], dtype=np.int64)
        samples = np.resize(base, n_frames * nch)
    else:
        samples = _rng(seed).integers(-32768, 32768, size=n_frames * nch)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    feat = decode_asset(buf.getvalue(), "audio")

    s = samples.astype(np.float64)
    expected = [
        float(nch),
        2.0,
        float(rate),
        float(n_frames),
        float(np.sqrt(np.mean(s * s))),
        float(np.max(np.abs(s))),
        float(np.mean(s)),
        n_frames / rate,
    ]
    assert feat[:4] == expected[:4]
    for got, want in zip(feat[4:], expected[4:]):
        assert got == want or abs(got - want) <= REL * max(1.0, abs(want))


# ---------------------------------------------------------------- BMP

_BMP_HEADER_BYTES = 54


def _build_bmp(pixels: np.ndarray, topdown: bool) -> bytes:
    """pixels: (h, w, 3) uint8 in R,G,B row-major from the TOP.
    Stored bottom-up unless topdown (negative biHeight)."""
    h, w, _ = pixels.shape
    row_size = (3 * w + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", _BMP_HEADER_BYTES + data_size, 0, 0, _BMP_HEADER_BYTES
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if topdown else h, 1, 24, 0,
        data_size, 2835, 2835, 0, 0,
    )
    ys = range(h) if topdown else reversed(range(h))
    rows = []
    for y in ys:
        row = bytearray()
        for x in range(w):
            r, g, b = pixels[y, x]
            row += bytes((int(b), int(g), int(r)))  # stored B,G,R
        row += b"\0" * (row_size - 3 * w)
        rows.append(bytes(row))
    return header + dib + b"".join(rows)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=13),
    h=st.integers(min_value=1, max_value=9),
    topdown=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    saturate=st.booleans(),
)
def test_bmp_decode_matches_numpy(w, h, topdown, seed, saturate):
    if saturate:
        pixels = np.full((h, w, 3), 255, dtype=np.uint8)
        pixels[:, :, 1] = 0  # kill G so channel order mistakes show
    else:
        pixels = _rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    feat = decode_asset(_build_bmp(pixels, topdown), "image")

    p = pixels.astype(np.float64)
    row_size = (3 * w + 3) // 4 * 4
    assert feat[:4] == [float(w), float(h), 24.0, float(w * h)]
    for got, want in zip(feat[4:7], [p[:, :, c].mean() for c in range(3)]):
        assert abs(got - want) <= REL * max(1.0, abs(want))
    assert feat[7] == float(_BMP_HEADER_BYTES + row_size * h)


# ---------------------------------------------------------------- AVI


def _chunk(cc: bytes, body: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd-sized bodies get a pad byte
    # that is NOT counted in the declared size.
    pad = b"\0" if len(body) & 1 else b""
    return cc + struct.pack("<I", len(body)) + body + pad


def _build_avi(
    frames: np.ndarray, fps: int, junk: bytes | None, with_idx1: bool
) -> bytes:
    """frames: (nf, h, w, 3) uint8 R,G,B row-major from the TOP of
    each frame; stored bottom-up like the BMP raster."""
    nf, h, w, _ = frames.shape
    row_size = (3 * w + 3) // 4 * 4
    frame_size = row_size * h

    def raw(f: int) -> bytes:
        rows = []
        for y in reversed(range(h)):
            row = bytearray()
            for x in range(w):
                r, g, b = frames[f, y, x]
                row += bytes((int(b), int(g), int(r)))
            row += b"\0" * (row_size - 3 * w)
            rows.append(bytes(row))
        return b"".join(rows)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10,
        nf, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, nf, frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    for f in range(nf):
        if junk is not None:
            movi_body += _chunk(b"JUNK", junk)  # alignment junk between frames
        movi_body += _chunk(b"00db", raw(f))
    movi = _chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    if with_idx1:
        # a plausible idx1: one 16-byte entry per frame, each BEGINNING
        # with the frame fourcc — a find()-based parser would double
        # count; the chunk walk must skip the whole thing.
        entries = b"".join(
            b"00db" + struct.pack("<III", 0x10, 4 + f * (8 + frame_size), frame_size)
            for f in range(nf)
        )
        body += _chunk(b"idx1", entries)
    return b"RIFF" + struct.pack("<I", len(body)) + body


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=6),
    nf=st.integers(min_value=1, max_value=5),
    fps=st.sampled_from([10, 25]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    junk_len=st.sampled_from([None, 3, 8]),  # 3 = odd size, exercises &1
    with_idx1=st.booleans(),
    embed_fourcc=st.booleans(),
)
def test_avi_decode_matches_numpy(w, h, nf, fps, seed, junk_len, with_idx1, embed_fourcc):
    frames = _rng(seed).integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
    if embed_fourcc and 3 * w >= 4:
        # spell '00db' inside the first frame's pixel bytes: stored
        # B,G,R order means pixel values ('0','0','d'),('b',...) —
        # close enough to land the 4 ASCII bytes contiguously.
        flat = frames[0].reshape(-1)
        flat[0:4] = [0x30, 0x30, 0x64, 0x62]
    junk = None if junk_len is None else b"\xab" * junk_len
    feat = decode_asset(_build_avi(frames, fps, junk, with_idx1), "video")

    p = frames.astype(np.float64)
    assert feat[:4] == [float(w), float(h), float(nf), float(fps)]
    for got, want in zip(feat[4:7], [p[:, :, :, c].mean() for c in range(3)]):
        assert abs(got - want) <= REL * max(1.0, abs(want))


def test_avi_junk_only_movi_zero_frames():
    """A movi list with no '00db' chunks at all: nf=0 means the mean
    division is 0/0 — the parser should fail loudly (ZeroDivisionError
    under plain Python), not return garbage. Pin whichever it is so a
    future silent-NaN regression shows up."""
    frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    payload = _build_avi(frames, 10, None, False)
    # strip the one frame chunk out of the movi list body
    row_size = (3 * 2 + 3) // 4 * 4
    frame_chunk = b"00db" + struct.pack("<I", row_size * 2)
    pos = payload.find(frame_chunk)
    assert pos > 0
    end = pos + 8 + row_size * 2
    stripped = payload[:pos] + payload[end:]
    # fix the two enclosing sizes (RIFF total, movi LIST)
    removed = end - pos
    riff_size = struct.unpack_from("<I", stripped, 4)[0] - removed
    stripped = stripped[:4] + struct.pack("<I", riff_size) + stripped[8:]
    movi_pos = stripped.find(b"LIST", 12)
    while stripped[movi_pos + 8 : movi_pos + 12] != b"movi":
        movi_pos = stripped.find(b"LIST", movi_pos + 4)
    movi_size = struct.unpack_from("<I", stripped, movi_pos + 4)[0] - removed
    stripped = (
        stripped[: movi_pos + 4]
        + struct.pack("<I", movi_size)
        + stripped[movi_pos + 8 :]
    )
    try:
        feat = decode_asset(stripped, "video")
    except ZeroDivisionError:
        return  # loud failure: acceptable and pinned
    raise AssertionError(f"zero-frame AVI decoded silently: {feat}")
