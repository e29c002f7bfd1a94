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
    with pytest.raises(Exception, match="non-ASCII text in doc_id=2"):
        assets_from_documents(docs).collect()
