"""Structural invariants for the training-blend ops — properties the
oracle compare can't see (it proves Spark ≡ DuckDB, not that either
meets the packing/sampling/chunking contract)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.queries.training import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET,
    corpus_chunk_windows,
    corpus_pack_sequences,
    corpus_sample_temperature,
)

from .conftest import SF_SMOKE


def test_packing_is_contiguous_within_shards(spark):
    """Within a shard, each doc's token interval starts exactly where
    the previous doc's ended (no gaps, no overlap), and sequence
    bounds follow from the interval: the stream is cut every
    PACK_BUDGET tokens."""
    rows = corpus_pack_sequences(spark, SF_SMOKE).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1, "expected multiple shards"
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in docs:
            start, end = cum, cum + r.n_tokens
            assert r.seq_first == start // PACK_BUDGET, (shard, r)
            assert r.seq_last == (end - 1) // PACK_BUDGET, (shard, r)
            assert r.n_seqs == r.seq_last - r.seq_first + 1
            cum = end


def test_packing_splits_are_bounded(spark):
    """A doc spans at most ceil(n_tokens/BUDGET)+1 sequences (it can
    straddle one boundary more than its own length requires, never
    two)."""
    for r in corpus_pack_sequences(spark, SF_SMOKE).collect():
        assert r.n_seqs <= math.ceil(r.n_tokens / PACK_BUDGET) + 1


def test_temperature_rates_contract(spark):
    """Rates are in (0, 1]; the smallest source keeps everything;
    larger sources are downsampled monotonically (rate strictly
    decreases as source size increases)."""
    rows = corpus_sample_temperature(spark, SF_SMOKE).collect()
    n_min = min(r.n_docs for r in rows)
    for r in rows:
        assert 0 < r.target_rate <= 1
        assert r.n_kept <= r.n_docs
        if r.n_docs == n_min:
            assert r.target_rate == 1.0
    by_size = sorted(rows, key=lambda r: r.n_docs)
    for a, b in zip(by_size, by_size[1:]):
        if a.n_docs < b.n_docs:
            assert a.target_rate > b.target_rate


def test_chunk_windows_cover_every_token(spark):
    """Chunks start every STRIDE tokens, the final chunk reaches the
    document's end, and consecutive chunks overlap by exactly
    CHUNK_TOKENS - CHUNK_STRIDE (when the doc is long enough)."""
    rows = corpus_chunk_windows(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = chunks[0].doc_tokens
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.start_tok == c.chunk_idx * CHUNK_STRIDE
            assert c.n_tokens == min(n - c.start_tok, CHUNK_TOKENS)
            assert c.n_tokens >= 1
        last = chunks[-1]
        assert last.start_tok + last.n_tokens == n  # reaches the end
        if n > CHUNK_TOKENS:
            assert len(chunks) == (n - CHUNK_TOKENS + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        else:
            assert len(chunks) == 1


def test_chunk_hashes_dedupe_repeated_windows(spark):
    """Identical texts yield identical chunk hash sequences — the
    property retrieval dedup relies on."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma " * 40), (2, "alpha beta gamma " * 40)],
        "doc_id long, text string",
    )
    a = [r.chunk_hash for r in _chunks_for(spark, docs, 1)]
    b = [r.chunk_hash for r in _chunks_for(spark, docs, 2)]
    assert a and a == b


def _chunks_for(spark, docs, doc_id):
    import tempfile

    from mit6_5840_6_824_lab1_mapreduce_spark.queries.training import (
        corpus_chunk_windows,
    )

    with tempfile.TemporaryDirectory() as d:
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        return (
            corpus_chunk_windows(spark, d)
            .where(F.col("doc_id") == doc_id)
            .orderBy("chunk_idx")
            .collect()
        )
