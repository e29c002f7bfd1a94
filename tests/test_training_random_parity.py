"""Randomized cross-engine parity for the training-pipeline surface
(round 6) — the `test_random_corpus_parity` battery extended to the
last oracle-backed families exercised only on the fixed sf fixtures:
sequence packing, temperature/stratified sampling, mixture planning,
chunking/passage blocks, and the decontamination prefilters.

These are the ops whose edge cases live in corpus SHAPE rather than
value ranges: documents with zero tokens, a source that vanishes from
a split, every document identical (one giant dedup/benchmark bucket),
single-document corpora. The generator (shared with the round-5
battery) produces exactly those shapes; each example runs the full
Spark-vs-DuckDB compare, so both engines must agree on the degenerate
geometry, not just the happy path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .oracle_check import compare_query
from .test_random_corpus_parity import _corpus, _write_documents

# Documents-only training/packing surface (cheap per example).
_TRAINING_QUERIES = [
    "corpus_pack_sequences",
    "corpus_sample_temperature",
    "corpus_stratified_sample",
    "corpus_mixture_plan",
    "corpus_chunk_windows",
    "dedup_passage_blocks",
]

# Decontamination prefilters (documents-only; the benchmark list is
# derived deterministically inside the query).
_DECONTAM_QUERIES = [
    "decontam_ngram_hits",
    "decontam_drop_list",
    "decontam_bloom_prefilter",
]


def _run(spark, tmp, names) -> None:
    for name in names:
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp), name=f"rand-{name}")


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpus)
def test_training_queries_match_oracle_on_random_corpora(
    spark, tmp_path_factory, texts
):
    tmp = tmp_path_factory.mktemp("randtrain")
    _write_documents(tmp, texts)
    _run(spark, tmp, _TRAINING_QUERIES)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpus)
def test_decontam_queries_match_oracle_on_random_corpora(
    spark, tmp_path_factory, texts
):
    tmp = tmp_path_factory.mktemp("randdecon")
    _write_documents(tmp, texts)
    _run(spark, tmp, _DECONTAM_QUERIES)


def test_training_queries_on_all_empty_and_single_doc(spark, tmp_path):
    """Deterministic pins for the two shapes sampling can miss: a
    corpus of entirely empty texts (zero tokens anywhere — packing,
    chunking, and n-gram decontam must emit empty/zero results
    identically on both engines) and a single-document corpus."""
    empty_dir = tmp_path / "empty"
    empty_dir.mkdir()
    _write_documents(empty_dir, ["", "", ""])
    _run(spark, empty_dir, _TRAINING_QUERIES + _DECONTAM_QUERIES)

    single_dir = tmp_path / "single"
    single_dir.mkdir()
    _write_documents(single_dir, ["the data spark alpha"])
    _run(spark, single_dir, _TRAINING_QUERIES + _DECONTAM_QUERIES)
