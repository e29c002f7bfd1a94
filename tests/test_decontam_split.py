"""Invariants for the Bloom prefilter and the leakage-safe split that
the hash-compare alone doesn't state explicitly."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .conftest import SF_SMOKE


def test_bloom_prefilter_error_is_one_sided(spark):
    """Every true member must pass the bloom (no false negatives):
    then and only then n_false_positive == n_pass - n_true_member."""
    row = REGISTRY["decontam_bloom_prefilter"].fn(spark, SF_SMOKE).head()
    assert row.n_pass_bloom >= row.n_true_member
    assert row.n_false_positive == row.n_pass_bloom - row.n_true_member
    assert 0 <= row.n_pass_bloom <= row.n_corpus_grams


def test_leakage_safe_split_is_cluster_atomic(spark):
    df = REGISTRY["corpus_leakage_safe_split"].fn(spark, SF_SMOKE)
    straddle = (
        df.groupBy("component")
        .agg(F.count_distinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddle == 0, "a near-dup cluster straddles train/holdout"
    # one verdict per document, covering the whole corpus
    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

    n_docs = table(spark, SF_SMOKE, "documents").count()
    assert df.count() == n_docs
    assert df.select("doc_id").distinct().count() == n_docs
    vals = {r.split for r in df.select("split").distinct().collect()}
    assert vals <= {"train", "holdout"}
