"""Analytical invariants of the deterministic sketches — properties
the oracle hash-compare cannot express (one-sided CMS error, sketch
accuracy bounds, coverage monotonicity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .conftest import SF_CORRECT


def test_hll_distinct_within_rsd(spark):
    """Spark's built-in approx_count_distinct (randomized per
    implementation, so no hash oracle) stays within its rsd bound."""
    ev = table(spark, SF_CORRECT, "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) <= max(3 * 0.02 * exact, 1)


def test_quantile_sketch_within_error(spark):
    li = table(spark, SF_CORRECT, "lineitem")
    [q50, q95] = li.approxQuantile("l_extendedprice", [0.5, 0.95], 0.01)
    n = li.count()
    below50 = li.where(F.col("l_extendedprice") <= q50).count()
    below95 = li.where(F.col("l_extendedprice") <= q95).count()
    assert abs(below50 / n - 0.5) <= 0.02
    assert abs(below95 / n - 0.95) <= 0.02


def test_cms_error_is_one_sided(spark):
    rows = REGISTRY["sketch_cms_heavy_hitters"].fn(spark, SF_CORRECT).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_estimate >= r.true_count, r
        assert r.overcount == r.cms_estimate - r.true_count


def test_kmv_estimate_tracks_exact_cardinality(spark):
    rows = REGISTRY["sketch_kmv_distinct"].fn(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        if r.n_exact < r.kmv_k:
            assert r.kmv_estimate == float(r.n_exact), r
        else:
            # KMV with k=64 has ~1/sqrt(k-2) ≈ 12.7% std error; the
            # data and hashes are fixed, so this bound is stable.
            assert abs(r.kmv_estimate - r.n_exact) / r.n_exact < 0.5, r


def test_hll_estimate_tracks_exact_cardinality(spark):
    (row,) = REGISTRY["sketch_hll_estimate"].fn(spark, SF_CORRECT).collect()
    assert row.m == 256
    assert 0 < row.buckets_hit <= 256
    # m=256 → ~1.04/sqrt(m) ≈ 6.5% std error (raw estimator, fixed
    # hashes, fixed data → deterministic).
    assert abs(row.hll_estimate - row.n_exact) / row.n_exact < 0.25, row


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        REGISTRY["vocab_coverage_topk"].fn(spark, SF_CORRECT).collect(),
        key=lambda r: r.coverage_pct,
    )
    assert [r.coverage_pct for r in rows] == [50, 90, 95, 99]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.vocab_size >= prev.vocab_size
        assert cur.tokens_covered >= prev.tokens_covered
    for r in rows:
        # The cut is the FIRST rank reaching the threshold.
        assert r.coverage >= r.coverage_pct / 100.0
        assert r.total_tokens == rows[0].total_tokens


def test_kmv_merge_equals_direct(spark):
    """Mergeability, asserted end to end: union-of-sketches re-minned
    to k must equal the directly computed global sketch."""
    (row,) = REGISTRY["sketch_kmv_merge"].fn(spark, SF_CORRECT).collect()
    assert row.merged_equals_direct
    assert row.kth_hash_merged == row.kth_hash_direct
    assert row.n_exact > 0 and row.kmv_estimate > 0
