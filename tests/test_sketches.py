"""Approximate-sketch accuracy: HLL distinct counts and quantile
sketches must land within their documented error bounds vs exact
answers — the cheap first-pass operators at 100 TB, pytest-checked
(approx implementations differ across engines, so no hash oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

from .conftest import SF_CORRECT


def test_hll_distinct_within_rsd(spark):
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
