"""Bucketed-table evidence: joining two tables bucketed on the join
key must produce a plan with NO shuffle exchange (the 100 TB
fact-fact join story), and results identical to the plain join."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
from mit6_5840_6_824_lab1_mapreduce_spark.plans.bucketing import write_bucketed

from .conftest import SF_SMOKE


@pytest.fixture()
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="mrbucket-")
    yield d
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, f"{warehouse}/li",
                   sort_keys=["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, f"{warehouse}/o",
                   sort_keys=["o_orderkey"])

    bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
    # hint away broadcast so the bucket-aware sort-merge path is what
    # we're testing (at 100 TB neither side broadcasts anyway)
    joined = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout satisfies distribution

    # identical results to the unbucketed join
    want = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == want


def test_bucketed_aggregation_has_no_exchange(spark, warehouse):
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, f"{warehouse}/li")
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == li.select("l_orderkey").distinct().count()
