"""Salting correctness: salted rewrites must be result-identical to
their unsalted forms (salt never leaks into results), and the salted
join must actually key the shuffle on (key, salt)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _skewed_df(spark):
    # one hot key (90% of rows) + a tail
    return spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame(
        [Row(k="hot", tag="H")] + [Row(k=f"k{i}", tag=f"T{i}") for i in range(900, 910)]
    )
    got = salted_join(big, dim, on=["k"], n_salts=8).orderBy("v")
    want = big.join(dim, on=["k"]).orderBy("v")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame([Row(k="hot", tag="H")])
    got = salted_join(big, dim, on=["k"], n_salts=8, how="left")
    assert got.count() == 1000
    assert got.where(F.col("tag").isNull()).count() == 100  # the tail


def test_salted_join_plan_keys_include_salt(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame([Row(k="hot", tag="H")])
    plan = (
        salted_join(big, dim.hint("shuffle_hash"), on=["k"], n_salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan  # shuffle/join keys carry the salt


def test_salted_aggregate_count_sum(spark):
    df = _skewed_df(spark)
    got = {
        r["k"]: (r["n"], r["s"])
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs=[
                (F.count("*"), F.sum("n"), "n"),
                (F.sum("v"), F.sum("s"), "s"),
            ],
            n_salts=8,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want


def test_salted_aggregate_collect_list(spark):
    df = _skewed_df(spark)
    got = salted_aggregate(
        df,
        keys=["k"],
        aggs=[(F.collect_list("v"), F.flatten(F.collect_list("vs")), "vs")],
        n_salts=8,
    )
    row = {r["k"]: sorted(r["vs"]) for r in got.collect()}
    assert row["hot"] == list(range(900))
