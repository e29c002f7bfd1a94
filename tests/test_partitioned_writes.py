"""Partitioned-write evidence: writing a fact table partitioned by a
date column must let later scans prune to the touched partitions
(PartitionFilters in the plan, fewer files read) — the other half of
the 100 TB layout story next to bucketing."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

from .conftest import SF_SMOKE


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="mrpart-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes_scan(spark, outdir):
    ev = table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(f"{outdir}/events")

    n_days = len(glob.glob(f"{outdir}/events/day=*"))
    assert n_days > 5  # the smoke table spans many days

    one_day = (
        spark.read.parquet(f"{outdir}/events")
        .where(F.col("day") == "2024-01-03")
        .select("event_id")
    )
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the day predicate must be a partition filter (directory pruning),
    # not a row-level data filter
    assert "PartitionFilters: [isnotnull(day" in plan
    # and the pruned scan reads one partition's worth of rows
    full = spark.read.parquet(f"{outdir}/events")
    assert 0 < one_day.count() < full.count()


def test_partition_values_roundtrip(spark, outdir):
    ev = table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(f"{outdir}/events")
    got = spark.read.parquet(f"{outdir}/events").count()
    assert got == ev.count()


def test_ndjson_source_roundtrip(spark, outdir):
    """Format coverage beyond parquet: events written as NDJSON read
    back with an explicit schema must equal the parquet-sourced rows
    (schema-on-read with no inference pass — required at scale)."""
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "user_id", "event_type", "value",
    )
    ev.write.mode("overwrite").json(f"{outdir}/ndjson")
    back = spark.read.schema(
        "event_id long, ts_s string, user_id long, event_type string, value double"
    ).json(f"{outdir}/ndjson")
    a = {tuple(r) for r in ev.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
