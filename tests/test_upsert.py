"""MERGE/upsert via dynamic partition overwrite: correctness
(update-wins, insert, untouched rows survive) + the scale invariant
that only the touched partitions' files are rewritten."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators.upsert import merge_upsert
from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
from mit6_5840_6_824_lab1_mapreduce_spark.streaming.merge_sink import (
    stream_merge_to_table,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def target(spark):
    d = tempfile.mkdtemp(prefix="mrmerge-")
    path = f"{d}/events"
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    yield path
    shutil.rmtree(d, ignore_errors=True)


def _partition_files(path):
    return {
        day: sorted(
            os.path.basename(f) for f in glob.glob(f"{path}/day={day}/*.parquet")
        )
        for day in (os.path.basename(p).split("=", 1)[1] for p in glob.glob(f"{path}/day=*"))
    }


def test_merge_upsert_semantics_and_partition_footprint(spark, target):
    # partition values read back DATE-typed (partition type inference);
    # keep everything string-typed to match directory names
    before = (
        spark.read.parquet(target)
        .withColumn("day", F.col("day").cast("string"))
        .cache()
    )
    days = sorted(r[0] for r in before.select("day").distinct().collect())
    touched_days = days[:2]
    untouched_days = days[2:]
    assert untouched_days, "smoke table must span >2 days"

    # one real update (existing event_id, changed value) per touched
    # day + one brand-new event_id per touched day
    existing = (
        before.where(F.col("day").isin(touched_days))
        .groupBy("day")
        .agg(F.min("event_id").alias("event_id"))
        .join(before, ["day", "event_id"])
        .select("event_id", "user_id", "event_type", "value", "day")
    )
    updates = existing.withColumn("value", F.lit(12345.0)).unionByName(
        existing.select(
            (F.col("event_id") + 10_000_000).alias("event_id"),
            "user_id",
            F.lit("merged").alias("event_type"),
            F.lit(1.0).alias("value"),
            "day",
        )
    )
    n_before = before.count()
    files_before = _partition_files(target)

    touched = merge_upsert(
        spark, target, updates, key_cols=["event_id"], partition_col="day"
    )
    assert sorted(str(t) for t in touched) == touched_days

    after = spark.read.parquet(target)
    # inserts: one new key per touched day
    assert after.count() == n_before + len(touched_days)
    # updates won: the existing keys now carry the new value
    got = (
        after.join(existing.select("event_id"), "event_id")
        .select("value")
        .distinct()
        .collect()
    )
    assert [r[0] for r in got] == [12345.0]
    # new keys present with their payload
    assert after.where(F.col("event_type") == "merged").count() == len(touched_days)

    # footprint: untouched partitions' files are byte-identical names
    files_after = _partition_files(target)
    for day in untouched_days:
        assert files_after[day] == files_before[day]
    for day in touched_days:
        assert files_after[day] != files_before[day]
    before.unpersist()


def test_merge_upsert_batch_internal_precedence(spark, target):
    # duplicate key within one batch: order_col picks the winner
    row = (
        spark.read.parquet(target)
        .withColumn("day", F.col("day").cast("string"))
        .orderBy("event_id")
        .limit(1)
        .select("event_id", "user_id", "event_type", "value", "day")
        .collect()[0]
    )
    one = spark.createDataFrame([row.asDict()], "event_id long, user_id long, event_type string, value double, day string")
    dup = one.withColumn("value", F.lit(1.0)).withColumn(
        "seq", F.lit(1)
    ).unionByName(
        one.withColumn("value", F.lit(2.0)).withColumn("seq", F.lit(2))
    )
    merge_upsert(
        spark,
        target,
        dup,
        key_cols=["event_id"],
        partition_col="day",
        order_col="seq",
    )
    key = row["event_id"]
    got = (
        spark.read.parquet(target)
        .where(F.col("event_id") == key)
        .select("value")
        .collect()
    )
    assert len(got) == 1 and got[0][0] == 2.0


@pytest.mark.parametrize("trial", range(3))
def test_stream_merge_sink_converges(spark, trial):
    """Two waves of files streamed (maxFilesPerTrigger=1): wave 2
    updates half of wave 1's keys and adds new ones. The final table
    must equal the batch-computed last-writer-wins state. Repeated x3
    (test-mr-many.sh discipline — the last timing-sensitive streaming
    single-shot, round-5 verdict task 7): batch arrival order depends
    on file mtimes and trigger pacing, so one green run can mask a
    race."""
    import time

    d = tempfile.mkdtemp(prefix="mrstreammerge-")
    src, target, ckpt = f"{d}/src", f"{d}/table", f"{d}/ckpt"
    try:
        ev = (
            table(spark, SF_SMOKE, "events")
            .select(
                "event_id",
                "user_id",
                "event_type",
                "value",
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
            )
            .orderBy("event_id")
            .limit(40)
            .cache()
        )
        wave1 = ev
        wave2 = ev.limit(20).withColumn("value", F.lit(777.0)).unionByName(
            ev.limit(10).select(
                (F.col("event_id") + 5_000_000).alias("event_id"),
                "user_id",
                F.lit("inserted").alias("event_type"),
                F.lit(9.0).alias("value"),
                "day",
            )
        )
        wave1.coalesce(1).write.parquet(f"{src}/w1")
        time.sleep(1.1)  # distinct mtimes → file-source batch order
        wave2.coalesce(1).write.parquet(f"{src}/w2")

        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, "
                "value double, day string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        q = stream_merge_to_table(
            stream, target, key_cols=["event_id"], partition_col="day",
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

        got = spark.read.parquet(target)
        expected_n = wave1.count() + 10  # 20 updates in place, 10 inserts
        assert got.count() == expected_n
        assert got.where(F.col("value") == 777.0).count() == 20
        assert got.where(F.col("event_type") == "inserted").count() == 10
        ev.unpersist()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_merge_sink_order_col_resolves_intra_batch_dupes(spark):
    """A micro-batch carrying several rows for the SAME key must
    converge to the row with the highest order_col — deterministically,
    so a crash-replayed batch produces the identical table (the
    idempotence contract; round-1 advice flagged the unordered case)."""
    d = tempfile.mkdtemp(prefix="mrstreammergeord-")
    src, target, ckpt = f"{d}/src", f"{d}/table", f"{d}/ckpt"
    try:
        rows = [  # key k1: three contenders in ONE batch; seq 30 wins
            (10, "k1", "v-seq10", "d1"),
            (30, "k1", "v-seq30", "d1"),
            (20, "k1", "v-seq20", "d1"),
            (5, "k2", "only", "d2"),
        ]
        spark.createDataFrame(
            rows, "seq long, key string, value string, day string"
        ).coalesce(1).write.parquet(f"{src}/w1")

        stream = (
            spark.readStream.schema("seq long, key string, value string, day string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        q = stream_merge_to_table(
            stream, target, key_cols=["key"], partition_col="day",
            checkpoint_dir=ckpt, order_col="seq",
        )
        q.awaitTermination(120)

        got = {r["key"]: r["value"] for r in spark.read.parquet(target).collect()}
        assert got == {"k1": "v-seq30", "k2": "only"}
    finally:
        shutil.rmtree(d, ignore_errors=True)
