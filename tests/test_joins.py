"""Unit semantics for the temporal join operators (operators/joins.py):
boundary inclusivity, tie handling, null carry — the edge cases the
sf-table oracles may not cover."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from mit6_5840_6_824_lab1_mapreduce_spark.operators.joins import (
    asof_join_backward,
    dedupe_latest,
    range_join_bucketed,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [Row(id=1, k=1, ts=_ts(10)), Row(id=2, k=1, ts=_ts(5)), Row(id=3, k=2, ts=_ts(10))]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=_ts(7), v="a"), Row(k=1, rts=_ts(9), v="b")]
    )
    out = {
        r["id"]: r["v"]
        for r in asof_join_backward(
            left, right, key="k", left_ts="ts", right_ts="rts", payload_cols=["v"]
        ).collect()
    }
    assert out == {1: "b", 2: None, 3: None}  # latest ≤ ts; no right → null


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([Row(id=1, k=1, ts=_ts(7))])
    right = spark.createDataFrame([Row(k=1, rts=_ts(7), v="x")])
    [r] = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="rts", payload_cols=["v"]
    ).collect()
    assert r["v"] == "x"  # ASOF semantics: l.ts >= r.ts includes equality


def test_asof_null_payload_field_not_overwritten(spark):
    # the later right row has v=null; struct-level carry must still
    # take the later row wholesale, not mix fields across rows
    left = spark.createDataFrame([Row(id=1, k=1, ts=_ts(10))])
    right = spark.createDataFrame(
        [Row(k=1, rts=_ts(5), v="old", w=1), Row(k=1, rts=_ts(8), v=None, w=2)]
    )
    [r] = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="rts", payload_cols=["v", "w"]
    ).collect()
    assert r["v"] is None and r["w"] == 2


def test_range_join_boundaries_and_bucket_straddle(spark):
    # range (start=100, end=700] with 600s buckets: start in bucket 0,
    # end in bucket 1 — points on both sides of the bucket edge match
    ranges = spark.createDataFrame(
        [Row(rid=1, k=1, start=_ts(100), end=_ts(700))]
    )
    points = spark.createDataFrame(
        [
            Row(pid=1, k=1, pts=_ts(100)),   # == start: excluded (strict >)
            Row(pid=2, k=1, pts=_ts(101)),   # inside, bucket 0
            Row(pid=3, k=1, pts=_ts(650)),   # inside, bucket 1
            Row(pid=4, k=1, pts=_ts(700)),   # == end: included (<=)
            Row(pid=5, k=1, pts=_ts(701)),   # outside
            Row(pid=6, k=2, pts=_ts(300)),   # wrong key
        ]
    )
    got = sorted(
        r["pid"]
        for r in range_join_bucketed(
            points, ranges, key="k", point_ts="pts",
            range_start="start", range_end="end", bucket_seconds=600,
        ).collect()
    )
    assert got == [2, 3, 4]


def test_range_join_no_duplicate_matches(spark):
    # a point matches a range exactly once even though the range
    # explodes into multiple buckets
    ranges = spark.createDataFrame([Row(rid=1, k=1, start=_ts(0), end=_ts(1800))])
    points = spark.createDataFrame([Row(pid=1, k=1, pts=_ts(900))])
    rows = range_join_bucketed(
        points, ranges, key="k", point_ts="pts",
        range_start="start", range_end="end", bucket_seconds=600,
    ).collect()
    assert len(rows) == 1


def test_dedupe_latest(spark):
    df = spark.createDataFrame(
        [Row(k=1, seq=1, v="a"), Row(k=1, seq=3, v="c"), Row(k=1, seq=2, v="b")]
    )
    [r] = dedupe_latest(df, keys=["k"], order_desc=["seq"]).collect()
    assert (r["seq"], r["v"]) == (3, "c")
