"""Structural invariants of the profiling/SCD-2/quantization suite —
properties the hash oracle can't state (interval partitioning,
quantizer range/error bounds)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .conftest import SF_CORRECT


def test_scd2_intervals_partition_each_users_timeline(spark):
    rows = REGISTRY["scd2_user_state_history"].fn(spark, SF_CORRECT).collect()
    ev_per_user = dict(
        table(spark, SF_CORRECT, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert set(by_user) == set(ev_per_user)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r.seg)
        # exactly one open interval, and it is the last one
        assert [r.is_current for r in ivs].count(True) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        # contiguous: each interval closes exactly where the next opens
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, (uid, a, b)
            assert a.state != b.state, "consecutive segments must differ"
        assert sum(r.n_events for r in ivs) == ev_per_user[uid]


def test_quantizer_range_and_error_bounds(spark):
    rows = REGISTRY["embedding_quantize_int8"].fn(spark, SF_CORRECT).collect()
    dims = len(
        table(spark, SF_CORRECT, "embeddings").select("embedding").first()[0]
    )
    assert rows
    for r in rows:
        # int8 range: |q8_i| <= 127 -> L1 bounded by 127 * dims
        assert 0 <= r.q8_l1 <= 127 * dims, r
        assert abs(r.q8_sum) <= r.q8_l1
        # rounding error per element <= amax/2 in scaled units
        per_elem = (r.amax_q // 2 + 1) ** 2
        assert 0 <= r.q_err2 <= dims * per_elem, r


def test_profile_reports_every_column_exactly_once(spark):
    rows = REGISTRY["profile_orders_columns"].fn(spark, SF_CORRECT).collect()
    n = table(spark, SF_CORRECT, "orders").count()
    names = [r.column_name for r in rows]
    assert len(names) == len(set(names)) == 6
    for r in rows:
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n - r.n_nulls
        assert r.min_val <= r.max_val or r.column_name == "o_totalprice"
