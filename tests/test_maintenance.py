"""Compaction, schema evolution, and the plan-audit API — the
operational edges of a long-lived lake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators.maintenance import (
    compact_parquet,
    table_file_stats,
)
from mit6_5840_6_824_lab1_mapreduce_spark.plans import plan_audit, table
from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .conftest import SF_SMOKE


def _content_hash(df):
    cols = sorted(df.columns)
    return (
        df.select(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()[0][0]
    )


def test_compaction_preserves_content_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    o = table(spark, SF_SMOKE, "orders")
    o.repartition(40).write.parquet(path)  # fragmented: 40 tiny files
    before_hash = _content_hash(spark.read.parquet(path))
    n_before, n_after = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n_before == 40 and n_after == 1
    back = spark.read.parquet(path)
    assert back.count() == o.count()
    assert _content_hash(back) == before_hash


def test_compaction_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "compact")
    table(spark, SF_SMOKE, "orders").coalesce(1).write.parquet(path)
    n_before, n_after = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n_before == n_after == 1
    # the no-op must not have rewritten anything
    assert table_file_stats(spark, path)[0] == 1


def test_compaction_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        compact_parquet(spark, str(tmp_path / "nope"))


def test_schema_evolution_merge_read(spark, tmp_path):
    """Drops arrive with new columns over time; mergeSchema reads the
    union with nulls backfilled — the append-only evolution contract."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        f"{path}/drop=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(f"{path}/drop=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/drop=1", f"{path}/drop=2"
    )
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_plan_audit_matches_known_shapes(spark):
    q5 = plan_audit(REGISTRY["tpch_q5_local_supplier_volume"].fn(spark, SF_SMOKE))
    assert q5.n_broadcast_joins >= 4
    assert q5.python_free and q5.scale_clean()
    assert not q5.has_cartesian
    assert q5.has_pushed_filters

    video = plan_audit(REGISTRY["multimodal_video_decode"].fn(spark, SF_SMOKE))
    assert video.n_python_stages == 1
    assert not video.scale_clean(python_allowed=False)
    assert video.scale_clean(python_allowed=True)

    q6 = REGISTRY["tpch_q6_forecast_revenue"].fn(spark, SF_SMOKE)
    q6.collect()  # codegen spans appear in the AQE plan only post-execution
    scan = plan_audit(q6)
    assert scan.n_wholestage_spans >= 1 and scan.python_free
