"""Empty-stream behavior: every streaming entry point fed a source
containing ZERO rows must terminate cleanly with empty (or absent)
output — the streaming twin of the registry-wide degenerate-input
sweep. In production an availableNow catch-up run over an empty
landing directory, or a micro-batch trigger firing on a quiet topic,
is routine; a stateful operator or foreachBatch body that assumes a
non-empty batch fails exactly there."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.streaming import (
    hourly_event_counts_stream,
    kv_state_stream,
)
from mit6_5840_6_824_lab1_mapreduce_spark.streaming.dedup_stream import (
    stream_dedup_ingest,
)
from mit6_5840_6_824_lab1_mapreduce_spark.streaming.merge_sink import (
    stream_merge_to_table,
)
from mit6_5840_6_824_lab1_mapreduce_spark.streaming.windows import user_session_stream

from .test_kv import SCHEMA as KV_SCHEMA

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
DOCS_SCHEMA = "doc_id long, text string"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="mrstream-empty-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _empty_source(spark, tmpdir: str, schema: str):
    """A file-stream source whose directory holds one 0-row parquet
    file — availableNow fires a batch over it, so the stateful
    operators and foreachBatch bodies actually execute on 0 rows
    (an empty DIRECTORY would skip them entirely)."""
    path = f"{tmpdir}/src"
    spark.createDataFrame([], schema).coalesce(1).write.parquet(path)
    return spark.readStream.schema(schema).parquet(path)


def _run(sdf, name: str, tmpdir: str, mode: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"{tmpdir}/ckpt-{name}")
        .trigger(availableNow=True)
        .start()
    )
    try:
        # returns False on timeout without raising — assert it so a
        # hung run fails loudly instead of comparing partial state
        assert q.awaitTermination(120), f"stream {name} did not finish in 120s"
    finally:
        q.stop()
    return q


def test_kv_stream_empty_ops(spark, tmpdir):
    ops = _empty_source(spark, tmpdir, KV_SCHEMA)
    _run(kv_state_stream(ops), "kvempty", tmpdir, "update")
    assert spark.sql("SELECT * FROM kvempty").count() == 0


def test_windowed_stream_empty_events(spark, tmpdir):
    ev = _empty_source(spark, tmpdir, EVENTS_SCHEMA)
    _run(hourly_event_counts_stream(ev), "hourlyempty", tmpdir, "append")
    assert spark.sql("SELECT * FROM hourlyempty").count() == 0


def test_session_stream_empty_events(spark, tmpdir):
    ev = _empty_source(spark, tmpdir, EVENTS_SCHEMA)
    _run(user_session_stream(ev), "sessempty", tmpdir, "append")
    assert spark.sql("SELECT * FROM sessempty").count() == 0


def test_dedup_ingest_empty_batch(spark, tmpdir):
    """foreachBatch ingest on a 0-row micro-batch: must not throw,
    must not corrupt the (empty) index, and a SUBSEQUENT non-empty
    run against the same index/verdict paths must still work."""
    docs = _empty_source(spark, tmpdir, DOCS_SCHEMA)
    index, verd = f"{tmpdir}/idx", f"{tmpdir}/verd"
    q = stream_dedup_ingest(docs, index, verd, checkpoint_dir=f"{tmpdir}/ckpt-d")
    assert q.awaitTermination(120), "dedup ingest stream did not finish in 120s"
    n_verdicts = (
        spark.read.parquet(verd).count() if os.path.exists(verd) else 0
    )
    assert n_verdicts == 0
    # the empty batch must leave the index usable, not half-written
    from mit6_5840_6_824_lab1_mapreduce_spark.streaming.dedup_stream import (
        ingest_batch,
    )

    ingest_batch(
        spark.createDataFrame([(1, "alpha beta gamma delta eps zeta")], DOCS_SCHEMA),
        index,
        verd,
    )
    verdicts = spark.read.parquet(verd).collect()
    assert len(verdicts) == 1 and verdicts[0].verdict == "unique"


def test_merge_sink_empty_batch(spark, tmpdir):
    """MERGE sink on a 0-row micro-batch: clean termination, and the
    target stays usable for the next (non-empty) wave."""
    schema = "event_id long, user_id long, value double, day string"
    stream = _empty_source(spark, tmpdir, schema)
    target = f"{tmpdir}/target"
    q = stream_merge_to_table(
        stream, target, key_cols=["event_id"], partition_col="day",
        checkpoint_dir=f"{tmpdir}/ckpt-m",
    )
    assert q.awaitTermination(120), "merge sink stream did not finish in 120s"
    n_target = spark.read.parquet(target).count() if os.path.exists(target) else 0
    assert n_target == 0
    # follow-up non-empty wave merges cleanly into the same path
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.upsert import merge_upsert

    wave = spark.createDataFrame([(1, 10, 1.5, "2024-01-01")], schema)
    merge_upsert(spark, target, wave, key_cols=["event_id"], partition_col="day")
    assert spark.read.parquet(target).count() == 1
