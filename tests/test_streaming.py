"""Streaming ↔ batch equivalence: the streaming KV machine and the
windowed aggregation must produce the batch answers when fed the same
data via an availableNow file stream (the reference's differential
pattern applied to the streaming surface)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators.kv import (
    replay_final_state,
    replay_python_model,
)
from mit6_5840_6_824_lab1_mapreduce_spark.streaming import (
    hourly_event_counts_stream,
    kv_state_stream,
)
from mit6_5840_6_824_lab1_mapreduce_spark.streaming.windows import read_events_stream
from mit6_5840_6_824_lab1_mapreduce_spark.queries.events import events_hourly_agg
from mit6_5840_6_824_lab1_mapreduce_spark.queries.kv import ops_from_events

from .conftest import SF_SMOKE
from .test_kv import SCHEMA, _gen_ops


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="mrstream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_available_now(sdf, name: str, tmpdir: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if name == "kvstate" else "append")
        .option("checkpointLocation", f"{tmpdir}/ckpt-{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_kv_stream_matches_batch_replay(spark, tmpdir):
    ops = _gen_ops(300, seed=7)
    batch_df = spark.createDataFrame(ops, schema=SCHEMA)
    batch_df.write.mode("overwrite").parquet(f"{tmpdir}/ops")

    ops_stream = spark.readStream.schema(SCHEMA).parquet(f"{tmpdir}/ops")
    _run_available_now(kv_state_stream(ops_stream), "kvstate", tmpdir)

    got_rows = spark.sql("SELECT key, value FROM kvstate").collect()
    # update-mode may emit a key several times; last emit wins (here:
    # availableNow over one directory → typically one batch).
    got = {r["key"]: r["value"] for r in got_rows}
    want = replay_python_model(ops)
    assert got == want
    # and equals the batch DataFrame replay
    batch = {r["key"]: r["value"] for r in replay_final_state(batch_df).collect()}
    assert got == batch


def test_windowed_stream_matches_batch(spark, tmpdir):
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{tmpdir}/events.parquet")
    ev = read_events_stream(spark, tmpdir)
    _run_available_now(hourly_event_counts_stream(ev), "hourly", tmpdir)

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hourly").collect()
    }
    want_df = events_hourly_agg(spark, SF_SMOKE).select(
        "hour", "event_type", "n_events", "sum_value"
    )
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in want_df.collect()
    }
    # append-mode only emits windows the watermark has passed; with
    # availableNow the final watermark covers all but the trailing
    # window(s) — every emitted window must match batch exactly, and
    # coverage must be nearly complete.
    assert got
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= len(want) - 10
