"""Streaming ↔ batch equivalence: the streaming KV machine and the
windowed aggregation must produce the batch answers when fed the same
data via an availableNow file stream (the reference's differential
pattern applied to the streaming surface)."""

from __future__ import annotations

import os
import shutil
import tempfile
import warnings

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
        .outputMode("update" if name.startswith("kv") else "append")
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


def test_kv_stream_prefix_state_matches_batch_get_at_seq(spark, tmpdir):
    """Batch/stream K1 symmetry for the point-in-time read: the
    streaming KV machine's state after consuming the op-log PREFIX
    seq <= S must equal the batch prefix replay that backs
    `kv_get_at_seq` — and after resuming the SAME checkpoint over the
    remainder of the log, the overlaid state must equal the full batch
    replay (checkpoint resume = K4 snapshot/restore of that state)."""
    ops = _gen_ops(300, seed=11)
    mid_seq = ops[len(ops) // 2][0]
    prefix = [o for o in ops if o[0] <= mid_seq]
    rest = [o for o in ops if o[0] > mid_seq]
    spark.createDataFrame(prefix, schema=SCHEMA).write.parquet(f"{tmpdir}/ops/p0")

    def run():
        # foreachBatch sink: the memory sink refuses checkpoint
        # recovery, and resuming the SAME checkpoint is the point here
        emitted: dict[str, str] = {}
        src = spark.readStream.schema(SCHEMA).parquet(f"{tmpdir}/ops/*")
        q = (
            kv_state_stream(src)
            .writeStream.foreachBatch(
                lambda df, bid: emitted.update(
                    {r["key"]: r["value"] for r in df.collect()}
                )
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ckpt-kvprefix")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return emitted

    got_at_s = run()
    batch_at_s = {
        r["key"]: r["value"]
        for r in replay_final_state(
            spark.createDataFrame(prefix, schema=SCHEMA)
        ).collect()
    }
    assert got_at_s == batch_at_s

    # feed the rest of the log through the SAME checkpoint; update mode
    # re-emits only keys the new ops touched — overlaying them on the
    # prefix state must reproduce the full replay
    spark.createDataFrame(rest, schema=SCHEMA).write.parquet(f"{tmpdir}/ops/p1")
    updates = run()
    final = {**got_at_s, **updates}
    batch_full = {
        r["key"]: r["value"]
        for r in replay_final_state(spark.createDataFrame(ops, schema=SCHEMA)).collect()
    }
    assert final == batch_full


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


def test_session_stream_matches_batch(spark, tmpdir):
    from mit6_5840_6_824_lab1_mapreduce_spark.streaming import user_session_stream

    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{tmpdir}/events.parquet")
    ev = read_events_stream(spark, tmpdir)
    _run_available_now(user_session_stream(ev), "sessions", tmpdir)

    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # batch twin: session_window is also a batch operator — same
    # grouping run over the static table is the oracle
    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy(F.col("user_id"), F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )
    want = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got
    for k, v in got.items():
        assert want[k] == v, k
    # append mode withholds only sessions the final watermark hasn't
    # closed — near-complete coverage on a bounded replay
    assert len(got) >= len(want) - len({u for (u, _s) in want})


def test_watermark_closes_windows_exactly_once(spark, tmpdir):
    """The watermark contract that append mode actually guarantees
    (verified empirically on this Spark version): data no later than
    the watermark is aggregated; each window is emitted EXACTLY once,
    only after the watermark passes its end; window state is evicted
    afterwards (bounded memory). Note the watermark is a state-bound
    + completeness contract, NOT a precise drop filter — data later
    than the watermark MAY still be merged while the window's state
    happens to be live."""
    import datetime as dt
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mit6_5840_6_824_lab1_mapreduce_spark.streaming import (
        hourly_event_counts_stream,
    )

    def write_file(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    T = dt.datetime(2024, 6, 1)
    write_file(
        f"{tmpdir}/b1.parquet", [(1, T.replace(hour=12)), (2, T.replace(hour=13))]
    )
    _time.sleep(1.1)  # file-stream orders batches by mtime
    # 15:30 is 1.5h behind 17:00 — within the 2h watermark, must count
    write_file(
        f"{tmpdir}/b2.parquet",
        [(3, T.replace(hour=17)), (4, T.replace(hour=15, minute=30))],
    )
    _time.sleep(1.1)
    write_file(f"{tmpdir}/b3.parquet", [(5, T.replace(hour=21))])

    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(tmpdir)
    )
    emitted: list[tuple[str, int]] = []
    q = (
        hourly_event_counts_stream(ev, watermark="2 hours")
        .writeStream.foreachBatch(
            lambda df, bid: emitted.extend(
                (r["hour"], r["n_events"]) for r in df.collect()
            )
        )
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt-late")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    hours = [h for h, _n in emitted]
    # exactly-once: no window appears twice across all micro-batches
    assert len(hours) == len(set(hours))
    got = dict(emitted)
    # completeness: every window the final watermark (19:00) passed
    # was emitted, including the late-but-within-watermark 15:30 event
    assert got["2024-06-01 12:00:00"] == 1
    assert got["2024-06-01 13:00:00"] == 1
    assert got["2024-06-01 15:00:00"] == 1
    assert got["2024-06-01 17:00:00"] == 1
    # the still-open 21:00 window must NOT have been emitted
    assert "2024-06-01 21:00:00" not in got
    # bounded state: only the open window survives in the state store
    final_state = q.recentProgress[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_state == 1


@pytest.mark.parametrize("trial", (1, 2, 3))
def test_stream_restart_resumes_from_checkpoint(spark, tmpdir, trial):
    """K4 durability analog: a restarted stream with the same
    checkpoint processes only NEW files — no reprocessing, no
    double-counting (exactly-once across restarts).

    Looped 3x (fresh tmpdir per trial): the reference catches flaky
    races by re-running its whole suite in a loop
    (/root/reference/src/main/test-mr-many.sh:15-22); this restates
    that discipline for the checkpoint-recovery race."""
    import pyspark.sql.functions as SF

    df0 = spark.range(5).select(SF.col("id").cast("string").alias("key"),
                                SF.lit("1").alias("value"))
    df0.write.parquet(f"{tmpdir}/in/batch0")

    def run_once():
        src = spark.readStream.schema("key string, value string").parquet(
            f"{tmpdir}/in/*"
        )
        agg = src.groupBy("key").agg(SF.count("*").alias("n"))
        q = (
            agg.writeStream.format("memory")
            .queryName("restarted")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmpdir}/ckpt-restart")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    q1 = run_once()
    n1 = q1.recentProgress[-1]["numInputRows"] if q1.recentProgress else 0
    assert n1 == 5

    # restart with one new file: only its rows are read
    df1 = spark.range(3).select(SF.col("id").cast("string").alias("key"),
                                SF.lit("1").alias("value"))
    df1.write.parquet(f"{tmpdir}/in/batch1")
    q2 = run_once()
    read_rows = sum(p["numInputRows"] for p in q2.recentProgress)
    assert read_rows == 3  # batch0 NOT reprocessed

    got = {r["key"]: r["n"] for r in spark.sql("SELECT * FROM restarted").collect()}
    assert got["0"] == 2 and got["4"] == 1  # counts reflect both runs exactly once


def test_stream_stream_interval_join_matches_batch(spark, tmpdir):
    """Stream-stream inner join with event-time interval condition and
    watermarks on both sides (the stateful join operator) must equal
    the same join run in batch."""
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{tmpdir}/events.parquet")

    def sides(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        pur = df.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        return clicks, pur

    cond = F.expr(
        "c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"
    )

    ev_s = read_events_stream(spark, tmpdir)
    cs, ps = sides(ev_s)
    joined_s = cs.withWatermark("c_ts", "1 hour").join(
        ps.withWatermark("p_ts", "1 hour"), cond
    )
    q = (
        joined_s.select("c_id", "p_id")
        .writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt-ssjoin")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["c_id"], r["p_id"]) for r in spark.sql("SELECT * FROM ssjoin").collect()
    }

    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

    cb, pb = sides(table(spark, SF_SMOKE, "events"))
    want = {(r["c_id"], r["p_id"]) for r in cb.join(pb, cond).select("c_id", "p_id").collect()}
    assert got == want
    assert want  # non-vacuous


def test_streaming_dedup_within_watermark(spark, tmpdir):
    """Streaming dropDuplicatesWithinWatermark: replayed duplicates
    (same event_id in later files) are suppressed exactly-once."""
    import pyspark.sql.functions as SF

    base = spark.range(10).select(
        SF.col("id").alias("event_id"),
        SF.lit("2024-06-01 12:00:00").cast("timestamp").alias("ts"),
    )
    base.write.parquet(f"{tmpdir}/in/b0")
    base.where(SF.col("event_id") < 4).write.parquet(f"{tmpdir}/in/b1")  # dupes

    src = spark.readStream.schema("event_id long, ts timestamp").parquet(
        f"{tmpdir}/in/*"
    )
    dedup = src.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt-sdedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM sdedup").collect()
    ids = [r["event_id"] for r in rows]
    assert sorted(ids) == list(range(10))  # each id exactly once


def test_streaming_corpus_annotation_matches_batch(spark, tmpdir):
    """The cleaning pipeline's per-document stages (quality score +
    language ID) are stateless projections, so they must run
    UNCHANGED on a streaming DataFrame and agree with batch row for
    row — the streaming-ingest half of pipeline_clean_corpus. (The
    dedup stages are deliberately batch: they need corpus-global
    state.)"""
    from mit6_5840_6_824_lab1_mapreduce_spark.queries.text_metrics import (
        language_frame,
        quality_frame,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.write.mode("overwrite").parquet(f"{tmpdir}/docs")
    n_docs = docs.count()

    for tag, frame, cols in (
        ("qual", quality_frame, ["doc_id", "quality_score"]),
        ("lang", language_frame, ["doc_id", "pred_lang"]),
    ):
        src = spark.readStream.schema(docs.schema).parquet(f"{tmpdir}/docs")
        q = (
            frame(src)
            .select(*cols)
            .writeStream.format("memory")
            .queryName(f"annot_{tag}")
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/ckpt-{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.sql(f"SELECT * FROM annot_{tag}").collect()}
        want = {tuple(r) for r in frame(docs).select(*cols).collect()}
        assert got == want and len(got) == n_docs, tag


@pytest.mark.perf
def test_kv_stream_throughput_meets_reference_floor(spark, tmpdir):
    """Throughput restatement of the reference's lab-3 speed gate
    (/root/reference/src/kvraft/test_test.go:396,418-426): 1000
    Appends must sustain >= 30 ops/s — i.e. finish within
    1000 x 33.3 ms. The streaming KV machine replays a 1000-Append op
    log through availableNow micro-batches; wall-clock for the whole
    run (state store updates included) must beat the reference's
    per-op latency ceiling. A one-batch warm-up stream runs first so
    JVM/Arrow startup — a fixed cost the reference's heartbeat world
    has no analog for — isn't billed to the ops.

    The wall-clock assertion is HARD only under SPARK_GRAFT_PERF=1
    (the perf lane / bench discipline); ordinary correctness runs on
    a contended host degrade it to a warning (advisor r05) — the
    state-equality check always enforces."""
    import time

    n_ops = 1000
    ops = [
        (i, i % 5, i // 5, "Append", f"k{i % 8}", f"v{i}")
        for i in range(n_ops)
    ]
    batch_df = spark.createDataFrame(ops, schema=SCHEMA)
    batch_df.write.mode("overwrite").parquet(f"{tmpdir}/ops-speed")

    # Warm-up: tiny op log through a throwaway checkpoint.
    warm = spark.createDataFrame(ops[:10], schema=SCHEMA)
    warm.write.mode("overwrite").parquet(f"{tmpdir}/ops-warm")
    warm_stream = spark.readStream.schema(SCHEMA).parquet(f"{tmpdir}/ops-warm")
    _run_available_now(kv_state_stream(warm_stream), "kvspeedwarm", tmpdir)

    ops_stream = spark.readStream.schema(SCHEMA).parquet(f"{tmpdir}/ops-speed")
    t0 = time.perf_counter()
    _run_available_now(kv_state_stream(ops_stream), "kvspeed", tmpdir)
    elapsed = time.perf_counter() - t0

    budget = n_ops * (100.0 / 3000.0)  # 33.3 ms/op, the reference ceiling
    if os.environ.get("SPARK_GRAFT_PERF", "") == "1":
        assert elapsed <= budget, (
            f"{n_ops} streamed Appends took {elapsed:.1f}s — slower than "
            f"the reference's 33.3 ms/op floor ({budget:.1f}s)"
        )
    elif elapsed > budget:
        warnings.warn(
            f"KV stream throughput floor missed on this host: "
            f"{elapsed:.1f}s > {budget:.1f}s for {n_ops} ops (not enforced "
            f"without SPARK_GRAFT_PERF=1)",
            stacklevel=1,
        )
    # and the state is right: matches the exact batch replay
    got = {
        r["key"]: r["value"]
        for r in spark.sql("SELECT key, value FROM kvspeed").collect()
    }
    want = {
        r["key"]: r["value"] for r in replay_final_state(batch_df).collect()
    }
    assert got == want
