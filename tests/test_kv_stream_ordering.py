"""KV stream ordering pins (round 6).

The streaming KV machine's contract (streaming/kv_stream.py module
docstring): within a micro-batch ops apply in ``seq`` order; across
batches ordering is the source's job (the Raft-log analog). Two
halves of that contract were asserted only implicitly:

- WITHIN-batch: the generated op logs happen to be written in seq
  order, so the ``rows.sort`` in ``_apply_ops`` was never load-bearing
  in a test. Shuffle the physical row order and the result must still
  equal the batch replay.
- ACROSS-batch duplicate suppression: a clerk retry can land in a
  LATER micro-batch than the original; the per-client high-water id
  persisted in the state store must suppress it there too (the
  within-batch path alone would not).
"""

from __future__ import annotations

import os
import random
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.operators.kv import replay_python_model
from mit6_5840_6_824_lab1_mapreduce_spark.streaming import kv_state_stream

from .test_kv import SCHEMA, _gen_ops


def _run_stream(spark, src: str, workdir: str, name: str, per_file: bool = False):
    reader = spark.readStream.schema(SCHEMA)
    if per_file:
        reader = reader.option("maxFilesPerTrigger", 1)
    q = (
        kv_state_stream(reader.parquet(src))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{workdir}/ckpt-{name}")
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout WITHOUT raising —
        # asserting it turns a hung run into a clear failure instead
        # of a misleading partial-state diff (round-6 review).
        assert q.awaitTermination(120), f"stream {name} did not finish in 120s"
    finally:
        q.stop()
    return {
        r.key: r.value for r in spark.sql(f"SELECT key, value FROM {name}").collect()
    }


def _model_state(ops: list[tuple], got: dict[str, str]) -> tuple[dict, dict]:
    """(filtered stream output, model state): the stream emits a row
    for EVERY touched key including Get-only keys (value ''), while
    the model omits never-written keys — drop those rows unless the
    model really expects an empty value."""
    want = replay_python_model(ops)
    return {k: v for k, v in got.items() if v != "" or k in want}, want


def test_kv_stream_shuffled_batch_matches_replay(spark, tmp_path):
    """One micro-batch whose PHYSICAL row order is shuffled: the
    in-batch seq sort must reproduce the seq-ordered replay exactly
    (Appends are order-sensitive, so a missing sort shows)."""
    tmpdir = str(tmp_path)
    ops = _gen_ops(300, seed=11)
    shuffled = ops[:]
    random.Random(99).shuffle(shuffled)
    spark.createDataFrame(shuffled, SCHEMA).coalesce(1).write.parquet(f"{tmpdir}/ops")
    raw = _run_stream(spark, f"{tmpdir}/ops", tmpdir, "kvshuffled")
    got, want = _model_state(ops, raw)
    assert got == want


def test_kv_stream_cross_batch_duplicate_suppressed(spark, tmp_path):
    """A clerk retry landing in a LATER micro-batch must be suppressed
    by the high-water id persisted in the state store — the value must
    not double-append, and a FRESH append after the replay still
    lands."""
    tmpdir = str(tmp_path)
    b0 = [
        (0, 1, 0, "Put", "k", "x"),
        (1, 1, 1, "Append", "k", "y"),  # original commit of req 1
    ]
    b1 = [
        (2, 1, 1, "Append", "k", "y"),  # clerk retry, next batch
        (3, 1, 2, "Append", "k", "z"),  # fresh op after the retry
    ]
    src = f"{tmpdir}/src"
    os.makedirs(src)
    for i, rows in enumerate([b0, b1]):
        f = f"{src}/batch_{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(f)
        for name in os.listdir(f):  # stable mtimes -> stable file order
            os.utime(os.path.join(f, name), (1000 + i, 1000 + i))
    got = _run_stream(spark, f"{src}/batch_*", tmpdir, "kvdup", per_file=True)
    assert got == {"k": "xyz"}  # not 'xyyz'


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_cuts=st.integers(min_value=0, max_value=4),
    shuffle_seed=st.integers(min_value=0, max_value=10_000),
)
def test_kv_stream_random_batching_matches_model(
    spark, tmp_path_factory, seed, n_cuts, shuffle_seed
):
    """Property form of the two pins above: ANY contiguous batching of
    an ordered op log (the contract's cross-batch guarantee), with
    rows arbitrarily shuffled WITHIN each batch, must stream to the
    exact final state of the pure-Python reference model — retries
    falling on either side of a batch cut included."""
    ops = _gen_ops(120, seed=seed)
    rng = random.Random(shuffle_seed)
    cuts = sorted(rng.sample(range(1, len(ops)), min(n_cuts, len(ops) - 1)))
    batches = [
        ops[lo:hi] for lo, hi in zip([0] + cuts, cuts + [len(ops)])
    ]
    d = str(tmp_path_factory.mktemp("kvrand"))
    src = f"{d}/src"
    os.makedirs(src)
    for i, rows in enumerate(batches):
        rows = rows[:]
        rng.shuffle(rows)  # within-batch order is arbitrary
        f = f"{src}/batch_{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(f)
        for name in os.listdir(f):
            os.utime(os.path.join(f, name), (1000 + i, 1000 + i))
    got = _run_stream(spark, f"{src}/batch_*", d, f"kvrand{seed}_{n_cuts}_{shuffle_seed}",
                      per_file=True)
    got, want = _model_state(ops, got)
    assert got == want
