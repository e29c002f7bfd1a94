"""The reference's harness probes (SURVEY §2.3 A3/A4/A6-A8, §5.4)
restated as Spark engine invariants:

- jobcount: each input partition's map UDF runs effectively once in a
  failure-free job (accumulator delta)
- crash: a task that fails on first attempt succeeds via retry with
  unchanged output (task re-execution = reference worker re-dispatch)
- early_exit: committed output never contains partial task output
  (FileOutputCommitter atomicity, reference atomicWriteFile S5)
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

from mit6_5840_6_824_lab1_mapreduce_spark.operators import mrapps
from mit6_5840_6_824_lab1_mapreduce_spark.operators.mapreduce import run_job
from mit6_5840_6_824_lab1_mapreduce_spark.sources.text import write_text_output

CORPUS = [(f"f{i}.txt", f"alpha beta gamma delta {i} " * 20) for i in range(8)]


def test_jobcount_exactly_once_map(spark):
    """A3: 8 inputs → exactly 8 map invocations absent failures."""
    acc = spark.sparkContext.accumulator(0)

    def counting_map(filename, contents):
        acc.add(1)
        return mrapps.wc_map(filename, contents)

    rdd = spark.sparkContext.parallelize(CORPUS, 8)
    run_job(rdd, counting_map, mrapps.wc_reduce, n_reduce=4).collect()
    assert acc.value == 8


def test_crash_retry_same_output(spark):
    """A4/A5: a map attempt that dies once is re-executed; final
    output equals the no-crash golden run."""
    golden = sorted(
        run_job(CORPUS, mrapps.file_meta_map, mrapps.sorted_join_reduce, n_reduce=4, spark=spark).collect()
    )

    marker = os.path.join(tempfile.gettempdir(), "mr-crash-once-marker")
    if os.path.exists(marker):
        os.unlink(marker)

    def crashy_map(filename, contents):
        # first attempt anywhere dies; retries succeed (idempotent
        # re-execution, reference coordinator.go:122-128 analog)
        if filename == "f3.txt" and not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected crash (first attempt)")
        return mrapps.file_meta_map(filename, contents)

    rdd = spark.sparkContext.parallelize(CORPUS, 8)
    got = sorted(run_job(rdd, crashy_map, mrapps.sorted_join_reduce, n_reduce=4).collect())
    assert got == golden
    os.unlink(marker)


def test_output_commit_atomicity(spark):
    """A8: the output directory contains only committed files — no
    temporary/partial attempt files after job completion."""
    out = tempfile.mkdtemp(prefix="mr-out-")
    shutil.rmtree(out)
    result = run_job(CORPUS, mrapps.wc_map, mrapps.wc_reduce, n_reduce=3, spark=spark)
    write_text_output(result, out, n_reduce=3)
    files = sorted(os.path.basename(p) for p in glob.glob(f"{out}/*"))
    assert "_SUCCESS" in files
    parts = [f for f in files if f.startswith("part-")]
    assert len(parts) == 3
    assert not any(f.endswith((".tmp", "._COPYING_")) or "_temporary" in f for f in files)
    # committed content is complete and stable across re-reads
    lines1 = sorted(spark.read.text(out).collect())
    lines2 = sorted(spark.read.text(out).collect())
    assert lines1 == lines2 and len(lines1) > 0
    shutil.rmtree(out)


@pytest.mark.parametrize("n_parts", [2, 4])
def test_task_parallelism(spark, n_parts):
    """A6/A7: ≥2 tasks execute (partition count governs concurrency;
    local[4] runs them simultaneously — the scheduling is Spark's)."""
    rdd = spark.sparkContext.parallelize(CORPUS, n_parts)
    pids = rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert len(pids) == n_parts
