"""The generic two-phase MapReduce dataflow engine, Spark-first.

Reference semantics (SURVEY §2.2, reference src/mr/worker.go):
  - map UDF  ``map_fn(filename, contents) -> [(key, value)]``  (C1)
  - FNV-1a hash shuffle into ``n_reduce`` buckets                (C2-C4)
  - reduce UDF ``reduce_fn(key, [values]) -> value`` per key     (C5)
  - output lines ``"key value"``, one partition per bucket       (S4)

Spark mapping: one lineage —
``wholeTextFiles → flatMap → partitionBy(fnv1a) → in-partition hash
group → reduce``. Scheduling, the map→reduce barrier, straggler
re-execution and atomic output commit (reference C7-C10, S5) are the
Spark scheduler / output committer; no code needed here.

Scale note: the reference holds each reduce bucket fully in memory
(worker.go:129-148). ``run_job`` keeps those semantics for arbitrary
UDFs; for associative reduces use ``run_job_combining`` which maps to
``reduceByKey`` (map-side combine — the 100 TB-safe path, since no
per-key value list is ever materialized).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Iterator

from pyspark import RDD, SparkContext
from pyspark.sql import SparkSession

from ..functions.hashing import reduce_bucket

MapFn = Callable[[str, str], list[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]


def whole_text_input(
    spark: SparkSession, path_glob: str, min_partitions: int | None = None
) -> RDD:
    """S1: one record per file — ``(filename, entire contents)``.

    Matches reference src/mr/worker.go:73-84 (whole file as one string).
    """
    sc: SparkContext = spark.sparkContext
    return sc.wholeTextFiles(path_glob, minPartitions=min_partitions)


def _group_partition(
    rows: Iterator[tuple[str, str]], reduce_fn: ReduceFn
) -> Iterator[tuple[str, str]]:
    # Reference C4: hash grouping within one reduce bucket (no sort),
    # whole bucket in memory — worker.go:129-148.
    groups: dict[str, list[str]] = {}
    for k, v in rows:
        groups.setdefault(k, []).append(v)
    for k, vs in groups.items():
        yield k, reduce_fn(k, vs)


def run_job(
    inputs: RDD | Iterable[tuple[str, str]],
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    n_reduce: int = 10,
    spark: SparkSession | None = None,
) -> RDD:
    """Distributed MapReduce job; returns ``RDD[(key, out_value)]``
    partitioned into ``n_reduce`` buckets by the reference's FNV-1a
    partitioner (bucket parity with mr-out-<r> files)."""
    if not isinstance(inputs, RDD):
        assert spark is not None, "need a SparkSession to parallelize inputs"
        inputs = spark.sparkContext.parallelize(list(inputs))
    pairs = inputs.flatMap(lambda fc: map_fn(fc[0], fc[1]))
    bucketed = pairs.partitionBy(n_reduce, lambda k: reduce_bucket(k, n_reduce))
    return bucketed.mapPartitions(
        lambda rows: _group_partition(rows, reduce_fn), preservesPartitioning=True
    )


def run_job_combining(
    inputs: RDD,
    map_fn: MapFn,
    merge_fn: Callable[[str, str], str],
    n_reduce: int = 10,
) -> RDD:
    """Associative-reduce fast path: map-side combine via reduceByKey.

    The reference ships one ``(word, "1")`` pair per occurrence with no
    combiner (wc.go:26-31); this is the Spark improvement that makes the
    same job viable at 100 TB (shuffle volume ∝ distinct keys, not
    occurrences).
    """
    pairs = inputs.flatMap(lambda fc: map_fn(fc[0], fc[1]))
    return pairs.reduceByKey(merge_fn, numPartitions=n_reduce)


def run_sequential(
    inputs: Iterable[tuple[str, str]], map_fn: MapFn, reduce_fn: ReduceFn
) -> list[tuple[str, str]]:
    """The sequential oracle (reference src/main/mrsequential.go:25-87):
    all map output in memory, global sort by key, reduce over key-runs.
    Used as the golden generator in differential tests (SURVEY §5.1)."""
    intermediate: list[tuple[str, str]] = []
    for filename, contents in inputs:
        intermediate.extend(map_fn(filename, contents))
    intermediate.sort(key=lambda kv: kv[0])
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(intermediate):
        j = i
        values = []
        while j < len(intermediate) and intermediate[j][0] == intermediate[i][0]:
            values.append(intermediate[j][1])
            j += 1
        out.append((intermediate[i][0], reduce_fn(intermediate[i][0], values)))
        i = j
    return out
