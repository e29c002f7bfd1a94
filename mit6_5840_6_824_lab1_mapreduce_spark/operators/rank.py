"""Distributed global ordering: rank / running-sum / ntile over a
TOTAL order without an `Exchange SinglePartition`.

`Window.orderBy(...)` with no `partitionBy` plans a single-partition
exchange — one task sorts (and holds) the entire frame. Fine at
sf0.1, fatal at 100 TB: a per-customer aggregate is ~1e9 rows there
and a global vocabulary is larger still. This module restates the
same computation as an order-preserving two-level decomposition:

1. `repartitionByRange(n, *order)` splits the frame into `n`
   CONTIGUOUS ranges of the total order (range partition p holds only
   keys ≤ every key in partition p+1). `n` is passed explicitly, so
   AQE never coalesces the exchange (REPARTITION_BY_NUM origin) and
   `spark_partition_id()` is the range bucket id.
2. A window PARTITIONED by that bucket id computes the local
   row_number / running sums — n parallel sorts of ~1/n of the rows.
3. Per-bucket counts/sums (≤ n rows after map-side combine) are
   expanded into prefix offsets with an explode-over-`sequence(0,n-1)`
   equi-join — n² tiny rows, a hash join, no window and no
   nested-loop join anywhere in the helper. n² is kept harmless by
   capping the DEFAULT n at `_MAX_DEFAULT_PARTS` (4096 → ≤1.7×10⁷
   fan rows); n sizes the per-bucket local sort, not the data.
4. global rank = prefix_count(bucket) + local row_number, and the
   same identity for running sums. Because the order is TOTAL (callers
   must tie-break), the result is bit-identical to the global-window
   form for ANY bucket boundary choice — range sampling, partition
   count, and AQE decisions can move rows between buckets but never
   change a row's global position, so the output is deterministic
   across every perturbation axis the determinism sweep drives.

Running sums must be exact types (decimal / integer): they are
re-associated across buckets, which double addition would not
survive bit-identically.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_P2 = "__gr_p2"
_CNT = "__gr_c"

# Default range-bucket ceiling. The prefix-offset fan-out is n² tiny
# rows, so n inherited from spark.sql.shuffle.partitions must not
# silently follow a 100 TB cluster config into the 10⁵ range (10¹⁰
# fan rows). n is a TASK-SIZING knob, not a data knob: each bucket
# locally sorts ~rows/n, so n=4096 puts a 10⁹-row frame at ~250k rows
# per task (comfortable) while the fan-out stays ≤ 4096² ≈ 1.7×10⁷
# rows — trivial for a hash aggregate. Callers with a bigger frame
# pass ``parts`` explicitly (uncapped, deliberate override). Capping
# is result-neutral: the output is bit-identical for ANY bucket count
# (see module docstring invariant 4).
_MAX_DEFAULT_PARTS = 4096


def _default_bucket_count(spark) -> int:
    """Default range-bucket count when the caller passes no ``parts``.

    ``spark.sql.shuffle.partitions`` may be non-numeric ("auto" under
    some AQE setups) — fall back to the cluster's default parallelism
    rather than throwing from inside a query plan. The environments
    where "auto" actually occurs are Spark Connect sessions, and
    there ``spark.sparkContext`` itself raises (NOT_IMPLEMENTED), so
    the parallelism probe gets its own guard with Spark's classic
    default (200) as the last resort. Always capped at
    ``_MAX_DEFAULT_PARTS`` (the n² offset fan-out must not track a
    large cluster's partition config)."""
    try:
        conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        try:
            conf_parts = spark.sparkContext.defaultParallelism
        except Exception:  # Spark Connect: no sparkContext on the client
            conf_parts = 200
    return max(1, min(conf_parts, _MAX_DEFAULT_PARTS))


def with_global_order(
    df: DataFrame,
    order: Sequence[Column],
    *,
    rn: str | None = None,
    running: Iterable[tuple[str, Column | str]] = (),
    totals: Iterable[tuple[str, Column | str]] = (),
    parts: int | None = None,
) -> DataFrame:
    """Attach global-order statistics to ``df`` without a
    single-partition exchange.

    ``order``     total-order sort expressions (callers MUST include a
                  tie-break; with ties the row_number is as
                  nondeterministic as the global-window form it
                  replaces).
    ``rn``        column name for the global row_number (1-based).
    ``running``   (out_name, col) inclusive running sums over the
                  order — exact (decimal/integer) types only.
    ``totals``    (out_name, col) grand totals (whole-frame sums),
                  attached to every row; use ``F.lit(1)`` for a count.
    ``parts``     range-bucket count; defaults to
                  ``spark.sql.shuffle.partitions`` capped at
                  ``_MAX_DEFAULT_PARTS`` (the n² offset fan-out must
                  not track a large cluster's partition config —
                  explicit ``parts`` is never capped).
    """
    running = [(o, F.col(c) if isinstance(c, str) else c) for o, c in running]
    totals = [(o, F.col(c) if isinstance(c, str) else c) for o, c in totals]
    if parts is not None:
        n = int(parts)
        if n < 1:
            raise ValueError(
                f"with_global_order: parts must be >= 1, got {parts!r}"
            )
    else:
        n = _default_bucket_count(df.sparkSession)

    # PERSIST is load-bearing, not a cache hint: the bucketed frame
    # has two consumers (per-bucket stats and the main join), and the
    # bucket id comes from spark_partition_id(). If the planner ever
    # fails to reuse the range exchange between the two subplan
    # copies (observed: AQE off + autoBroadcastJoinThreshold=-1 on a
    # CHAINED helper — the determinism sweep caught customer_rfm_
    # segments diverging), each copy instantiates its own
    # RangePartitioner whose boundary SAMPLE can differ, so the two
    # paths disagree on which rows are in which bucket and the prefix
    # offsets are wrong. Persisting pins ONE RDD instance — one
    # partitioner, one pid assignment — for every consumer under any
    # config. Lifetime follows the decontam precedent: the driver
    # collects the lazy result, the harnesses clearCache between
    # queries. The cached frame is the slim rank INPUT (an aggregate
    # or a single column), never the corpus.
    d = (
        df.repartitionByRange(n, *order)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )

    # Per-bucket counts and partial sums: ≤ n rows after the combine.
    aggs = [F.count(F.lit(1)).alias(_CNT)]
    aggs += [F.sum(c).alias(f"__gr_r{i}") for i, (_, c) in enumerate(running)]
    aggs += [F.sum(c).alias(f"__gr_t{i}") for i, (_, c) in enumerate(totals)]
    per_bucket = d.groupBy(_PID).agg(*aggs)

    # Prefix offsets: every per-bucket row is fanned out to ALL bucket
    # ids (sequence(0, n-1) is always ascending — n ≥ 1; never emit a
    # start>stop sequence, Spark descends) and re-aggregated, keeping
    # only strictly-earlier buckets in the prefix terms. n² tiny rows,
    # plain hash aggregation + one broadcastable n-row result.
    fan = per_bucket.select(
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias(_P2), "*"
    )
    before = F.col(_PID) < F.col(_P2)
    offaggs = [
        F.coalesce(F.sum(F.when(before, F.col(_CNT))), F.lit(0)).alias("__gr_off")
    ]
    offaggs += [
        F.coalesce(
            F.sum(F.when(before, F.col(f"__gr_r{i}"))), F.lit(0)
        ).alias(f"__gr_roff{i}")
        for i in range(len(running))
    ]
    offaggs += [
        F.sum(F.col(f"__gr_t{i}")).alias(f"__gr_tot{i}")
        for i in range(len(totals))
    ]
    offsets = fan.groupBy(_P2).agg(*offaggs)

    res = d.join(F.broadcast(offsets), F.col(_PID) == F.col(_P2), "inner")
    w = Window.partitionBy(_PID).orderBy(*order)
    if rn is not None:
        res = res.withColumn(rn, F.col("__gr_off") + F.row_number().over(w))
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    for i, (out, c) in enumerate(running):
        res = res.withColumn(out, F.col(f"__gr_roff{i}") + F.sum(c).over(wrun))
    for i, (out, _) in enumerate(totals):
        res = res.withColumn(out, F.col(f"__gr_tot{i}"))

    drop = [_PID, _P2, "__gr_off"]
    drop += [f"__gr_roff{i}" for i in range(len(running))]
    drop += [f"__gr_tot{i}" for i in range(len(totals))]
    return res.drop(*drop)


def ntile_from_rank(n: int, rn: str, total: str) -> Column:
    """SQL-standard ``ntile(n)`` restated from a global row_number and
    the row count — the scalable form of
    ``F.ntile(n).over(Window.orderBy(...))``.

    With c rows, ntile gives the first ``r = c % n`` buckets
    ``q+1 = c div n + 1`` rows and the rest ``q``; the bucket of row
    ``rn`` is therefore piecewise integer arithmetic — exact on both
    engines, no floats. The ELSE branch is reachable only when
    ``rn > r*(q+1)``, which requires ``q ≥ 1`` (when q = 0, r = c and
    the first branch covers every row), so ``greatest(q, 1)`` never
    changes a reachable result — it only keeps the dead branch from
    tripping ANSI division-by-zero in non-lazy evaluators.
    Property-tested against the closed-form definition and against
    Spark's own ntile in tests/test_global_rank.py.
    """
    q = f"(({total}) div {n})"
    r = f"(({total}) % {n})"
    return F.expr(
        f"CAST(CASE WHEN ({rn}) <= {r} * ({q} + 1)"
        f" THEN (({rn}) - 1) div ({q} + 1) + 1"
        f" ELSE {r} + (({rn}) - {r} * ({q} + 1) - 1) div greatest({q}, 1) + 1"
        f" END AS INT)"
    )
