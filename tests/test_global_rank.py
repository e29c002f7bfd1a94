"""operators/rank.py: the distributed restatement of global-window
rank / running sums / ntile must be BIT-IDENTICAL to the
single-partition `Window.orderBy` forms it replaces (six registered
queries were rewritten onto it in r09), for any partition count, on
ties, NULL keys, and empty frames — and its own plan must be free of
the single-partition window exchange it exists to eliminate."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators.rank import (
    ntile_from_rank,
    with_global_order,
)
from mit6_5840_6_824_lab1_mapreduce_spark.plans import plan_audit


@pytest.fixture(scope="module")
def frame(spark):
    """Ties on the primary key (including a NULL class) force the
    rank to depend on the tie-break, and ties straddle range-bucket
    boundaries at every partition count."""
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.choice([None, 1, 2, 3, 5, 5, 5, 9]), rng.randrange(1000))
        for i in range(5000)
    ]
    return spark.createDataFrame(rows, "id long, k int, v long")


def _order():
    # Column construction needs an active SparkContext - keep it lazy.
    return [F.desc_nulls_last("k"), F.asc("id")]


def _reference(df):
    w = Window.orderBy(*_order())
    return df.withColumn("nt", F.ntile(7).over(w)).select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.count("*").over(Window.partitionBy()).alias("c"),
        F.sum("v").over(Window.partitionBy()).alias("tv"),
        "nt",
    )


def _distributed(df, parts=None):
    return (
        with_global_order(
            df,
            _order(),
            rn="rn",
            running=[("cum", "v")],
            totals=[("c", F.lit(1)), ("tv", "v")],
            parts=parts,
        )
        .withColumn("nt", ntile_from_rank(7, "rn", "c"))
        .select("id", "rn", "cum", "c", "tv", "nt")
    )


@pytest.mark.parametrize("parts", [None, 1, 3, 32])
def test_matches_global_window_exactly(spark, frame, parts):
    ref = _reference(frame)
    got = _distributed(frame, parts)
    assert ref.exceptAll(got).count() == 0
    assert got.exceptAll(ref).count() == 0


def test_empty_frame(spark, frame):
    out = _distributed(frame.where(F.lit(False)))
    assert out.count() == 0
    assert {"rn", "cum", "c", "tv", "nt"} <= set(out.columns)


def test_no_single_partition_window_in_plan(spark, frame):
    audit = plan_audit(_distributed(frame))
    assert audit.n_single_partition_windows == 0
    # ... while the reference form is exactly what the audit flags —
    # proving the detector sees the class this operator eliminates.
    assert plan_audit(_reference(frame)).n_single_partition_windows > 0


def test_reference_rank_only_detected(spark, frame):
    """row_number alone (no running sums) is also detected."""
    ref = frame.select(F.row_number().over(Window.orderBy(*_order())).alias("r"))
    assert plan_audit(ref).n_single_partition_windows > 0


def _true_ntile(c: int, n: int) -> list[int]:
    """SQL-standard definition: first c % n buckets get c div n + 1
    rows, the rest get c div n."""
    q, r = divmod(c, n)
    out: list[int] = []
    for b in range(n):
        out += [b + 1] * (q + 1 if b < r else q)
    return out


def _formula_ntile(rn: int, c: int, n: int) -> int:
    """Pure-Python replay of ntile_from_rank's CASE arithmetic."""
    q, r = divmod(c, n)
    if rn <= r * (q + 1):
        return (rn - 1) // (q + 1) + 1
    return r + (rn - r * (q + 1) - 1) // max(q, 1) + 1


@settings(max_examples=300, deadline=None)
@given(c=st.integers(0, 10_000), n=st.integers(1, 64))
def test_ntile_formula_matches_sql_definition(c, n):
    expect = _true_ntile(c, n)
    assert [_formula_ntile(rn, c, n) for rn in range(1, c + 1)] == expect


def test_ntile_expr_matches_spark_ntile(spark, frame):
    """The Spark-side CASE expression (not just its Python replay)
    agrees with F.ntile for several bucket counts on the tie/NULL
    frame."""
    w = Window.orderBy(*_order())
    df = frame.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("c"),
        *[F.ntile(n).over(w).alias(f"nt{n}") for n in (2, 4, 7, 13)],
    )
    checks = [
        F.sum(
            (ntile_from_rank(n, "rn", "c") != F.col(f"nt{n}")).cast("int")
        ).alias(f"bad{n}")
        for n in (2, 4, 7, 13)
    ]
    row = df.agg(*checks).collect()[0]
    assert all(row[f"bad{n}"] == 0 for n in (2, 4, 7, 13)), row


def test_chained_ranks_stable_without_aqe_or_broadcast(spark, frame):
    """Regression pin for the r09 determinism-sweep catch: CHAINED
    helper calls diverged under aqe=false + autoBroadcastJoinThreshold
    =-1 — without exchange reuse, the two subplan copies of a range
    exchange each instantiate their own RangePartitioner, whose
    boundary samples can differ, de-synchronizing spark_partition_id
    between the offsets path and the main path. The load-bearing
    persist() in with_global_order pins one RDD instance (one
    partitioner) for every consumer; this test replays the rfm shape
    (two chained ranks over different orders) at the failing config
    and demands bit-equality with the global-window reference."""
    w1 = Window.orderBy(*_order())
    w2 = Window.orderBy(F.asc("v"), F.asc("id"))
    ref = (
        frame.withColumn("r1", F.row_number().over(w1))
        .withColumn("r2", F.row_number().over(w2))
        .select("id", "r1", "r2")
    )
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.catalog.clearCache()
        got = with_global_order(
            with_global_order(frame, _order(), rn="r1"),
            [F.asc("v"), F.asc("id")],
            rn="r2",
        ).select("id", "r1", "r2")
        assert ref.exceptAll(got).count() == 0
        assert got.exceptAll(ref).count() == 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.catalog.clearCache()


def test_default_parts_capped_against_cluster_configs(spark, frame):
    """The offsets fan-out is n² rows in the bucket count, so the
    DEFAULT n must not track a large cluster's
    spark.sql.shuffle.partitions (10⁵ partitions → 10¹⁰ fan rows).
    Pin: config above the cap → plan buckets at _MAX_DEFAULT_PARTS;
    explicit ``parts`` is a deliberate override and stays uncapped.
    The cap is result-neutral (bit-identity holds for any bucketing —
    test_matches_global_window_exactly), so only the plan is checked."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.rank import (
        _MAX_DEFAULT_PARTS,
    )

    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, str(_MAX_DEFAULT_PARTS * 2))
        capped = with_global_order(frame, _order(), rn="rn")
        plan = capped._jdf.queryExecution().executedPlan().toString()
        # Only the RANGE exchange carries the bucket count; other
        # exchanges in the same plan legitimately use the session's
        # (uncapped) shuffle partition config.
        rp = [ln for ln in plan.splitlines() if "rangepartitioning" in ln.lower()]
        assert rp, "no range exchange in the distributed-rank plan"
        assert all(str(_MAX_DEFAULT_PARTS) in ln for ln in rp), (
            f"default bucket count did not cap at {_MAX_DEFAULT_PARTS}: {rp}"
        )
        explicit = with_global_order(frame, _order(), rn="rn", parts=5000)
        eplan = explicit._jdf.queryExecution().executedPlan().toString()
        erp = [ln for ln in eplan.splitlines() if "rangepartitioning" in ln.lower()]
        assert erp and all("5000" in ln for ln in erp), (
            "explicit parts must never be capped"
        )
    finally:
        spark.conf.set(key, saved)
        spark.catalog.clearCache()


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from([None, 1, 2, 5]), st.integers(0, 9)),
        max_size=24,
    ),
    parts=st.sampled_from([1, 7, 64]),
)
def test_tiny_frames_match_window_form(spark, rows, parts):
    """Frames SMALLER than the bucket count (empty range buckets —
    most pids get offset rows but no data rows), single rows, and
    all-ties frames must still be bit-identical to the window form.
    The 5000-row battery never exercises buckets > rows; this pins
    that regime (plus c=0..24 against parts up to 64)."""
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)] or [],
        "id long, k int, v long",
    )
    ref = {tuple(r) for r in _reference(df).collect()}
    got = {tuple(r) for r in _distributed(df, parts).collect()}
    assert got == ref


def test_detector_catches_exchange_free_global_windows(spark, frame):
    """Review r09: the original detector required an adjacent
    `Exchange SinglePartition`, which the planner OMITS when the
    window's child already satisfies single-partition distribution —
    so the hygiene gate could be bypassed. The detector now reads the
    Window node's own render; pin the three bypass shapes plus the
    two-bracket false-positive class it must NOT flag (a partitioned
    window with no ORDER BY also prints two bracket groups)."""
    small = frame.limit(50)
    over_coalesce = small.coalesce(1).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    over_topk = (
        small.orderBy("id").limit(5)
        .withColumn("r", F.row_number().over(Window.orderBy("id")))
    )
    chained = small.withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    ).withColumn("s", F.row_number().over(Window.orderBy(F.desc("id"))))
    whole_frame_agg = small.withColumn(
        "t", F.sum("v").over(Window.partitionBy())
    )
    assert plan_audit(over_coalesce).n_single_partition_windows == 1
    assert plan_audit(over_topk).n_single_partition_windows == 1
    assert plan_audit(chained).n_single_partition_windows == 2
    assert plan_audit(whole_frame_agg).n_single_partition_windows == 1
    # Partitioned, unordered window (Window [exprs], [partition]) —
    # two bracket groups but NOT a global window.
    part_no_order = small.withColumn(
        "n", F.count("*").over(Window.partitionBy("k"))
    )
    assert plan_audit(part_no_order).n_single_partition_windows == 0


def test_parts_validation_and_non_integer_config_fallback(spark, frame):
    """Config-read hardening (r09 verdict watch item): parts=0 /
    negative must raise — NOT be silently treated as "unset" — and a
    non-integer spark.sql.shuffle.partitions (e.g. "auto" under some
    AQE setups) must fall back to defaultParallelism capped at
    _MAX_DEFAULT_PARTS instead of throwing mid-plan."""
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.rank import (
        _MAX_DEFAULT_PARTS,
    )

    from types import SimpleNamespace

    from mit6_5840_6_824_lab1_mapreduce_spark.operators.rank import (
        _default_bucket_count,
    )

    for bad in (0, -3):
        with pytest.raises(ValueError, match="parts must be >= 1"):
            with_global_order(frame, _order(), rn="rn", parts=bad)

    # Spark 4 validates conf.set eagerly, so the "auto" scenario can't
    # be injected into a live session — unit-test the helper's fallback
    # with a stub session instead.
    def _stub(conf_value, parallelism):
        return SimpleNamespace(
            conf=SimpleNamespace(get=lambda _k: conf_value),
            sparkContext=SimpleNamespace(defaultParallelism=parallelism),
        )

    assert _default_bucket_count(_stub("auto", 32)) == 32
    assert _default_bucket_count(_stub(None, 16)) == 16
    assert _default_bucket_count(_stub("auto", 10**6)) == _MAX_DEFAULT_PARTS
    assert _default_bucket_count(_stub("200", 32)) == 200
    assert _default_bucket_count(_stub("0", 32)) == 1  # never below 1

    # Spark Connect shape (r10 self-review): "auto" config AND no
    # sparkContext on the client — the helper must land on the classic
    # 200 default, not raise from inside plan construction.
    class _ConnectStub:
        conf = SimpleNamespace(get=lambda _k: "auto")

        @property
        def sparkContext(self):
            raise NotImplementedError("[NOT_IMPLEMENTED] sparkContext")

    assert _default_bucket_count(_ConnectStub()) == 200
    # Live session: the numeric config path still drives the plan.
    assert _default_bucket_count(spark) == max(
        1,
        min(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            _MAX_DEFAULT_PARTS,
        ),
    )
