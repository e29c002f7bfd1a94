"""Parquet table loaders for the driver's synthetic star schema.

Parquet + DataFrame reads give predicate pushdown and column pruning
for free (verify via ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# Conservative stand-in for spark.sql.files.maxPartitionBytes (128 MiB
# default): used only to ESTIMATE how many splits the scan already
# yields, so the documents repartition guard can stay pure-DataFrame
# (no .rdd handle) without shuffling a corpus whose big files would
# split into enough partitions on their own.
_SPLIT_BYTES = 128 * 1024 * 1024


def _estimated_scan_partitions(files: list[str]) -> int:
    """Lower-bound estimate of scan partitions: one per file plus one
    per additional split of a large file. Sizes are only statable for
    local paths; remote schemes fall back to the file count (still a
    valid lower bound — splitting only adds partitions)."""
    est = 0
    for f in files:
        path = f.removeprefix("file:")
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0
        est += 1 + size // _SPLIT_BYTES
    return est

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Scan-spread keys (r12 optimization round, guide §2/§6): the
# testdata ships each table as ONE single-row-group parquet file, so
# every scan is a 1-task decode and everything Catalyst fuses into the
# scan stage — filters, decimal partial aggregates, the expand for
# multi-distinct aggregates, per-row array HOFs — runs serially while
# 31 cores idle (measured: profile_orders_columns 4.2 s with a 4.9 s
# single-task stage; tpch_q1's decimal partial aggregate 2.2 s vs
# 0.5 s for the same shape spread). Queries whose post-scan work is
# heavy opt in via ``table(..., spread=True)`` (or ``spread="col"``
# to spread by a column the query already reads, so the repartition
# key never widens the scan's ReadSchema — the q1 pruning test pins
# this): rows spread by a high-cardinality key before the heavy
# work, exactly like the documents guard below. Opt-in rather than blanket (measured r12):
# for filter-selective or join/window-dominated consumers the extra
# exchange is a small constant LOSS (their first shuffle is already
# keyed elsewhere), while the aggregate-over-full-table consumers win
# 1.5-2x. HASH partitioning on the table key rather than round-robin:
# round-robin pays a local sort of the whole input inside the 1-task
# scan for retry determinism (SPARK-23207), measured slower; the key
# column spreads evenly (sequential surrogate keys). Guarded: on a
# real multi-split table (at 100 TB every one of these) the estimate
# clears parallelism and NO shuffle is added — scale-adaptive
# spreading, not a local[32]-tuned constant.
_SPREAD_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "events": "user_id",
    "embeddings": "vec_id",
}


def _spread(
    spark: SparkSession, df: DataFrame, name: str, key: str | None = None
) -> DataFrame:
    # Fire ONLY when the scan is a single split — the case the spread
    # exists for (a 1-task decode serializing everything behind it).
    # History of this guard: r12 started at `est < par`, hardened to
    # `est < max(2, par // 4)` after an sf1.0 regression; r13 measured
    # the remaining borderline case (est = 2: one 135 MB file, two
    # byte-range splits) and the spread LOSES there too — q1 at sf1.0
    # reads 1.01/1.10 s unspread vs 1.27/1.41 s spread (min-of-3,
    # alternating legs ×2): with two scan tasks the heavy partial
    # aggregate already parallelizes at the exchange, so the extra
    # 51 MB repartition is pure cost. Any multi-split scan wins
    # without help; at 100 TB every fact table is thousands of splits
    # and the spread is a structural no-op. The threshold is
    # deliberately core-count-independent, so the driver's lower-core
    # bench legs see the identical plan.
    par = spark.sparkContext.defaultParallelism
    if _estimated_scan_partitions(df.inputFiles()) < 2:
        df = df.repartition(par, F.col(key or _SPREAD_KEYS[name]))
    return df


# Per-session memo of the lazy base frames (r12 optimization round):
# ``spark.read.parquet`` pays driver-side file listing + footer/schema
# inference on EVERY call — measured ~95 ms per table() call at bench
# scale, and the full suite makes ~400 of them (~30-60 s of pure
# plan-construction wall across 158 queries, inside the timed
# regions). The memo holds the unexecuted DataFrame (a logical plan —
# no rows, no storage; every action still computes from the parquet
# files), keyed by session so a stopped session's entries die with it
# and fresh-process runs are unaffected. Data files are immutable for
# the life of a session here; a deployment with mutating inputs would
# key on a snapshot/version instead.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool | str = False
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    memo = _TABLE_MEMO.setdefault(spark, {})
    key = (sf_dir, name, spread)
    cached = memo.get(key)
    if cached is not None:
        return cached
    df = _build_table(spark, sf_dir, name, spread)
    memo[key] = df
    return df


def _build_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool | str
) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Spark versions that
        # reject nanos in the vectorized reader honor the legacy conf
        # and surface ts as a nanos long (convert: ns → µs floor, the
        # same value DuckDB sees); newer readers ignore the conf and
        # floor to a TIMESTAMP_NTZ natively. Branch on the resolved
        # type; both paths end at a plain µs TIMESTAMP (session TZ is
        # pinned UTC, so the NTZ→TIMESTAMP cast is a reinterpret).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if spread:
            return _spread(
                spark, df, name, spread if isinstance(spread, str) else None
            )
        return df
    if name == "documents":
        # The doc pipelines (shingle/gram/token explode, decode UDFs)
        # do heavy per-row expansion, but the testdata ships documents
        # as ONE small parquet file → a 1-partition scan would run
        # every explode single-threaded. Spread rows across the
        # cluster first; the text shuffle is tiny relative to the
        # expansion it parallelizes. Guarded: on a real corpus the
        # scan already has >= cluster-parallelism partitions and the
        # shuffle is skipped entirely. (documents keeps ROUND-ROBIN
        # spreading, unlike the keyed fact tables above: the exchange
        # audit pins the text-carrying guard exchange to
        # RoundRobinPartitioning, and the 5000-row local sort it pays
        # is trivial next to the explode work it parallelizes.)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        par = spark.sparkContext.defaultParallelism
        if _estimated_scan_partitions(df.inputFiles()) < par:
            df = df.repartition(par)
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        # An explicit string key is honored for ANY table (ADVICE r12:
        # the old `name in _SPREAD_KEYS` gate silently dropped
        # spread="col" on unregistered tables); bare spread=True needs
        # a registered key and fails loudly rather than silently
        # un-spreading a future call site.
        if not isinstance(spread, str) and name not in _SPREAD_KEYS:
            raise KeyError(
                f"table {name!r} has no registered spread key; "
                f"pass spread='<column>' explicitly"
            )
        df = _spread(spark, df, name, spread if isinstance(spread, str) else None)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}
