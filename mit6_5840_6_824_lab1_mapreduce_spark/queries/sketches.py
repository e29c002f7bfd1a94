"""Deterministic distributed sketches over the document corpus.

At 100 TB you cannot afford exact global `COUNT(DISTINCT)` / exact
heavy-hitter tables at interactive latency — production pipelines run
sketches (KMV / HLL for cardinality, count-min for frequency) whose
per-partition states merge associatively, so they cost one map-side
pass plus a tiny merge. Spark's built-ins (`approx_count_distinct`,
HLL) are *randomized per run*, which makes them untestable against an
oracle; these implementations fix every hash (md5-derived) so the
sketch is bit-deterministic — the same trick used to make sampling
reproducible elsewhere in this repo — and DuckDB can re-derive the
identical sketch for the hash-compare.

Everything is pure JVM expression + groupBy aggregation: the sketch
states (k minimum hashes, d×w counters, 256 registers) are all
sub-linear in the corpus, so nothing corpus-sized is ever collected,
cached, or windowed in a single task.

Reference analog: these generalize the reference's word-count
aggregation (`/root/reference/src/mrapps/wc.go:21-28`) from exact
counts to mergeable summaries — the map/combine/reduce contract is
identical (C1/C5 in SURVEY §2), only the monoid changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tokenize import LETTER_SPLIT_RE
from ..operators.dedup import gram_windows, tokens
from ..operators.rank import with_global_order
from ..plans import table
from ..session import local_rows_df
from ._util import (
    det_round_spark,
    det_round_sql,
    exact_ratio_spark,
    exact_ratio_sql,
    exact_ratio_wide_spark,
    exact_ratio_wide_sql,
)
from .registry import query

# 60-bit uniform hash from the first 15 hex chars of md5 — the shared
# deterministic randomness for every sketch below. DuckDB twin:
# CAST('0x' || substr(md5(x), 1, 15) AS BIGINT).
_H60_MAX = 1 << 60


def _h60(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _shingle_set(
    spark: SparkSession, sf_dir: str, shared: bool = False
) -> DataFrame:
    """Distinct (source, shingle) pairs — lowercased word 3-grams.
    The cardinality domain for the sketches: the synthetic corpus has
    a tiny closed word vocabulary, but its shingle set grows with the
    corpus, which is exactly the regime (n >> m, n >> k) the
    estimators are built for. One explode + one distinct shuffle;
    output is shingle-set-sized (sub-linear in the corpus).

    ``shared=True`` (r12 optimization round, guide §2.4): consumers
    with several aggregation arms (kmv_merge's merged/direct/exact)
    ask for an explicit repartition
    on (source, shingle) BELOW the dedup. Catalyst optimizes each arm
    separately, so the plain form's tokenize+gram+explode map stage
    is planned (and executed) once PER ARM — measured 3x75 s of
    executor CPU in kmv_merge at sf0.1; with the explicit exchange
    the heavy map is one subtree shared by every arm (ReuseExchange —
    shuffle-file reuse, no caching of anything corpus-sized) and the
    dedup rides the same partitioning with no extra exchange. The
    trade: map-side partial dedup of the explode output is lost, so
    shuffle bytes rise a little — measured strictly worth it for
    multi-arm consumers; single-arm consumers keep the default."""
    docs = table(spark, sf_dir, "documents")
    t = tokens(F.lower(F.col("text")))
    ex = docs.select(
        "source",
        F.explode(F.array_distinct(gram_windows(t, 3))).alias("shingle"),
    )
    if shared:
        ex = ex.repartition("source", "shingle")
    return ex.distinct()


_SHINGLE_SET_SQL = r"""
  shingles AS (
    SELECT DISTINCT source, shingle FROM (
      SELECT source,
             unnest(CASE WHEN len(ts) >= 3
               THEN list_transform(range(1, len(ts) - 1),
                                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS shingle
      FROM (SELECT source,
                   list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
                               t -> t <> '') AS ts
            FROM documents))
  )
"""

_WC_SQL = r"""
  wc AS (
    SELECT word, count(*) AS cnt FROM (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
                                t -> t <> '')) AS word
      FROM documents)
    GROUP BY word
  )
"""


_KMV_K = 64


@query(
    "sketch_kmv_distinct",
    oracle=rf"""
    WITH {_SHINGLE_SET_SQL},
    hashed AS (
      SELECT source, shingle,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h
      FROM shingles
    ),
    ranked AS (
      SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h, shingle) AS rn,
             count(*) OVER (PARTITION BY source) AS n_exact
      FROM hashed
    )
    SELECT source, n_exact,
           CAST({_KMV_K} AS INT) AS kmv_k,
           h AS kth_hash,
           CASE WHEN n_exact < {_KMV_K} THEN CAST(n_exact AS DOUBLE)
                ELSE {det_round_sql(
                    f"CAST({_KMV_K - 1} AS DOUBLE) * {float(_H60_MAX)!r}"
                    " / CAST(h AS DOUBLE)", 4)}
           END AS kmv_estimate
    FROM ranked
    WHERE rn = least({_KMV_K}, n_exact)
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-shingle estimate per source,
    k=64: keep the k smallest 60-bit hashes of the distinct word
    3-gram set; the k-th smallest value v estimates the cardinality as
    (k-1) * 2^60 / v. Emits the exact count alongside so the driver's
    hash-compare pins both the sketch state (the k-th hash itself)
    and the estimate arithmetic.

    Scale shape: the min-k selection is two-phase — a salted partial
    top-k (32-way, parallel) feeds a final top-k over at most 32·k
    survivors per source — the standard distributed top-k plan; no
    single task ever sorts a full per-source vocabulary. The exact
    count (needed here only to grade the sketch) is the one
    vocabulary-sized aggregate; a production run drops it and keeps
    the sketch-only cost."""
    hashed = _shingle_set(spark, sf_dir).select(
        "source", F.col("shingle").alias("word"), _h60(F.col("shingle")).alias("h")
    )
    n_exact = hashed.groupBy("source").agg(F.count("*").alias("n_exact"))
    # Phase 1: partial min-k inside 32 salt groups (parallel, bounded).
    salted = Window.partitionBy("source", F.col("h") % 32).orderBy("h", "word")
    part = (
        hashed.withColumn("prn", F.row_number().over(salted))
        .filter(F.col("prn") <= _KMV_K)
        .drop("prn")
    )
    # Phase 2: final min-k over <= 32*k survivors per source.
    final = Window.partitionBy("source").orderBy("h", "word")
    ranked = part.withColumn("rn", F.row_number().over(final)).join(
        F.broadcast(n_exact), "source"
    )
    kth = ranked.filter(F.col("rn") == F.least(F.lit(_KMV_K), F.col("n_exact")))
    return kth.select(
        "source",
        "n_exact",
        F.lit(_KMV_K).alias("kmv_k"),
        F.col("h").alias("kth_hash"),
        F.when(
            F.col("n_exact") < _KMV_K, F.col("n_exact").cast("double")
        )
        .otherwise(
            # det_round: the estimate is an arbitrary double quotient —
            # native round(double, 4) is tie-divergent cross-engine
            # (round-5 sweep).
            det_round_spark(
                f"CAST({_KMV_K - 1} AS DOUBLE) * {float(_H60_MAX)!r}"
                " / CAST(h AS DOUBLE)",
                4,
            )
        )
        .alias("kmv_estimate"),
    )


_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row
_CMS_TOPK = 20


@query(
    "sketch_cms_heavy_hitters",
    oracle=rf"""
    WITH {_WC_SQL},
    seeds AS (SELECT unnest(range({_CMS_D})) AS seed),
    counters AS (
      SELECT seed,
             CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || ':' || word), 1, 8)
                  AS BIGINT) % {_CMS_W} AS bucket,
             sum(cnt) AS total
      FROM wc, seeds
      GROUP BY 1, 2
    ),
    top AS (
      SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT {_CMS_TOPK}
    ),
    probes AS (
      SELECT t.word, t.cnt, s.seed,
             CAST('0x' || substr(md5(CAST(s.seed AS VARCHAR) || ':' || t.word), 1, 8)
                  AS BIGINT) % {_CMS_W} AS bucket
      FROM top t, seeds s
    )
    SELECT p.word, p.cnt AS true_count,
           CAST(min(c.total) AS BIGINT) AS cms_estimate,
           CAST(min(c.total) - p.cnt AS BIGINT) AS overcount
    FROM probes p JOIN counters c USING (seed, bucket)
    GROUP BY p.word, p.cnt
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4 rows x w=512 buckets, fixed md5-seeded
    hashes) built over the corpus word counts, probed for the true
    top-20 words: estimate = min over rows of the probed counter.
    Emits true count, CMS estimate, and the overcount (provably >= 0
    — the driver compare certifies the sketch's one-sided error).

    Scale shape: counters are a groupBy on (seed, bucket) — at most
    d*w = 2048 rows regardless of corpus size — with map-side partial
    aggregation, so the sketch build is one pass + a tiny shuffle.
    The top-k probe is TakeOrderedAndProject (map-side heap), and the
    counter lookup is a broadcast equi-join on the 2048-row state."""
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), LETTER_SPLIT_RE),
                    lambda t: t != F.lit(""),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    seeds = F.array([F.lit(i) for i in range(_CMS_D)])

    def bucket(seed: F.Column, word: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(seed.cast("string"), F.lit(":"), word)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    counters = (
        wc.select("word", "cnt", F.explode(seeds).alias("seed"))
        .withColumn("bucket", bucket(F.col("seed"), F.col("word")))
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("total"))
    )
    top = wc.orderBy(F.col("cnt").desc(), "word").limit(_CMS_TOPK)
    probes = top.select(
        "word", "cnt", F.explode(seeds).alias("seed")
    ).withColumn("bucket", bucket(F.col("seed"), F.col("word")))
    return (
        probes.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy("word", F.col("cnt").alias("true_count"))
        .agg(F.min("total").alias("cms_estimate"))
        .select(
            "word",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overcount"),
        )
    )


_HLL_M = 256  # 2^8 buckets; bucket = top 8 bits, rho over remaining 52
# alpha_m * m^2 * 2^60, folded to ONE double constant shared verbatim
# by both engines: estimate = _HLL_NUM / S is then a single IEEE
# division — no expression-order or literal-typing (DECIMAL vs
# DOUBLE) divergence can creep in.
_HLL_NUM = (0.7213 / (1.0 + 1.079 / _HLL_M)) * float(_HLL_M * _HLL_M) * float(_H60_MAX)


@query(
    "sketch_hll_estimate",
    oracle=rf"""
    WITH {_SHINGLE_SET_SQL},
    uniq AS (SELECT DISTINCT shingle FROM shingles),
    hashed AS (
      SELECT CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h
      FROM uniq
    ),
    parts AS (
      SELECT h >> 52 AS bucket, h & {(1 << 52) - 1} AS rest FROM hashed
    ),
    regs AS (
      SELECT bucket,
             max(CASE WHEN rest = 0 THEN 53
                      ELSE 53 - length(bin(rest)) END) AS rho,
             count(*) AS cnt
      FROM parts GROUP BY bucket
    ),
    agg AS (
      SELECT sum(cnt) AS n_exact,
             count(*) AS buckets_hit,
             sum(CAST(CAST(1 AS BIGINT) << (60 - rho) AS HUGEINT))
               + (CAST({_HLL_M} AS HUGEINT) - count(*))
                 * CAST(CAST(1 AS BIGINT) << 60 AS HUGEINT) AS s_scaled
      FROM regs
    )
    SELECT CAST({_HLL_M} AS INT) AS m,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(buckets_hit AS BIGINT) AS buckets_hit,
           {det_round_sql(f"{_HLL_NUM!r} / CAST(s_scaled AS DOUBLE)", 4)} AS hll_estimate
    FROM agg
    """,
)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with fixed md5 hashing, m=256 registers: bucket =
    top 8 bits of the 60-bit hash, rho = position of the leading
    1-bit in the remaining 52 (53 when they are all zero), register =
    max rho per bucket, raw estimate = alpha_m * m^2 / sum(2^-rho)
    (empty registers contribute 2^0; no small/large-range correction
    — this is the raw estimator, graded against the exact count in
    the same row).

    Determinism: the harmonic sum is computed in scaled integer
    arithmetic — sum of 2^(60-rho) as exact decimal — and only the
    final alpha*m^2*2^60/S division happens in double, so no
    float-summation order can leak into the hash-compare.

    Scale shape: register build is a 256-group aggregate with map-side
    partial max — the canonical mergeable-sketch plan; the final row
    is a single tiny reduce."""
    uniq = _shingle_set(spark, sf_dir).select("shingle").distinct()
    parts = uniq.select(_h60(F.col("shingle")).alias("h")).select(
        F.expr("shiftright(h, 52)").alias("bucket"),
        F.expr(f"h & {(1 << 52) - 1}").alias("rest"),
    )
    regs = parts.groupBy("bucket").agg(
        F.max(
            F.when(F.col("rest") == 0, F.lit(53)).otherwise(
                F.lit(53) - F.length(F.bin(F.col("rest")))
            )
        ).alias("rho"),
        F.count("*").alias("cnt"),
    )
    agg = regs.agg(
        F.sum("cnt").alias("n_exact"),
        F.count("*").cast("long").alias("buckets_hit"),
        (
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(60 - rho AS INT))").cast(
                    "decimal(38,0)"
                )
            )
            + (F.lit(_HLL_M).cast("decimal(38,0)") - F.count("*"))
            * F.lit(1 << 60).cast("decimal(38,0)")
        ).alias("s_scaled"),
    )
    return agg.select(
        F.lit(_HLL_M).alias("m"),
        "n_exact",
        "buckets_hit",
        det_round_spark(
            f"{_HLL_NUM!r} / CAST(s_scaled AS DOUBLE)", 4
        ).alias("hll_estimate"),
    )


_COVERAGE_PCTS = (50, 90, 95, 99)


@query(
    "vocab_coverage_topk",
    oracle=rf"""
    WITH {_WC_SQL},
    ranked AS (
      SELECT word, cnt,
             row_number() OVER (ORDER BY cnt DESC, word) AS rn,
             sum(cnt) OVER (ORDER BY cnt DESC, word
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER () AS total
      FROM wc
    ),
    marks AS (
      SELECT total,
             {", ".join(f"min(CASE WHEN cum * 100 >= total * {p} THEN rn END) AS v{p}, "
                        f"min(CASE WHEN cum * 100 >= total * {p} THEN cum END) AS c{p}"
                        for p in _COVERAGE_PCTS)}
      FROM ranked GROUP BY total
    )
    {" UNION ALL ".join(
        f"SELECT CAST({p} AS INT) AS coverage_pct, CAST(v{p} AS BIGINT) AS vocab_size, "
        f"CAST(c{p} AS BIGINT) AS tokens_covered, CAST(total AS BIGINT) AS total_tokens, "
        f"{exact_ratio_wide_sql(f'c{p}', 'total')} AS coverage FROM marks"
        for p in _COVERAGE_PCTS)}
    """,
)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary sizing: the smallest top-N word vocabulary
    whose cumulative frequency covers 50/90/95/99% of all corpus
    tokens — the first question asked when budgeting a WordPiece/BPE
    vocab against OOV rate. Thresholds are integer-exact
    (cum*100 >= total*pct; no float in the cut decision).

    Scale shape: the word-count aggregate is corpus-sized with
    map-side combine; the rank + running sum over the VOCABULARY
    (~10⁹ distinct tokens on a 100 TB web corpus — NOT one-task
    material) is a distributed rank (operators/rank.py: range-bucketed
    row_number + exact integer running sums, no single-partition
    exchange). The four thresholds are conditional aggregates over the
    ranked vocab (no join, no second pass), unpivoted with stack()."""
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), LETTER_SPLIT_RE),
                    lambda t: t != F.lit(""),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = with_global_order(
        wc,
        [F.desc("cnt"), F.asc("word")],
        rn="rn",
        running=[("cum", "cnt")],
        totals=[("total", "cnt")],
    ).select("cnt", "rn", "cum", "total")
    aggs = [F.first("total").alias("total")]
    for p in _COVERAGE_PCTS:
        hit = F.col("cum") * 100 >= F.col("total") * p
        aggs.append(F.min(F.when(hit, F.col("rn"))).alias(f"v{p}"))
        aggs.append(F.min(F.when(hit, F.col("cum"))).alias(f"c{p}"))
    # total IS NULL only when the corpus has zero tokens: the global
    # aggregate always emits one row, but the oracle's GROUP BY total
    # emits none — "no tokens -> no coverage marks" is the contract
    # (round-6 degenerate-input sweep: Spark emitted 4 all-NULL rows
    # on an empty corpus, the oracle 0).
    marks = ranked.groupBy().agg(*aggs).where(F.col("total").isNotNull())
    stack = ", ".join(
        f"CAST({p} AS INT), v{p}, c{p}" for p in _COVERAGE_PCTS
    )
    return marks.select(
        F.expr(
            f"stack({len(_COVERAGE_PCTS)}, {stack}) AS "
            "(coverage_pct, vocab_size, tokens_covered)"
        ),
        F.col("total").alias("total_tokens"),
    ).select(
        "coverage_pct",
        "vocab_size",
        "tokens_covered",
        "total_tokens",
        # Integer-exact half-up ratio (round-5 tie-class sweep); wide:
        # corpus token sums x 10^6 pass int64 near ~4.6e12 tokens,
        # inside the 100 TB target (advisor r05 class).
        exact_ratio_wide_spark("tokens_covered", "total_tokens").alias("coverage"),
    )


@query(
    "sketch_kmv_merge",
    oracle=rf"""
    WITH {_SHINGLE_SET_SQL},
    hashed AS (
      SELECT source, shingle,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h
      FROM shingles
    ),
    per_source AS (
      SELECT source, h FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h, shingle) AS rn
        FROM hashed) WHERE rn <= {_KMV_K}
    ),
    merged AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM per_source)) WHERE rn = {_KMV_K}
    ),
    direct AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM hashed)) WHERE rn = {_KMV_K}
    ),
    exact AS (SELECT count(DISTINCT shingle) AS n_exact FROM shingles)
    SELECT (SELECT count(DISTINCT source) FROM shingles) AS n_sources,
           CAST(e.n_exact AS BIGINT) AS n_exact,
           m.h AS kth_hash_merged,
           d.h AS kth_hash_direct,
           m.h = d.h AS merged_equals_direct,
           {det_round_sql(
               f"CAST({_KMV_K - 1} AS DOUBLE) * {float(_H60_MAX)!r}"
               " / CAST(m.h AS DOUBLE)", 4)} AS kmv_estimate
    FROM merged m, direct d, exact e
    """,
)
def sketch_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV MERGEABILITY — the property that makes sketches work on a
    cluster: the union of per-source k-min sketches, re-minned to k,
    must equal the sketch computed directly over the global distinct
    set (every global top-k hash is inside its source's top-k). This
    query computes BOTH and emits them side by side; the oracle's
    hash-compare turns the mergeability theorem into a checked
    invariant, and `merged_equals_direct` makes it visible.

    Scale shape: per-source sketches are the bounded per-partition
    states a real cluster would ship to one reducer (k rows per
    source); both k-th-hash arms are orderBy+limit(k) →
    TakeOrderedAndProject (map-side partial top-k, never a global
    sort — the direct arm's distinct hash set is corpus-sized). The
    exact count AND the direct arm exist only to grade the merge — a
    production run ships the per-source sketches and nothing else."""
    hashed = _shingle_set(spark, sf_dir, shared=True).select(
        "source", "shingle", _h60(F.col("shingle")).alias("h")
    )
    per_src = Window.partitionBy("source").orderBy("h", "shingle")
    sketches = (
        hashed.withColumn("rn", F.row_number().over(per_src))
        .where(F.col("rn") <= _KMV_K)
        .select("h")
        .distinct()
    )
    # k-th smallest hash via orderBy+limit → TakeOrderedAndProject
    # (map-side partial top-k, k-row merge) — the r08 form ranked the
    # FULL distinct hash set through a single-partition window; the
    # direct arm's distinct set is corpus-sized, so that was the
    # worst plan in the tree. The count guard reproduces the old
    # rn == K semantics exactly: fewer than K distinct hashes → no row.
    def _kth_smallest(hashes: DataFrame, out: str) -> DataFrame:
        return (
            hashes.orderBy("h")
            .limit(_KMV_K)
            .agg(F.max("h").alias(out), F.count(F.lit(1)).alias("_ck"))
            .where(F.col("_ck") == _KMV_K)
            .drop("_ck")
        )

    merged = _kth_smallest(sketches, "kth_hash_merged")
    direct = _kth_smallest(hashed.select("h").distinct(), "kth_hash_direct")
    exact = hashed.agg(
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("shingle").alias("n_exact"),
    )
    return (
        exact.join(F.broadcast(merged))
        .join(F.broadcast(direct))
        .select(
            "n_sources",
            "n_exact",
            "kth_hash_merged",
            "kth_hash_direct",
            (F.col("kth_hash_merged") == F.col("kth_hash_direct")).alias(
                "merged_equals_direct"
            ),
            det_round_spark(
                f"CAST({_KMV_K - 1} AS DOUBLE) * {float(_H60_MAX)!r}"
                " / CAST(kth_hash_merged AS DOUBLE)",
                4,
            ).alias("kmv_estimate"),
        )
    )


_JK_K = 64
# Raw (unrounded) KMV union estimate — shared verbatim by union_est and
# inter_est on BOTH engines so the deterministic-double argument holds.
_JK_U_SQL = (
    f"CASE WHEN m < {_JK_K} THEN CAST(m AS DOUBLE)"
    f" ELSE CAST({_JK_K - 1} AS DOUBLE) * {float(_H60_MAX)!r}"
    f" / CAST(kth_hash AS DOUBLE) END"
)


@query(
    "sketch_join_estimate",
    oracle=rf"""
    WITH ah AS (
      SELECT DISTINCT CAST('0x' || substr(md5('jk:' || CAST(o_orderkey AS VARCHAR)),
                                          1, 15) AS BIGINT) AS h
      FROM orders
    ),
    bh AS (
      SELECT DISTINCT CAST('0x' || substr(md5('jk:' || CAST(l_orderkey AS VARCHAR)),
                                          1, 15) AS BIGINT) AS h
      FROM lineitem
    ),
    ak AS (SELECT h FROM ah ORDER BY h LIMIT {_JK_K}),
    bk AS (SELECT h FROM bh ORDER BY h LIMIT {_JK_K}),
    mk AS (SELECT DISTINCT h
           FROM (SELECT h FROM ak UNION ALL SELECT h FROM bk)
           ORDER BY h LIMIT {_JK_K}),
    mstat AS (SELECT max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS m FROM mk),
    istat AS (
      SELECT CAST(count(*) AS BIGINT) AS c FROM mk
      WHERE h IN (SELECT h FROM ak) AND h IN (SELECT h FROM bk)
    ),
    tstat AS (
      SELECT CAST(count(*) AS BIGINT) AS n_true
      FROM (SELECT DISTINCT o_orderkey AS k1 FROM orders) a
      JOIN (SELECT DISTINCT l_orderkey FROM lineitem) b ON a.k1 = b.l_orderkey
    )
    SELECT CAST({_JK_K} AS BIGINT) AS kmv_k,
           kth_hash, m AS m_merged, c AS n_both, n_true,
           {det_round_sql(_JK_U_SQL, 4)} AS union_est,
           {exact_ratio_sql('c', 'm')} AS jaccard_est,
           {det_round_sql(f"(CAST(c AS DOUBLE) / nullif(m, 0)) * ({_JK_U_SQL})", 4)} AS inter_est
    FROM mstat, istat, tstat
    """,
)
def sketch_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from KMV sketches — what a
    cost-based optimizer does before picking a join strategy, run as
    a query so the estimator itself is hash-checked. Sketch each
    side's distinct key set (k minimum hash values), merge the
    sketches (k smallest of the union), estimate |A∪B| from the k-th
    merged hash and Jaccard from the fraction of merged values seen
    in BOTH sketches; the intersection estimate J·U is the predicted
    join key overlap, emitted next to the exact value.

    Scale shape: each sketch is a distributed top-k
    (TakeOrderedAndProject — per-partition heads, never a full sort);
    everything after the two k-row sketches is constant-size. The
    exact intersection is computed here only to grade the estimate —
    a production optimizer keeps the sketch-only cost, which is one
    scan per side."""
    k = _JK_K
    # Explicit repartition on the key (r12, guide §2.4): the sketch
    # arm and the exact-intersection grading arm each consume the
    # same key projection — without a shared exchange each arm
    # re-plans (and re-executes) the 1-task scan+cast map stage; with
    # it the map runs once and both arms read the shuffle
    # (ReuseExchange), 32-way parallel.
    o = (
        table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").cast("string").alias("key"))
        .repartition("key")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").cast("string").alias("key"))
        .repartition("key")
    )

    def sketch(df: DataFrame) -> DataFrame:
        return (
            df.select(_h60(F.concat(F.lit("jk:"), F.col("key"))).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    # Lazy checkpoints (r12): eager ones each ran a separate job, and
    # exchange reuse does not span separate jobs — with every arm in
    # ONE action the per-table key exchanges above are genuinely
    # shared. The checkpoints still bound recompute: each k-row sketch
    # materializes once on first use and later consumers read it.
    ak = sketch(o).localCheckpoint(eager=False)
    bk = sketch(li).localCheckpoint(eager=False)
    mk = (
        ak.unionByName(bk)
        .distinct()
        .orderBy("h")
        .limit(k)
        .localCheckpoint(eager=False)
    )
    mstat = mk.agg(
        F.max("h").alias("kth_hash"), F.count("*").alias("m_merged")
    )
    nboth = (
        mk.join(ak, "h", "left_semi")
        .join(bk, "h", "left_semi")
        .agg(F.count("*").alias("n_both"))
    )
    tru = (
        o.distinct()
        .join(li.distinct(), "key", "left_semi")
        .agg(F.count("*").alias("n_true"))
    )
    row = mstat.crossJoin(F.broadcast(nboth)).crossJoin(F.broadcast(tru))
    # Shared raw union expression (m_merged/kth_hash column names here);
    # tie-proof finishers: det_round for the double estimates,
    # integer-exact half-up for the Jaccard ratio (round-5 sweep).
    u_raw = (
        f"CASE WHEN m_merged < {k} THEN CAST(m_merged AS DOUBLE)"
        f" ELSE CAST({k - 1} AS DOUBLE) * {float(_H60_MAX)!r}"
        f" / CAST(kth_hash AS DOUBLE) END"
    )
    return row.select(
        F.lit(k).cast("long").alias("kmv_k"),
        "kth_hash",
        "m_merged",
        "n_both",
        "n_true",
        det_round_spark(u_raw, 4).alias("union_est"),
        exact_ratio_spark("n_both", "m_merged").alias("jaccard_est"),
        # nullif on BOTH engines: an empty merged sketch (both inputs
        # empty) has m_merged = 0, and this raw double division was
        # the one unguarded 0-divisor in the query — ANSI Spark threw
        # DIVIDE_BY_ZERO while the guarded ratios yielded NULL (found
        # by the round-6 registry-wide degenerate-input sweep).
        det_round_spark(
            f"(CAST(n_both AS DOUBLE) / nullif(m_merged, 0)) * ({u_raw})", 4
        ).alias("inter_est"),
    )


@query(
    "sketch_histogram_quantiles",
    oracle=r"""
    WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    hist AS (SELECT length(bin(cents)) - 1 AS bucket,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM c GROUP BY 1),
    h2 AS (SELECT bucket, cnt,
                  sum(cnt) OVER (ORDER BY bucket) AS cum,
                  sum(cnt) OVER (ORDER BY bucket) - cnt AS cum_prev
           FROM hist),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
    ranked AS (SELECT cents,
                      row_number() OVER (ORDER BY cents) AS rn
               FROM c),
    t(qname, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10),
                                  ('p99', 99, 100)),
    t2 AS (SELECT t.qname,
                  CAST(t.num AS BIGINT) AS num, CAST(t.den AS BIGINT) AS den,
                  (t.num * tot.n + t.den - 1) // t.den AS k,
                  (t.num * (tot.n - 1)) // t.den AS f,
                  (t.num * (tot.n - 1)) % t.den AS rem,
                  tot.n AS n
           FROM t, tot),
    ex AS (SELECT t2.qname, t2.den, t2.rem,
                  max(CASE WHEN r.rn = t2.f + 1 THEN r.cents END) AS c_lo,
                  max(CASE WHEN r.rn = least(t2.f + 2, t2.n)
                      THEN r.cents END) AS c_hi
           FROM t2 JOIN ranked r
             ON r.rn BETWEEN t2.f + 1 AND least(t2.f + 2, t2.n)
           GROUP BY 1, 2, 3),
    sel AS (
      SELECT t2.qname, t2.k, h2.bucket, h2.cnt, h2.cum_prev
      FROM t2, h2
      WHERE h2.cum >= t2.k AND h2.cum_prev < t2.k
    )
    SELECT s.qname,
           CAST(s.k AS BIGINT) AS k_rank,
           CAST(s.bucket AS BIGINT) AS bucket,
           CAST(((CAST(1 AS BIGINT) << s.bucket) * 10000
                 + (((CAST(1 AS BIGINT) << (s.bucket + 1)) - 1
                     - (CAST(1 AS BIGINT) << s.bucket))
                    * (s.k - s.cum_prev - 1) * 10000)
                   // greatest(s.cnt - 1, 1)
                 + 50) // 100 AS DOUBLE) / 10000.0 AS est_price,
           CAST(((e.c_lo * e.den + (e.c_hi - e.c_lo) * e.rem) * 100
                 + e.den // 2) // e.den AS DOUBLE) / 10000.0 AS exact_price
    FROM sel s JOIN ex e USING (qname)
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantile estimation — the map-side-combinable
    alternative to exact percentiles at 100 TB. Values compress to a
    ~50-row power-of-two histogram (integer-exact buckets via bit
    width — no libm log2); p50/p90/p99 are then estimated by linear
    interpolation inside the bucket the target rank lands in. The
    exact continuous percentile is computed alongside purely to grade
    the estimate (a production run keeps only the histogram cost:
    one aggregate, no full-group shuffle or sort).

    EVERY output number is integer-exact on both engines (the round-4
    verdict's headline fix): the estimate interpolates in scaled
    integer cents (×10⁴) with integer division, and the exact
    continuous percentile is rebuilt from the two order statistics
    around rank q·(n−1) as c_lo·den + (c_hi−c_lo)·rem — no
    double-typed `percentile`/`quantile_cont`, whose round(double, 4)
    diverged between Spark (HALF_UP on shortest decimal repr) and
    DuckDB (binary-double round) on tie inputs like 19660.79125.
    Final prices are round-half-up integers in 10⁻⁴-dollar units cast
    to double and divided by 10⁴ — both operands exact, one correctly
    rounded IEEE division, bit-identical cross-engine.

    int64 headroom: the widest product is (hi−lo)·cnt·10⁴ ≤
    cents_max·n·10⁴; safe while cents_max·n < 9.2×10¹⁴ (sf0.1:
    ~6×10⁷·1.5×10⁵ ≈ 10¹³ ✓). Past that, promote the interpolation
    to DECIMAL(38,0) on both engines.

    The order-statistic side is the GRADING arm only (a production
    run keeps just the histogram cost) — but it ranks the full fact
    table, so it runs as a distributed rank (operators/rank.py), not
    the single-partition row_number it used through r08. The ~50-row
    histogram cumsum window stays single-partition by design: its
    frame is bounded by bit-width (≤ 64 buckets), not by data."""
    # r08 nulls contract: a NULL price has no magnitude — standard
    # percentile semantics exclude it on BOTH engines (the shared
    # pre-filter rule; without it the NULL bucket/rank sorts FIRST in
    # Spark and LAST in DuckDB and every downstream rank shifts).
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .select(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    hist = (
        o.select((F.length(F.bin("cents")) - 1).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    h2 = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "cum_prev", F.col("cum") - F.col("cnt")
    )
    tot = o.agg(F.count("*").alias("n"))
    # Exact order statistics need a global row numbering of the FULL
    # fact table — the one frame here that is corpus-sized, so it uses
    # the distributed rank (operators/rank.py), not a single-partition
    # window. Ties on cents are harmless: the VALUE at a fixed global
    # position is deterministic whatever order tied rows take.
    ranked = with_global_order(o, [F.asc("cents")], rn="rn")
    # Arrow local frame (r13): the createDataFrame(list) path executes
    # as one Python-backed partition per core — ~32 worker round trips
    # to deserialize THREE rows (see session.local_rows_df).
    targets = local_rows_df(
        spark,
        [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)],
        "qname string, num long, den long",
    )
    t2 = (
        targets.crossJoin(F.broadcast(tot))
        .select(
            "qname",
            "num",
            "den",
            "n",
            F.expr("(num * n + den - 1) div den").alias("k"),
            F.expr("(num * (n - 1)) div den").alias("f"),
            F.expr("(num * (n - 1)) % den").alias("rem"),
        )
    )
    # 3-row broadcast against the ranked cents: picks out the two
    # order statistics bracketing each target rank (BNLJ on a bounded
    # build side — see BNLJ_ALLOWED).
    ex = (
        ranked.join(
            F.broadcast(t2),
            (F.col("rn") >= F.col("f") + 1)
            & (F.col("rn") <= F.least(F.col("f") + 2, F.col("n"))),
        )
        .groupBy("qname", "den", "rem")
        .agg(
            F.max(F.when(F.col("rn") == F.col("f") + 1, F.col("cents"))).alias(
                "c_lo"
            ),
            F.max(
                F.when(
                    F.col("rn") == F.least(F.col("f") + 2, F.col("n")),
                    F.col("cents"),
                )
            ).alias("c_hi"),
        )
    )
    sel = (
        t2.crossJoin(F.broadcast(h2))
        .where((F.col("cum") >= F.col("k")) & (F.col("cum_prev") < F.col("k")))
        .select("qname", "k", "bucket", "cnt", "cum_prev")
    )
    est_p4 = F.expr(
        """(shiftleft(1L, CAST(bucket AS INT)) * 10000L
            + ((shiftleft(1L, CAST(bucket AS INT) + 1) - 1L
                - shiftleft(1L, CAST(bucket AS INT)))
               * (k - cum_prev - 1) * 10000L)
              div greatest(cnt - 1, 1L)
            + 50L) div 100L"""
    )
    exact_p4 = F.expr(
        "((c_lo * den + (c_hi - c_lo) * rem) * 100L + den div 2L) div den"
    )
    return (
        sel.join(F.broadcast(ex), "qname")
        .select(
            "qname",
            F.col("k").cast("long").alias("k_rank"),
            F.col("bucket").cast("long").alias("bucket"),
            (est_p4.cast("double") / F.lit(10000.0)).alias("est_price"),
            (exact_p4.cast("double") / F.lit(10000.0)).alias("exact_price"),
        )
    )
