"""Benchmark decontamination over ``documents``.

The training-data op every eval pipeline needs: find corpus documents
that share word n-grams with a held-out benchmark set, so they can be
dropped before training (test-set leakage). Holdout stand-in here:
``doc_id % 20 == 0`` (the synthetic tables carry no real benchmark —
the operator is graded on the join algebra, which is the same at any
split).

Scale design: this is an equi-join on the gram, shuffled by gram —
never a doc×doc product. The document-frequency cap (grams appearing
in > MAX_GRAM_DF docs are excluded) is simultaneously the standard
decontamination practice (boilerplate n-grams are not evidence of
leakage) and the hot-bucket guard from operators/dedup.py: one
viral phrase would otherwise fan out |bench|×|corpus| rows in a
single reducer. At 100 TB: grams hash-partition evenly, the df table
is a first-pass aggregate, and the final per-pair count is a second
bounded aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..plans import table
from .dedup import _SHINGLES_SQL
from ._util import exact_ratio_spark
from .registry import query

MAX_GRAM_DF = 50  # grams in more docs than this are boilerplate, not leakage
HOLDOUT_MOD = 20  # doc_id % 20 == 0 → benchmark side

_HITS_SQL = rf"""
    gdf AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    kept AS (SELECT shingle FROM gdf WHERE df <= {MAX_GRAM_DF}),
    shk AS (SELECT sh.id, sh.shingle FROM sh JOIN kept USING (shingle)),
    hits AS (
      SELECT a.id AS bench_id, b.id AS corpus_id, count(*) AS shared_grams
      FROM shk a JOIN shk b ON a.shingle = b.shingle
      WHERE a.id % {HOLDOUT_MOD} = 0 AND b.id % {HOLDOUT_MOD} <> 0
      GROUP BY a.id, b.id
    )
"""


def _hits_and_shingles(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(hits, sh): the (bench, corpus, shared_grams) evidence table
    plus the persisted distinct (id, shingle) frame it was built from,
    so callers needing per-doc gram counts reuse the ONE tokenize/
    shingle pass instead of scanning the corpus again.

    LIFETIME (advisor r09): `sh` stays persisted for the session —
    deliberately. Callers return lazy DataFrames the DRIVER collects,
    so there is no post-action point inside the query to unpersist
    from; the driver/bench harnesses run `spark.catalog.clearCache()`
    between queries, and a one-shot driver run exits anyway. A
    long-lived embedding service should unpersist the second element
    after its consuming action."""
    docs = table(spark, sf_dir, "documents")
    # Tokenize/shingle once for its three consumers (df count + both
    # join sides) — same persist pattern as the MinHash pipeline.
    sh = D.shingle_pairs_df(docs).persist()  # distinct (id, shingle), 3-grams
    gdf = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    kept = gdf.where(F.col("df") <= MAX_GRAM_DF).select("shingle")
    shk = sh.join(kept, "shingle")
    bench = shk.where(F.col("id") % HOLDOUT_MOD == 0).select(
        F.col("id").alias("bench_id"), "shingle"
    )
    corpus = shk.where(F.col("id") % HOLDOUT_MOD != 0).select(
        F.col("id").alias("corpus_id"), "shingle"
    )
    hits = (
        bench.join(corpus, "shingle")
        .groupBy("bench_id", "corpus_id")
        .agg(F.count("*").alias("shared_grams"))
    )
    return hits, sh


def _hits_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hits_and_shingles(spark, sf_dir)[0]


@query(
    "decontam_ngram_hits",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_HITS_SQL}
    SELECT bench_id, corpus_id, shared_grams FROM hits
    """,
)
def decontam_ngram_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (benchmark doc, corpus doc) pair sharing ≥1
    non-boilerplate word 3-gram, with the shared-gram count — the
    evidence table a decontamination audit reviews."""
    return _hits_frame(spark, sf_dir)


@query(
    "decontam_drop_list",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_HITS_SQL}
    SELECT corpus_id AS doc_id,
           count(*) AS n_bench_hits,
           max(shared_grams) AS max_shared,
           CAST(sum(shared_grams) AS BIGINT) AS total_shared
    FROM hits GROUP BY corpus_id
    """,
)
def decontam_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable output: corpus documents to drop (or review)
    before training, with how many benchmark docs each one collides
    with and the worst overlap depth. Production writes the cleaned
    corpus as an anti-join of `documents` against this list."""
    return (
        _hits_frame(spark, sf_dir)
        .groupBy(F.col("corpus_id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_bench_hits"),
            F.max("shared_grams").alias("max_shared"),
            F.sum("shared_grams").alias("total_shared"),
        )
    )


# --- semantic decontamination (embedding side) -----------------------

# Reuse the similarity suite's exact-arithmetic fragments so the two
# oracles can never drift: int64 quantization, hyperplane buckets,
# and the rounded cosine.
from .similarity import _BUCKETS_SQL, _COS_SQL, _PLANES_VALUES, _QUANT_SQL  # noqa: E402

EMB_HOLDOUT_MOD = 10  # vec_id % 10 == 0 → benchmark side
EMB_COS_THRESHOLD = 0.45


@query(
    "decontam_embedding_overlap",
    oracle=rf"""
    WITH planes(p, d, w) AS (VALUES {_PLANES_VALUES}),
    {_QUANT_SQL},
    {_BUCKETS_SQL},
    hits AS (
      SELECT a.vec_id AS corpus_id, b.vec_id AS holdout_id,
             {_COS_SQL.format(a="a", b="b.q", n2b="b.n2")} AS cos
      FROM nb a JOIN nb b
        ON a.bucket = b.bucket
       AND a.vec_id % {EMB_HOLDOUT_MOD} <> 0
       AND b.vec_id % {EMB_HOLDOUT_MOD} = 0
    )
    SELECT corpus_id,
           count(*) AS n_holdout_hits,
           max(cos) AS max_cos
    FROM hits WHERE cos >= {EMB_COS_THRESHOLD}
    GROUP BY corpus_id
    """,
)
def decontam_embedding_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space complement of
    the n-gram screen above: corpus vectors whose cosine against any
    held-out benchmark vector (vec_id % 10 == 0 stands in) clears
    0.45 are flagged with their hit count and best score. Paraphrased
    leakage that shares no 3-gram still lands here.

    Scale shape: candidate generation is the hyperplane-LSH bucket
    equi-join from the similarity suite (never corpus × holdout);
    cosine arithmetic rides the repo-wide int64 quantization contract
    so both engines agree bit-for-bit. At a real 100 TB split the
    holdout side is small enough to broadcast — the bucket join then
    degenerates to a map-side probe."""
    from ..operators import similarity as S

    emb = table(spark, sf_dir, "embeddings")
    planes = S.hyperplanes()
    v = S.embeddings_quantized(emb).withColumn(
        "bucket", S.lsh_bucket(F.col("q"), planes)
    )
    corp = v.where(F.col("vec_id") % EMB_HOLDOUT_MOD != 0).alias("a")
    hold = v.where(F.col("vec_id") % EMB_HOLDOUT_MOD == 0).alias("b")
    cos = S.cosine(
        F.col("a.q"), F.col("b.q"), F.col("a.n2"), F.col("b.n2")
    )
    hits = (
        corp.join(F.broadcast(hold), F.col("a.bucket") == F.col("b.bucket"))
        .select(F.col("a.vec_id").alias("corpus_id"), cos.alias("cos"))
        .where(F.col("cos") >= EMB_COS_THRESHOLD)
    )
    return hits.groupBy("corpus_id").agg(
        F.count("*").alias("n_holdout_hits"),
        # cos is already an exact k/1e6 det_round value - no re-round.
        F.max("cos").alias("max_cos"),
    )


BLOOM_M = 4096  # bits in the relational bitmap
BLOOM_K = 3  # hash functions
_BLOOM_JS = ", ".join(str(j) for j in range(BLOOM_K))  # oracle UNNEST list


@query(
    "decontam_bloom_prefilter",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    bg AS (SELECT DISTINCT shingle FROM sh WHERE id % {HOLDOUT_MOD} = 0),
    cg AS (SELECT DISTINCT shingle FROM sh WHERE id % {HOLDOUT_MOD} <> 0),
    bp AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5('bloom' || j || ':' || shingle), 1, 8))
                  AS UBIGINT) % {BLOOM_M} AS pos
      FROM bg, UNNEST([{_BLOOM_JS}]) AS t(j)
    ),
    cp AS (
      SELECT shingle, j,
             CAST(('0x' || substr(md5('bloom' || j || ':' || shingle), 1, 8))
                  AS UBIGINT) % {BLOOM_M} AS pos
      FROM cg, UNNEST([{_BLOOM_JS}]) AS t(j)
    ),
    pass AS (
      SELECT shingle FROM cp JOIN bp USING (pos)
      GROUP BY shingle HAVING count(DISTINCT j) = {BLOOM_K}
    ),
    flags AS (
      SELECT cg.shingle,
             CASE WHEN p.shingle IS NULL THEN 0 ELSE 1 END AS passed,
             CASE WHEN b.shingle IS NULL THEN 0 ELSE 1 END AS member
      FROM cg
      LEFT JOIN pass p ON cg.shingle = p.shingle
      LEFT JOIN bg b ON cg.shingle = b.shingle
    )
    SELECT CAST(count(*) AS BIGINT) AS n_corpus_grams,
           CAST(sum(passed) AS BIGINT) AS n_pass_bloom,
           CAST(sum(member) AS BIGINT) AS n_true_member,
           CAST(sum(CASE WHEN passed = 1 AND member = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positive,
           (CAST((2 * CAST((sum(CASE WHEN passed = 1 AND member = 0 THEN 1 ELSE 0 END)) AS BIGINT) * 1000000 + CAST((nullif(count(*) - sum(member), 0)) AS BIGINT)) // (2 * nullif(CAST((nullif(count(*) - sum(member), 0)) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS fp_rate
    FROM flags
    """,
)
def decontam_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction — THE pattern that makes
    decontamination affordable at 100 TB. Instead of shuffling every
    corpus gram into an equi-join against the benchmark gram set,
    build an m-bit Bloom filter over the (small) benchmark grams,
    broadcast it, and discard non-matching corpus grams MAP-SIDE;
    only the tiny surviving candidate set pays the exact verify join.
    This query certifies the filter: it runs the bloom pass AND the
    exact membership join over the same grams and reports the
    false-positive rate the m/k choice buys (one-sided error — every
    true member passes, by construction).

    Relational bitmap: the filter is the DISTINCT set of k=3
    md5-derived bit positions (<= m = 4096 rows — broadcastable at
    any corpus scale); a gram passes iff all 3 of its positions join.
    Deterministic md5 hashing means DuckDB re-derives the identical
    filter, so even the false positives hash-compare exactly."""
    docs = table(spark, sf_dir, "documents")
    # Lazy localCheckpoint, not persist(): each gram set has two
    # consumers (bg: position build + membership flag; cg: position
    # probe + flags base), so materialize once — but WITHOUT entering
    # the session CacheManager, whose cached relations would be
    # substituted into OTHER queries' plans that share the shingle
    # subtree (order-dependent plan shapes) and would live until
    # session end. Checkpointed blocks are freed when the Python
    # DataFrame is garbage-collected.
    sh = D.shingle_pairs_df(docs).localCheckpoint(eager=False)
    bg = (
        sh.where(F.col("id") % HOLDOUT_MOD == 0)
        .select("shingle").distinct().localCheckpoint(eager=False)
    )
    cg = (
        sh.where(F.col("id") % HOLDOUT_MOD != 0)
        .select("shingle").distinct().localCheckpoint(eager=False)
    )

    def pos(j):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bloom{j}:"), F.col("shingle"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % BLOOM_M
        ).alias("pos")

    bp = None
    cp = None
    for j in range(BLOOM_K):
        b_j = bg.select(pos(j))
        c_j = cg.select("shingle", F.lit(j).alias("hj"), pos(j))
        bp = b_j if bp is None else bp.unionByName(b_j)
        cp = c_j if cp is None else cp.unionByName(c_j)
    bp = bp.distinct()
    passed = (
        cp.join(F.broadcast(bp), "pos")
        .groupBy("shingle")
        .agg(F.count_distinct("hj").alias("nh"))
        .where(F.col("nh") == BLOOM_K)
        .select("shingle", F.lit(1).alias("passed"))
    )
    member = bg.select("shingle", F.lit(1).alias("member"))
    flags = (
        cg.join(passed, "shingle", "left")
        .join(member, "shingle", "left")
        .select(
            F.coalesce("passed", F.lit(0)).alias("passed"),
            F.coalesce("member", F.lit(0)).alias("member"),
        )
    )
    fp = F.sum(
        F.when((F.col("passed") == 1) & (F.col("member") == 0), 1).otherwise(0)
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_corpus_grams"),
        F.sum("passed").cast("long").alias("n_pass_bloom"),
        F.sum("member").cast("long").alias("n_true_member"),
        fp.cast("long").alias("n_false_positive"),
        # Integer-exact half-up FP rate (round-5 tie-class sweep).
        exact_ratio_spark(
            "sum(CASE WHEN passed = 1 AND member = 0 THEN 1 ELSE 0 END)",
            "nullif(count(1) - sum(member), 0)",
        ).alias("fp_rate"),
    )
