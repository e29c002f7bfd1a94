"""Similarity-search queries over ``embeddings`` (array<float>).

Shared determinism scheme with operators/similarity.py: int64
quantization → exact dot/norm integers → IEEE-identical cosine on
both engines. The LSH hyperplanes are a deterministic md5-derived
constant embedded in both the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..operators.similarity import EMB_OK_SQL
from ..plans import table
from ._util import det_round_col, det_round_sql
from .registry import query

# The WHERE is the repo-wide NULL-vector drop rule (operators/
# similarity.EMB_OK_SQL, r08 nulls contract): only non-NULL, fully
# populated vectors participate in quantization — the Spark twin
# lives in embeddings_quantized.
_QUANT_SQL = rf"""
  v AS (
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
                          x -> CAST(round(x * 1000000) AS BIGINT)) AS q
    FROM embeddings
    WHERE {EMB_OK_SQL}
  ),
  n AS (
    SELECT vec_id, q,
           list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * q[i])) AS n2
    FROM v
  )
"""

# det_round twin of operators/similarity.cosine (round-5 tie sweep).
_COS_SQL = det_round_sql(
    "list_sum(list_transform(range(1, len({a}.q) + 1),"
    " i -> {a}.q[i] * {b}[i]))"
    " / (sqrt(CAST({a}.n2 AS DOUBLE)) * sqrt(CAST({n2b} AS DOUBLE)))"
)

# Shared hyperplane-bucket CTE block (SQL twin of lsh_bucket): pv =
# per-plane signed projections, buckets = 8 sign bits, nb = quantized
# vectors + bucket. ONE definition so bucket semantics cannot drift
# between the five oracles that candidate-generate through it.
_BUCKETS_SQL = r"""pv AS (
      SELECT n.vec_id, pl.p, sum(n.q[pl.d + 1] * pl.w) AS s
      FROM n CROSS JOIN planes pl
      GROUP BY n.vec_id, pl.p
    ),
    buckets AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << p
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM pv GROUP BY vec_id
    ),
    nb AS (SELECT n.vec_id, n.q, n.n2, b.bucket FROM n JOIN buckets b USING (vec_id))"""

_PLANES = S.hyperplanes()  # 8×64 constant, shared with the oracle below
_PLANES_VALUES = ", ".join(
    f"({p},{d},{w})" for p, row in enumerate(_PLANES) for d, w in enumerate(row)
)


@query(
    "similarity_topk_bruteforce",
    oracle=rf"""
    WITH {_QUANT_SQL},
    qv AS (SELECT q AS qq, n2 AS qn2 FROM n WHERE vec_id = 0)
    SELECT n.vec_id,
           {_COS_SQL.format(a="n", b="qv.qq", n2b="qv.qn2")} AS cos
    FROM n, qv
    WHERE n.vec_id <> 0
    ORDER BY cos DESC, n.vec_id ASC
    LIMIT 10
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vector vec_id=0 — the ANN
    correctness baseline. Broadcast single-row query; top-k compiles
    to TakeOrderedAndProject (no global sort)."""
    return S.brute_force_topk(table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@query(
    "similarity_ann_lsh",
    oracle=rf"""
    WITH planes(p, d, w) AS (VALUES {_PLANES_VALUES}),
    {_QUANT_SQL},
    {_BUCKETS_SQL},
    qv AS (SELECT q AS qq, n2 AS qn2, bucket AS qb FROM nb WHERE vec_id = 0)
    SELECT nb.vec_id,
           {_COS_SQL.format(a="nb", b="qv.qq", n2b="qv.qn2")} AS cos
    FROM nb, qv
    WHERE nb.bucket = qv.qb AND nb.vec_id <> 0
    ORDER BY cos DESC, nb.vec_id ASC
    LIMIT 5
    """,
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via random-hyperplane LSH (8 sign bits → bucket),
    exact cosine ranking within the query's bucket. At 100 TB the
    table is written partitioned by bucket → a query prunes to one
    partition (IVF-style)."""
    return S.lsh_ann_topk(
        table(spark, sf_dir, "embeddings"), query_vec_id=0, k=5, planes=_PLANES
    )


@query(
    "dedup_embedding_cosine",
    oracle=rf"""
    WITH {_QUANT_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS_SQL.format(a="a", b="b.q", n2b="b.n2")} AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL.format(a="a", b="b.q", n2b="b.n2")} >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (≥ 0.45). Correctness
    baseline is the full product; the production path at scale is
    operators/similarity.lsh_near_pairs (bucket equi-join)."""
    return S.embedding_near_pairs(table(spark, sf_dir, "embeddings"), threshold=0.45)


@query(
    "similarity_lsh_near_pairs",
    oracle=rf"""
    WITH planes(p, d, w) AS (VALUES {_PLANES_VALUES}),
    {_QUANT_SQL},
    {_BUCKETS_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS_SQL.format(a="a", b="b.q", n2b="b.n2")} AS cos
    FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS_SQL.format(a="a", b="b.q", n2b="b.n2")} >= 0.45
    """,
)
def similarity_lsh_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-pair mining, sub-quadratic scale path: only pairs sharing
    an LSH bucket are scored (equi-join on bucket — the shuffle is
    partitioned by bucket, the full product never materializes).
    Recall < 1 by design vs dedup_embedding_cosine's exact baseline;
    the oracle restates the SAME bucketed semantics, so the compare
    proves the Spark bucketing + exact-cosine scoring are lossless."""
    return S.lsh_near_pairs(
        table(spark, sf_dir, "embeddings"), threshold=0.45, planes=_PLANES
    )


@query(
    "similarity_ann_multiprobe",
    oracle=rf"""
    WITH planes(p, d, w) AS (VALUES {_PLANES_VALUES}),
    {_QUANT_SQL},
    {_BUCKETS_SQL},
    qv AS (SELECT q AS qq, n2 AS qn2, bucket AS qb FROM nb WHERE vec_id = 0)
    SELECT nb.vec_id,
           {_COS_SQL.format(a="nb", b="qv.qq", n2b="qv.qn2")} AS cos
    FROM nb, qv
    WHERE bit_count(xor(nb.bucket, qv.qb)) <= 1 AND nb.vec_id <> 0
    ORDER BY cos DESC, nb.vec_id ASC
    LIMIT 7
    """,
)
def similarity_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: search the query's bucket AND the 8
    buckets at hamming distance 1 (one flipped hyperplane sign) —
    the standard recall lever for hyperplane LSH without extra index
    structures. With the table partitioned by bucket this is 9
    partition reads instead of 1; still never the full table."""
    from pyspark.sql import functions as F

    planes = _PLANES
    v = S.embeddings_quantized(table(spark, sf_dir, "embeddings")).withColumn(
        "bucket", S.lsh_bucket(F.col("q"), planes)
    )
    qrow = v.where(F.col("vec_id") == 0).select(
        F.col("q").alias("q_q"), F.col("n2").alias("q_n2"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = v.crossJoin(F.broadcast(qrow)).where(
        (F.bit_count(F.col("bucket").bitwiseXOR(F.col("q_bucket"))) <= 1)
        & (F.col("vec_id") != 0)
    )
    return (
        cands.select(
            "vec_id",
            S.cosine(F.col("q"), F.col("q_q"), F.col("n2"), F.col("q_n2")).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(7)
    )


@query(
    "similarity_topk_batch",
    oracle=rf"""
    WITH {_QUANT_SQL},
    qv AS (SELECT vec_id AS q_id, q AS qq, n2 AS qn2 FROM n WHERE vec_id < 8),
    sc AS (
      SELECT qv.q_id, n.vec_id,
             {_COS_SQL.format(a="n", b="qv.qq", n2b="qv.qn2")} AS cos
      FROM n CROSS JOIN qv
      WHERE n.vec_id <> qv.q_id
    )
    SELECT q_id, vec_id, cos, rank FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id ASC) AS rank
      FROM sc
    ) WHERE rank <= 5
    """,
)
def similarity_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact retrieval: top-5 neighbours for 8 query vectors
    in ONE corpus pass (broadcast query batch → scored rows →
    per-query row_number rank). Spark's WindowGroupLimit pushes the
    rank≤k filter below the shuffle, so each task ships only its
    local top-5 per query — the two-phase distributed top-k, derived
    by the optimizer."""
    return S.batch_topk(table(spark, sf_dir, "embeddings"), n_queries=8, k=5)


def _assign_sql(i: int) -> str:
    """Nearest-centroid assignment CTE: a{i} assigns every vector to
    its argmin-distance centroid in c{i}n (exact int64 scores, ties →
    smaller cid)."""
    return rf"""a{i} AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY c.cn2 - 2 * list_sum(list_transform(
                            range(1, len(n.q) + 1), i -> n.q[i] * c.cq[i])),
                          c.cid
               ) AS rn
        FROM n CROSS JOIN c{i}n c
      ) WHERE rn = 1
    )"""


def _kmeans_sql(n_iter: int) -> str:
    """CTE chain for n_iter exact-integer Lloyd steps from the
    deterministic seeds (vec_id < 8) — the SQL twin of
    operators.similarity.kmeans_train, one indexed CTE block per
    round. Ends with a{n_iter}: the assignment to the final
    centroids."""
    parts = [
        "c0n AS (SELECT vec_id AS cid, q AS cq, n2 AS cn2 FROM n WHERE vec_id < 8)"
    ]
    for i in range(n_iter):
        j = i + 1
        parts.append(_assign_sql(i))
        parts.append(
            rf"""sx{j} AS (
      SELECT a.cid, generate_subscripts(n.q, 1) AS pos, unnest(n.q) AS val
      FROM n JOIN a{i} a USING (vec_id)
    ),
    sums{j} AS (
      SELECT cid, pos, CAST(sum(val) AS BIGINT) AS s, count(*) AS cnt
      FROM sx{j} GROUP BY cid, pos
    ),
    comp{j} AS (
      SELECT cid, pos,
             CASE WHEN s >= 0 THEN (2 * s + cnt) // (2 * cnt)
                  ELSE -((2 * (-s) + cnt) // (2 * cnt)) END AS m,
             cnt
      FROM sums{j}
    ),
    c{j} AS (
      SELECT cid, list(m ORDER BY pos) AS cq, max(cnt) AS n_members
      FROM comp{j} GROUP BY cid
    ),
    c{j}n AS (
      SELECT cid, cq,
             list_sum(list_transform(range(1, len(cq) + 1), i -> cq[i] * cq[i]))
               AS cn2,
             n_members
      FROM c{j}
    )"""
        )
    parts.append(_assign_sql(n_iter))
    return ",\n    ".join(parts)


_IVF_SQL = _kmeans_sql(1)  # ends at a1: assignment to once-refined c1n


@query(
    "similarity_ivf_assign",
    oracle=rf"""
    WITH {_QUANT_SQL},
    {_IVF_SQL}
    SELECT vec_id, cid FROM a1
    """,
)
def similarity_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index build, pinned end to end: seed centroids (vec_id<8)
    → one exact-integer Lloyd step (assign + rounded-int centroid
    means) → final nearest-centroid assignment. The oracle re-derives
    the identical training step in SQL, so the compare proves the
    distributed k-means iteration — broadcast assign + posexplode
    mean — is bit-exact, not just plausible."""
    emb = table(spark, sf_dir, "embeddings")
    v = S.embeddings_quantized(emb)
    c1 = S.ivf_refined_centroids(v, n_seeds=8)
    return S.ivf_assign(v, c1)


@query(
    "similarity_ivf_topk",
    oracle=rf"""
    WITH {_QUANT_SQL},
    {_IVF_SQL},
    qv AS (SELECT q AS qq, n2 AS qn2 FROM n WHERE vec_id = 0),
    probe AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (
                 ORDER BY c.cn2 - 2 * list_sum(list_transform(
                            range(1, len(qv.qq) + 1), i -> qv.qq[i] * c.cq[i])),
                          c.cid
               ) AS rn
        FROM c1n c CROSS JOIN qv
      ) WHERE rn <= 2
    )
    SELECT n.vec_id,
           {_COS_SQL.format(a="n", b="qv.qq", n2b="qv.qn2")} AS cos
    FROM n
    JOIN a1 USING (vec_id)
    JOIN probe ON a1.cid = probe.cid
    CROSS JOIN qv
    WHERE n.vec_id <> 0
    ORDER BY cos DESC, n.vec_id ASC
    LIMIT 7
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN search: probe the 2 nearest refined centroids,
    exact-cosine rank within their inverted lists. With the corpus
    written partitioned by cid this is an n_probe-partition read —
    the scale ANN path when hyperplane LSH's fixed buckets fit the
    data worse than learned centroids."""
    return S.ivf_topk(
        table(spark, sf_dir, "embeddings"), query_vec_id=0, k=7, n_seeds=8, n_probe=2
    )


@query(
    "embedding_kmeans_centroids",
    oracle=rf"""
    WITH {_QUANT_SQL},
    {_kmeans_sql(2)}
    SELECT cid, pos, m, cnt AS n_members FROM comp2
    """,
)
def embedding_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means training, TWO Lloyd iterations (seed →
    assign → mean → assign → mean), emitted per (centroid, dimension)
    — bit-exact across engines because every step is int64 arithmetic
    (rounded-integer means, exact-integer distances). The Spark loop
    truncates lineage each round (localCheckpoint on k rows), so
    n_iter scales without plan growth; the oracle chains the identical
    round as indexed CTEs. This is the ANN-index/cluster-analysis
    training loop as a first-class operator, not a one-shot query."""
    emb = table(spark, sf_dir, "embeddings")
    v = S.embeddings_quantized(emb)
    c2 = S.kmeans_train(v, n_seeds=8, n_iter=2)
    return c2.select(
        "cid",
        F.posexplode(F.col("cq")).alias("pos0", "m"),
        "n_members",
    ).select("cid", (F.col("pos0") + 1).alias("pos"), "m", "n_members")


@query(
    "embedding_label_centroids",
    oracle=r"""
    WITH ex AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS v
      FROM embeddings
    )
    SELECT label, pos,
           {cv}
             AS centroid_v,
           count(*) AS n_points
    FROM ex GROUP BY label, pos
    """.replace("{cv}", det_round_sql(
        "CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE)"
        " / 1000000.0 / count(*)")),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, emitted as
    (label, dimension, value) rows. Components are int64-quantized
    (round(x·10⁶)) before summing so the mean is an exact integer sum
    divided last — order- and engine-independent. posexplode keeps it
    JVM-side; the shuffle key (label, pos) spreads a 100 TB corpus's
    64-way-wider exploded table evenly across the cluster; this is the
    k-means/IVF-training centroid step."""
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    )
    q = F.round(F.col("v") * S.SCALE, 0).cast("long")
    return (
        ex.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            # det_round: signed numerator rules out the integer idiom
            # (div truncates vs // floors on negatives); the double
            # pipeline itself is deterministic (round-5 sweep).
            det_round_col(
                F.sum(q).cast("double") / F.lit(float(S.SCALE)) / F.count("*")
            ).alias("centroid_v"),
            F.count("*").alias("n_points"),
        )
    )


@query(
    "embedding_norm_stats",
    oracle=r"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000000) AS BIGINT)) AS q
      FROM embeddings
      WHERE {EMB_OK}
    ),
    n AS (
      SELECT vec_id, label, len(q) AS dim,
             list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * q[i])) AS n2
      FROM v
    )
    SELECT label,
           count(*) AS n_vecs,
           CAST(max(dim) AS BIGINT) AS dim,
           {mns} AS mean_norm_sq,
           {mnn} AS min_norm,
           {mxn} AS max_norm
    FROM n GROUP BY label
    """.replace("{mns}", det_round_sql(
        "CAST(sum(n2) AS DOUBLE) / count(*) / 1000000000000.0"
    )).replace("{mnn}", det_round_sql(
        "sqrt(CAST(min(n2) AS DOUBLE)) / 1000000.0"
    )).replace("{mxn}", det_round_sql(
        "sqrt(CAST(max(n2) AS DOUBLE)) / 1000000.0"
    )).replace("{EMB_OK}", EMB_OK_SQL),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table QA profile per label: vector count, dimension,
    mean squared norm, min/max norm — the sanity gate before any
    ANN / clustering run (catches unnormalized slices, zero vectors,
    dimension drift). Exact arithmetic end to end: int64 quantization
    makes every per-vector norm² an exact integer, so the per-label
    sums are order-independent (the r03 float-determinism rule); the
    only floats are final divisions and IEEE-exact sqrt. One narrow
    aggregate — no shuffle of the vectors themselves at 100 TB, just
    (label, n2) pairs."""
    emb = table(spark, sf_dir, "embeddings")
    v = S.embeddings_quantized(emb).withColumn("dim", F.size("q"))
    return v.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.max("dim").cast("long").alias("dim"),
        # det_round: 1e12 scale overflows the integer idiom; sqrt is
        # irrational — the double pipeline is deterministic (r5 sweep).
        det_round_col(
            F.sum("n2").cast("double") / F.count("*") / F.lit(1e12)
        ).alias("mean_norm_sq"),
        det_round_col(
            F.sqrt(F.min("n2").cast("double")) / F.lit(1e6)
        ).alias("min_norm"),
        det_round_col(
            F.sqrt(F.max("n2").cast("double")) / F.lit(1e6)
        ).alias("max_norm"),
    )


_CSAMPLE_K = 5


@query(
    "embedding_cluster_sample",
    oracle=rf"""
    WITH {_QUANT_SQL},
    {_IVF_SQL}
    SELECT cid, vec_id, rk AS pick_rank FROM (
      SELECT cid, vec_id,
             row_number() OVER (
               PARTITION BY cid
               ORDER BY md5('csample:' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS rk
      FROM a1
    ) WHERE rk <= {_CSAMPLE_K}
    """,
)
def embedding_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling: up to K vectors per IVF cluster,
    chosen by deterministic md5 hash order — the diversity-preserving
    draw used to build eval slices and distillation subsets from an
    embedded corpus (uniform sampling over-represents dense clusters;
    per-cluster quotas cover the embedding space's tail modes).

    Plan shape: nearest-centroid assign is a broadcast of the k-row
    centroid table (map-side only), then ONE shuffle by cid with a
    per-partition top-K heap (WindowGroupLimit caps rows before the
    sort materializes) — never a global sort, and the sample size is
    k x K regardless of corpus size."""
    emb = table(spark, sf_dir, "embeddings")
    v = S.embeddings_quantized(emb)
    c1 = S.ivf_refined_centroids(v, n_seeds=8)
    a = S.ivf_assign(v, c1)
    w = Window.partitionBy("cid").orderBy(
        F.md5(F.concat(F.lit("csample:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    return (
        a.withColumn("pick_rank", F.row_number().over(w))
        .where(F.col("pick_rank") <= _CSAMPLE_K)
        .select("cid", "vec_id", "pick_rank")
    )


@query(
    "corpus_semantic_mixture",
    oracle=rf"""
    WITH {_QUANT_SQL},
    {_IVF_SQL}
    SELECT a1.cid, d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(d.text, '[\p{{L}}]+'))) AS BIGINT)
             AS total_words
    FROM a1 JOIN documents d ON a1.vec_id = d.doc_id
    GROUP BY 1, 2
    """,
)
def corpus_semantic_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-cluster x source mixture audit — the cross-modal join
    the relational and embedding halves of the engine meet on: every
    document joins its embedding's IVF cluster (vec_id = doc_id), and
    the (cluster, source) matrix shows which sources dominate which
    regions of embedding space. This is how a data team spots that
    one crawler source collapsed into a single semantic mode before
    the mixture weights are set.

    Plan shape: centroid assignment is the broadcast IVF path; the
    doc-embedding join is an equi-join on an integer key (both sides
    shuffle-partition on it — at scale, write both tables bucketed by
    id and the join is shuffle-free); the mixture matrix is a bounded
    (k x sources) aggregate."""
    from ..plans import table as _t

    emb = _t(spark, sf_dir, "embeddings")
    v = S.embeddings_quantized(emb)
    c1 = S.ivf_refined_centroids(v, n_seeds=8)
    a = S.ivf_assign(v, c1)
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0))
        .cast("long")
        .alias("n_words"),
    )
    return (
        a.join(d, a.vec_id == d.doc_id)
        .groupBy("cid", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
    )
