"""Similarity search over embedding columns (array<float>).

Exact-arithmetic contract: floats are quantized to int64
(round(x·10⁶)) so dot products and norms are exact integer sums —
order-independent, engine-independent. cosine = dot / (√na·√nb)
computed from those exact integers is then bit-identical everywhere.
(Quantization error ~1e-6 is far below any ranking threshold and is
applied identically on both engines.)

Everything is JVM-side (zip_with / aggregate — whole-stage codegen);
no Python UDFs. The brute-force path is the correctness baseline;
random-hyperplane LSH is the scale path: bucket = 8 sign bits, so
candidate generation is an equi-join on bucket — at 100 TB the
all-pairs product never materializes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
N_PLANES = 8


def quantized(col: Column) -> Column:
    """array<float> → array<long>, x → round(x·10⁶)."""
    return F.transform(
        col.cast("array<double>"),
        lambda x: F.round(x * SCALE, 0).cast("long"),
    )


def dot_ll(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return dot_ll(a, a)


def cosine(a_q: Column, b_q: Column, a_n2: Column, b_n2: Column) -> Column:
    """cosine from quantized vectors + precomputed squared norms,
    rounded to 6dp (deterministic: all inputs exact integers)."""
    return F.round(
        dot_ll(a_q, b_q) / (F.sqrt(a_n2.cast("double")) * F.sqrt(b_n2.cast("double"))),
        6,
    )


def hyperplanes(n_planes: int = N_PLANES, dim: int = 64) -> list[list[int]]:
    """Deterministic pseudo-random integer hyperplanes from md5 —
    a compile-time constant shared verbatim with the SQL oracle.
    Weight ∈ {-15..15}: 2·hexdigit − 15 of md5('p:<p>:<d>')."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            digit = int(hashlib.md5(f"p:{p}:{d}".encode()).hexdigest()[0], 16)
            row.append(2 * digit - 15)
        planes.append(row)
    return planes


def lsh_bucket(q: Column, planes: list[list[int]]) -> Column:
    """Bucket id = Σ_p (sign(dot(v, w_p)) > 0) << p — exact integer
    arithmetic end to end."""
    bucket = F.lit(0).cast("long")
    for p, w in enumerate(planes):
        warr = F.array(*[F.lit(x).cast("long") for x in w])
        s = dot_ll(q, warr)
        bucket = bucket + F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def embeddings_quantized(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        "label",
        quantized(F.col("embedding")).alias("q"),
    ).withColumn("n2", norm2(F.col("q")))


def brute_force_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Baseline exact top-k by cosine against one query vector.
    Broadcast the single query row; TakeOrderedAndProject for top-k."""
    v = embeddings_quantized(emb)
    qrow = v.where(F.col("vec_id") == query_vec_id).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("q_q"), F.col("n2").alias("q_n2")
    )
    joined = v.where(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(qrow))
    return (
        joined.select(
            "vec_id",
            cosine(F.col("q"), F.col("q_q"), F.col("n2"), F.col("q_n2")).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_ann_topk(
    emb: DataFrame, query_vec_id: int, k: int = 5, planes: list[list[int]] | None = None
) -> DataFrame:
    """ANN: exact cosine ranking restricted to the query's LSH bucket.
    At scale the table is pre-bucketed (partitioned by bucket), so a
    query touches one partition — this is IVF-style partition pruning
    with hyperplane buckets."""
    planes = planes or hyperplanes()
    v = embeddings_quantized(emb).withColumn("bucket", lsh_bucket(F.col("q"), planes))
    qrow = v.where(F.col("vec_id") == query_vec_id).select(
        F.col("q").alias("q_q"),
        F.col("n2").alias("q_n2"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = v.crossJoin(F.broadcast(qrow)).where(
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != query_vec_id)
    )
    return (
        cands.select(
            "vec_id",
            cosine(F.col("q"), F.col("q_q"), F.col("n2"), F.col("q_n2")).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above `threshold` —
    exact all-pairs baseline.

    Implementation: block matrix product. The quantized table is
    broadcast as one int64 matrix (B); each partition of the same
    table streams through a mapInPandas stage computing A_block @ B.T
    with numpy (exact int64 — identical values to any other exact
    evaluation order). The numpy stage prefilters with a small slack;
    the authoritative cosine + round + threshold happens JVM-side so
    results are bit-identical to the SQL restatement.

    Scale: exact all-pairs is O(n²·d) no matter the engine — this
    shape (broadcast block × streamed blocks) is how you'd run it up
    to ~10⁵ vectors; beyond that use `lsh_near_pairs` (bucket
    equi-join, sub-quadratic)."""
    import numpy as np
    import pandas as pd

    v = embeddings_quantized(emb)
    spark = emb.sparkSession
    rows = v.select("vec_id", "q").collect()  # bench scale: n·d int64s
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["q"] for r in rows], dtype=np.int64)
    n2 = (mat * mat).sum(axis=1)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_n2 = spark.sparkContext.broadcast(n2)
    slack = max(threshold - 1e-5, 0.0)

    def block(batches):
        B_ids, B, B_n2 = b_ids.value, b_mat.value, b_n2.value
        for pdf in batches:
            A = np.array(list(pdf["q"]), dtype=np.int64)
            A_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            dots = A @ B.T  # exact int64
            A_n2 = (A * A).sum(axis=1)
            denom = np.sqrt(A_n2.astype(np.float64))[:, None] * np.sqrt(
                B_n2.astype(np.float64)
            )[None, :]
            cos = dots / denom
            ai, bi = np.nonzero((cos >= slack) & (A_ids[:, None] < B_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": A_ids[ai],
                    "id_b": B_ids[bi],
                    "dot": dots[ai, bi],
                    "na": A_n2[ai],
                    "nb": B_n2[bi],
                }
            )

    cand = v.select("vec_id", "q").mapInPandas(
        block, schema="id_a long, id_b long, dot long, na long, nb long"
    )
    return cand.select(
        "id_a",
        "id_b",
        F.round(
            F.col("dot")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
            6,
        ).alias("cos"),
    ).where(F.col("cos") >= threshold)


def lsh_near_pairs(
    emb: DataFrame, threshold: float = 0.45, planes: list[list[int]] | None = None
) -> DataFrame:
    """Scale path for near-pair mining: only pairs sharing an LSH
    bucket are scored (equi-join on bucket). Recall < 1 by design;
    used at 100 TB where the exact product is impossible."""
    planes = planes or hyperplanes()
    v = embeddings_quantized(emb).withColumn("bucket", lsh_bucket(F.col("q"), planes))
    a = v.select(F.col("vec_id").alias("id_a"), F.col("bucket"), F.col("q").alias("qa"), F.col("n2").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("bucket"), F.col("q").alias("qb"), F.col("n2").alias("nb"))
    pairs = a.join(b, ["bucket"]).where(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        cosine(F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")).alias("cos"),
    ).where(F.col("cos") >= threshold)
