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


def _hits_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return (
        bench.join(corpus, "shingle")
        .groupBy("bench_id", "corpus_id")
        .agg(F.count("*").alias("shared_grams"))
    )


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
