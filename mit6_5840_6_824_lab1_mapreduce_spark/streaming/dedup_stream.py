"""Streaming ingest dedup: each micro-batch of documents is probed
against an accumulated MinHash signature INDEX, deduped within the
batch, and only the survivors' signatures join the index — the
streaming twin of ``operators/dedup.py::incremental_dedup_verdicts``.

Two deliberate contract changes vs the batch operator, both of which
ARE the production streaming design:

- **Signature-estimated Jaccard.** The index stores 16 minhash
  components per kept doc (17 small columns), not text — so the
  verify step estimates Jaccard as the fraction of agreeing
  components (the textbook MinHash estimator: E[match frac] =
  J(A,B)). Exact-Jaccard verification would require keeping every
  indexed document's text forever; the estimator needs 64 bytes per
  doc. For exact duplicates the estimate is exactly 1.0, so the two
  paths agree wherever both are defined.
- **Idempotent state via MERGE.** Index and verdict tables are
  written through ``merge_upsert`` keyed by doc_id, so a replayed
  micro-batch (crash between sink write and checkpoint commit)
  re-applies the same keys instead of duplicating them — the same
  exactly-once story as the KV merge sink (`merge_sink.py`),
  reference analog src/kvraft/server.go:128-134.

Scale posture: per trigger, candidate generation probes only band
buckets containing a batch doc (batch-sized, not index-sized, join
probe); the index side scans prune to matching buckets. State growth
is one 17-column row per SURVIVING doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    N_MINHASH,
    lsh_bands_df,
    minhash_signature_df,
    shingle_pairs_df,
)
from ..operators.upsert import _table_exists, merge_upsert

_SIG_COLS = [f"h{i}" for i in range(N_MINHASH)]
_SIG_SCHEMA = "id long, " + ", ".join(f"{c} string" for c in _SIG_COLS)

VERDICT_SCHEMA = (
    "doc_id long, n_index_dups long, n_batch_dups long, "
    "best_match_id long, verdict string, keep boolean"
)


def _empty_sigs(spark: SparkSession) -> DataFrame:
    # JVM-pure empty relation (r13): createDataFrame([], schema) runs
    # one empty Python-backed partition per core on EVERY action over
    # the union it seeds (~0.43 s vs ~0.07 s measured; see
    # session.local_rows_df).
    from ..session import local_rows_df

    return local_rows_df(spark, [], _SIG_SCHEMA)


def ingest_batch(
    batch_df: DataFrame,
    index_path: str,
    verdict_path: str,
    min_matches: int = 12,
) -> None:
    """Apply ONE micro-batch: probe → verdict → index update.

    ``min_matches`` of 16 components is the similarity gate
    (estimated Jaccard ≥ 12/16 = 0.75). Exact duplicates always
    match all 16."""
    spark = batch_df.sparkSession
    # Every ingested doc gets a verdict — including docs too short to
    # shingle (< 3 tokens), which have no signature row, can never
    # match anything, and fall out as unique/keep (same contract as
    # the batch operator's docs.where(is_new) anchor).
    batch_ids = batch_df.select(F.col("doc_id").alias("id")).distinct().persist()
    sig_new = minhash_signature_df(shingle_pairs_df(batch_df)).persist()
    index = (
        spark.read.parquet(index_path).drop("_part")
        if _table_exists(spark, index_path)
        else _empty_sigs(spark)
    )
    # CRASH-REPLAY IDEMPOTENCE: a replayed batch's survivors are
    # already in the index; without this anti-join sig_all would hold
    # those ids twice and the verify join would double-count their
    # pairs, writing different verdict values than the first run.
    # Excluding the batch's own ids from the index side makes the
    # computation identical whether or not the batch committed before.
    index = index.join(batch_ids, "id", "left_anti")
    # Probe side: batch bands. Build side: index ∪ batch (within-batch
    # dups are found in the same pass).
    bands_new = lsh_bands_df(sig_new)
    sig_all = index.select("id", *_SIG_COLS).unionByName(
        sig_new.select("id", *_SIG_COLS)
    )
    bands_all = lsh_bands_df(sig_all)
    cands = (
        bands_new.alias("a")
        .join(
            bands_all.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sig_new.withColumnsRenamed(
        {"id": "id_a", **{c: f"a_{c}" for c in _SIG_COLS}}
    )
    sb = sig_all.withColumnsRenamed(
        {"id": "id_b", **{c: f"b_{c}" for c in _SIG_COLS}}
    )
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0)
        for c in _SIG_COLS
    )
    ver = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_match", matches)
        .where(F.col("n_match") >= min_matches)
        .select("id_a", "id_b")
    )
    new_id_set = batch_ids.withColumnsRenamed({"id": "id_b"}).withColumn(
        "_is_batch", F.lit(True)
    )
    tagged = ver.join(new_id_set, "id_b", "left").withColumn(
        "other_is_batch", F.coalesce(F.col("_is_batch"), F.lit(False))
    )
    agg = tagged.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.count(F.when(~F.col("other_is_batch"), 1)).alias("n_index_dups"),
        F.count(F.when(F.col("other_is_batch"), 1)).alias("n_batch_dups"),
        F.min("id_b").alias("best_match_id"),
        F.min(F.when(F.col("other_is_batch"), F.col("id_b"))).alias("_best_batch"),
    )
    out = batch_ids.withColumnsRenamed({"id": "doc_id"}).join(agg, "doc_id", "left")
    n_index = F.coalesce(F.col("n_index_dups"), F.lit(0))
    n_batch = F.coalesce(F.col("n_batch_dups"), F.lit(0))
    verdicts = out.select(
        "doc_id",
        n_index.alias("n_index_dups"),
        n_batch.alias("n_batch_dups"),
        "best_match_id",
        F.when(n_index > 0, F.lit("dup_of_index"))
        .when(n_batch > 0, F.lit("dup_in_batch"))
        .otherwise(F.lit("unique"))
        .alias("verdict"),
        (
            (n_index == 0)
            & ((n_batch == 0) | (F.col("doc_id") < F.col("_best_batch")))
        ).alias("keep"),
    ).persist()
    merge_upsert(
        spark,
        verdict_path,
        verdicts.withColumn("_part", F.col("doc_id") % 8),
        key_cols=["doc_id"],
        partition_col="_part",
    )
    survivors = sig_new.join(
        verdicts.where("keep").select(F.col("doc_id").alias("id")), "id"
    )
    merge_upsert(
        spark,
        index_path,
        survivors.withColumn("_part", F.col("id") % 8),
        key_cols=["id"],
        partition_col="_part",
    )
    sig_new.unpersist()
    batch_ids.unpersist()
    verdicts.unpersist()


def stream_dedup_ingest(
    docs_stream: DataFrame,
    index_path: str,
    verdict_path: str,
    checkpoint_dir: str,
    min_matches: int = 12,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming ingest-dedup query: every micro-batch runs
    ``ingest_batch`` (probe against the index accumulated from all
    PRIOR batches, within-batch dedup, survivors extend the index).
    foreachBatch micro-batches are sequential, so batch N's probes
    always see batch N-1's survivors."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df, index_path, verdict_path, min_matches=min_matches)

    writer = docs_stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
