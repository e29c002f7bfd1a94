"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the engine's query
registry (mit6_5840_6_824_lab1_mapreduce_spark/queries): one entry per
implemented operator from SURVEY.md §2 plus the LLM-pipeline
extensions, each with a DuckDB oracle unless genuinely
non-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

SF_SMOKE_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "wc_wordcount"

# The driver's correctness run caps at 50 queries, taken in dict order.
# Front-load every query that has not yet appeared in a driver
# CORRECTNESS file (r01+r02 union) so each registered query gets
# hard-signal coverage across rounds; rows green in both r01 and r02
# rotate to the back of the window.
_PRIORITY = [
    # -- never driver-checked as of r02 (locally oracle-green) --
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "text_repetition_stats",
    "text_boilerplate_fraction",
    "ngram_topk_per_source",
    "corpus_source_mix",
    "corpus_split_assign",
    "multimodal_asset_meta",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    "multimodal_resize",
    "multimodal_audio_decode",
    "dedup_exact_keep",
    "dedup_oversized_buckets",
    "dedup_minhash_keep",
    "dedup_pair_source_matrix",
    "pipeline_clean_corpus",
    "pipeline_corpus_stats",
    "decontam_ngram_hits",
    "decontam_drop_list",
    "embedding_label_centroids",
    "embedding_kmeans_centroids",
    "similarity_topk_batch",
    "similarity_ivf_assign",
    "similarity_ivf_topk",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue",
    # -- new this round (never checked by construction) --
    "corpus_pack_sequences",
    "corpus_sample_temperature",
    "dedup_passage_blocks",
    "corpus_chunk_windows",
    "corpus_stratified_sample",
    "corpus_mixture_plan",
    "events_outlier_stats",
    "events_salted_type_stats",
    "tpch_q14_promo_revenue",
    "tpch_q9_nation_profit",
    "tpch_q2_min_cost_supplier",
    # reference-core KV surface (SURVEY §2.4): keep in the hard signal
    # every round; relational extension rows rotate out instead
    "kv_final_state",
    "kv_get_at_seq",
    "kv_duplicate_suppression",
    "kv_client_stats",
    # exactly 50 entries above — the window is 100% never-checked
    # queries + the pinned KV core this round. Still waiting for a
    # seat next round: corpus_token_histogram (added after the window
    # filled), then the r01-green rotation backlog
    # (similarity_ann_multiprobe, similarity_lsh_near_pairs, wc, ...)
]


def _ordered_names() -> list[str]:
    front = [n for n in _PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in _PRIORITY]
    return front + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1 word count — the reference's namesake job)
    on the smoke-scale tables."""
    return REGISTRY[FLAGSHIP].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
