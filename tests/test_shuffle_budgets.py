"""Shuffle budgets — perf-as-code for the flagship queries.

The oracle suite proves ANSWERS right and the hygiene suite proves
plans structurally clean; this suite pins the COST SHAPE: an upper
bound on shuffle boundaries (Exchange operators, broadcast excluded)
per flagship query. A refactor that silently introduces an extra
shuffle — a lost map-side combine, a join that stopped broadcasting,
a distinct that no longer rides an existing partitioning — fails here
long before it shows up as a bench regression at scale.

Budgets are measured ceilings (round-5 re-measured: count + 1 slack for
AQE/broadcast-threshold variation at smoke scale), not aspirations:
tightening one is a deliberate optimization, loosening one must be a
reviewed decision.
"""

from __future__ import annotations

import pytest

from mit6_5840_6_824_lab1_mapreduce_spark.plans import plan_audit
from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .conftest import SF_SMOKE

# name -> max allowed shuffle boundaries (measured + slack)
BUDGETS = {
    "wc_wordcount": 3,
    "indexer_inverted_index": 3,
    "tpch_q1_pricing_summary": 2,
    "tpch_q3_shipping_priority": 2,
    "tpch_q18_large_volume_customers": 2,
    "events_hourly_agg": 3,
    "events_sessionization": 2,
    "events_asof_last_purchase": 3,
    "orders_top3_per_customer": 2,
    "dedup_exact": 3,
    "dedup_minhash_lsh": 36,  # signature + band + verify pipeline
    "dedup_simhash_pairs": 8,
    "decontam_ngram_hits": 8,
    "corpus_pack_sequences": 3,
    "events_funnel_conversion": 12,  # 4 chained step joins + aggregates
    "corpus_ngram_diversity": 6,
    "kv_final_state": 3,
    "text_quality_score": 2,
    "similarity_topk_batch": 2,
    "corpus_bpe_token_counts": 5,
    "pipeline_training_export": 6,  # verdicts + split + pack joins (r5 fusion)
    "decontam_bloom_prefilter": 5,  # dual-path certification query
    "dedup_edit_distance": 7,
    "sketch_join_estimate": 6,
    "corpus_leakage_safe_split": 2,  # CC output is checkpointed upstream
    "corpus_semantic_mixture": 7,
    "embedding_cluster_sample": 6,
    # r09: the exact-rank grading arm moved from a single-partition
    # window (1 exchange, 1 task sorts the fact table) to the
    # distributed rank (range bucket + per-bucket window + offsets —
    # more boundaries, all parallel and slim). Raised deliberately.
    "sketch_histogram_quantiles": 11,
    "tokenizer_bpe_segment": 3,
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_count_within_budget(spark, name):
    # Audit the COLD plan: a sibling query's persisted intermediate
    # (e.g. the decontam shingle table) would otherwise swap scans for
    # InMemoryTableScans whose cached lineage shifts the exchange
    # count with test ordering.
    spark.catalog.clearCache()
    audit = plan_audit(REGISTRY[name].fn(spark, SF_SMOKE))
    assert audit.n_exchanges <= BUDGETS[name], (
        f"{name}: {audit.n_exchanges} shuffle boundaries exceeds the "
        f"budget of {BUDGETS[name]} — a map-side combine, broadcast, or "
        f"partitioning reuse was lost (or raise the budget deliberately)"
    )
