"""Dump .explain('formatted') for the named registered queries to
plans/r12/<name>_<suffix>.txt — the optimization round's plan-evidence
capture (judge checks plan claims against these files).

Usage: python tools/dump_plans.py <suffix> <query> [<query> ...]
       python tools/dump_plans.py <suffix> --all-targets
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY
from mit6_5840_6_824_lab1_mapreduce_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
)

TARGETS = [
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_minhash_components",
    "dedup_minhash_keep",
    "corpus_leakage_safe_split",
    "dedup_pair_source_matrix",
    "dedup_threshold_curve",
    "dedup_incremental_new",
    "dedup_edit_distance",
    "dedup_oversized_buckets",
    "pipeline_clean_corpus",
    "pipeline_corpus_stats",
    "pipeline_training_export",
    "profile_orders_columns",
    "dedup_simhash_pairs",
    "dedup_simhash_fingerprints",
    "tokenizer_bpe_merges",
    "sketch_kmv_merge",
    "sketch_join_estimate",
    "sketch_histogram_quantiles",
    "graph_pagerank_nations",
    "embedding_kmeans_centroids",
    "dedup_ngram_jaccard",
    "sales_rollup",
    "customer_rfm_segments",
    "orders_market_basket",
    "text_tfidf_top_terms",
    "similarity_graph_degree",
    "corpus_bpe_token_counts",
    "decontam_bloom_prefilter",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--all-targets"]:
        names = TARGETS
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"ERROR building plan: {type(exc).__name__}: {exc}"
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
