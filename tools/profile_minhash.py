"""Stage-level wall-time decomposition of the MinHash+LSH+verify
pipeline at bench scale (guide §1: measure first, noop-equivalent
forcing). Prints per-stage times and the FINAL adaptive plan of the
candidate build so exchange/stage reuse is visible (the static plan
shows two signature subtrees; only the executed plan shows whether
AQE deduplicated them)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators import dedup as D
from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
from mit6_5840_6_824_lab1_mapreduce_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, make, spark, reps=2):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        import gc

        gc.collect()
        t0 = time.perf_counter()
        force(make())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:45s} {best:7.3f}s")
    return best


def main() -> None:
    spark = get_spark(app_name="profile-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, SF, "documents")
    # warmups
    force(docs)
    force(D.minhash_lsh_dedup_pairs(table(spark, "/root/testdata/sf0.001", "documents")))

    t("scan documents", lambda: table(spark, SF, "documents"), spark)
    t("tokenize only", lambda: table(spark, SF, "documents").select(
        "doc_id", D.tokens(F.col("text")).alias("ts")), spark)
    t("shingle_pairs (explode)", lambda: D.shingle_pairs_df(
        table(spark, SF, "documents")), spark)
    t("minhash signature", lambda: D.minhash_signature_df(
        D.shingle_pairs_df(table(spark, SF, "documents"))), spark)
    t("bands", lambda: D.lsh_bands_df(D.minhash_signature_df(
        D.shingle_pairs_df(table(spark, SF, "documents")))), spark)
    t("cands (band self-join, no persist)", lambda: D.lsh_candidate_pairs(
        D.lsh_bands_df(D.minhash_signature_df(
            D.shingle_pairs_df(table(spark, SF, "documents"))))), spark)
    t("full minhash_lsh_dedup_pairs", lambda: D.minhash_lsh_dedup_pairs(
        table(spark, SF, "documents"), threshold=0.8), spark)

    # Final adaptive plan of the candidate build (reuse evidence)
    spark.catalog.clearCache()
    cands = D.lsh_candidate_pairs(D.lsh_bands_df(D.minhash_signature_df(
        D.shingle_pairs_df(table(spark, SF, "documents")))))
    force(cands)
    plan = cands._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r12", "cands_executed_final.txt")
    with open(out, "w") as fh:
        fh.write(plan)
    n_reused = plan.count("ReusedExchange") + plan.count("ReusedQueryStage")
    print(f"cands final plan: {n_reused} reused-exchange nodes -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
