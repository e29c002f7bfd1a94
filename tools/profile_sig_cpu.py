"""CPU decomposition of the MinHash signature stage: which expression
burns the 199s of executorCpuTime the stage profile showed.

Each variant runs the same scan and adds one more piece; the delta in
summed executorCpuTime attributes the cost. CPU time is robust to
machine contention (unlike wall)."""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators import dedup as D
from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
from mit6_5840_6_824_lab1_mapreduce_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        app_name="profile-sig-cpu",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4098"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4098/api/v1/applications/{app_id}/stages?status=complete"

    def cpu_of(make, label):
        import gc

        spark.catalog.clearCache()
        gc.collect()
        before = {s["stageId"] for s in json.load(urllib.request.urlopen(url))}
        import time

        t0 = time.perf_counter()
        make().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        stages = [
            s
            for s in json.load(urllib.request.urlopen(url))
            if s["stageId"] not in before
        ]
        cpu = sum((s.get("executorCpuTime") or 0) for s in stages) / 1e9
        run = sum((s.get("executorRunTime") or 0) for s in stages) / 1e3
        print(f"{label:52s} wall {wall:6.2f}s cpu {cpu:7.2f}s run {run:7.2f}s")

    docs = lambda: table(spark, SF, "documents")  # noqa: E731
    ts = lambda: docs().select(  # noqa: E731
        F.col("doc_id").alias("id"), D.tokens(F.col("text")).alias("ts")
    )

    # warm
    for _ in range(2):
        docs().count()

    cpu_of(docs, "scan+repartition only")
    cpu_of(ts, "tokens (split+filter HOF)")
    cpu_of(lambda: ts().select("id", F.size("ts")), "tokens -> size")
    cpu_of(
        lambda: ts().select("id", D.gram_windows(F.col("ts"), 3).alias("g")),
        "gram_windows (transform HOF)",
    )
    cpu_of(
        lambda: ts().select(
            "id", F.array_distinct(D.gram_windows(F.col("ts"), 3)).alias("g")
        ),
        "gram_windows + array_distinct",
    )
    cpu_of(
        lambda: D.shingle_pairs_df(docs()),
        "shingle_pairs (= above + explode)",
    )
    cpu_of(
        lambda: D.shingle_pairs_df(docs()).groupBy("id").agg(
            F.count("*").alias("n")
        ),
        "shingles -> count per id (hash agg)",
    )
    cpu_of(
        lambda: D.shingle_pairs_df(docs()).groupBy("id").agg(
            F.min("shingle").alias("m")
        ),
        "shingles -> 1 min(shingle) (sort agg)",
    )
    cpu_of(
        lambda: D.shingle_pairs_df(docs()).groupBy("id").agg(
            F.min(F.md5(F.concat(F.lit("0|"), F.col("shingle")))).alias("m")
        ),
        "shingles -> 1 min(md5) (sort agg)",
    )
    cpu_of(
        lambda: D.minhash_signature_df(D.shingle_pairs_df(docs())),
        "full signature (16 min(md5))",
    )
    spark.stop()


if __name__ == "__main__":
    main()
