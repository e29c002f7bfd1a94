"""Decompose the per-query fixed overhead ("floor", ~0.3 s/query x
158 at bench scale — r12 verdict item 7): how much of a timed query
is (a) Python-side DataFrame construction (fn call), (b) driver-side
analysis + optimization + physical planning, (c) execution including
codegen/AQE/job launch. Plus a pure job-launch probe (trivial 1-task
job) and a codegen-cache probe (same query re-planned).

Usage: python tools/profile_floor.py [--sf DIR] [q1 q2 ...]
Defaults to a spread of sub-second-class queries.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY
from mit6_5840_6_824_lab1_mapreduce_spark.session import (
    get_spark,
    warm_python_worker_pool,
)

DEFAULT = [
    "file_meta",
    "wc_wordcount",
    "orders_hash_sample",
    "supplier_part_distinct_count",
    "tpch_q6_forecast_revenue",
    "events_hourly_agg",
]


def main() -> None:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        del argv[i : i + 2]
    names = argv or DEFAULT
    spark = get_spark(app_name="profile-floor")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        return (
            df.select(F.xxhash64(*df.columns).alias("_h"))
            .agg(F.bit_xor("_h"))
            .collect()[0][0]
        )

    # Bench-equivalent warmup.
    REGISTRY["tpch_q1_pricing_summary"].fn(spark, sf).count()
    for n in names:
        REGISTRY[n].fn(spark, "/root/testdata/sf0.001").count()
    warm_python_worker_pool(spark)

    # Pure job-launch latency: trivial 1-partition job, min of 10.
    launches = []
    for _ in range(10):
        t0 = time.perf_counter()
        spark.range(1, numPartitions=1).count()
        launches.append(time.perf_counter() - t0)
    print(f"job-launch floor (trivial 1-task job): min {min(launches)*1e3:.0f} ms"
          f" median {sorted(launches)[5]*1e3:.0f} ms")

    # 32-task variant: task-launch scaling.
    launches32 = []
    for _ in range(10):
        t0 = time.perf_counter()
        spark.range(32, numPartitions=32).count()
        launches32.append(time.perf_counter() - t0)
    print(f"job-launch floor (32-task job):        min {min(launches32)*1e3:.0f} ms")

    print(f"{'query':35s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'exec2':>7s} {'total':>7s}")
    for name in names:
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            gc.collect()
            warm_python_worker_pool(spark)
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf)
            t1 = time.perf_counter()
            # analysis + optimization + physical planning (no execution)
            forced = df.select(F.xxhash64(*df.columns).alias("_h")).agg(
                F.bit_xor("_h")
            )
            forced._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            forced.collect()
            t3 = time.perf_counter()
            # re-execute the SAME DataFrame: codegen cache + plan reuse
            # (isolates one-time planning/codegen from steady-state work)
            forced2 = REGISTRY[name].fn(spark, sf)
            f2 = forced2.select(F.xxhash64(*forced2.columns).alias("_h")).agg(
                F.bit_xor("_h")
            )
            t4 = time.perf_counter()
            f2.collect()
            t5 = time.perf_counter()
            row = (t1 - t0, t2 - t1, t3 - t2, t5 - t4, t3 - t0)
            if best is None or row[4] < best[4]:
                best = row
        b, p, e, e2, tot = best
        print(f"{name:35s} {b*1e3:6.0f}m {p*1e3:6.0f}m {e*1e3:6.0f}m {e2*1e3:6.0f}m {tot*1e3:6.0f}m")
    spark.stop()


if __name__ == "__main__":
    main()
