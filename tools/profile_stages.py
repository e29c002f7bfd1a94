"""Per-stage runtime attribution for a registered query (guide §1/§7:
find WHERE the time goes before changing anything).

Runs the query with the bench's forcing action on a UI-enabled session,
then prints every stage of the run, newest first: wall duration,
summed executor run time, input/shuffle volumes, task count, and the
stage's name (which names the top operator).

Usage: python tools/profile_stages.py <query> [<query>...] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY
from mit6_5840_6_824_lab1_mapreduce_spark.session import get_spark


def force(df):
    h = df.select(F.xxhash64(*df.columns).alias("_h"))
    return h.agg(F.bit_xor("_h")).collect()[0][0]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark(
        app_name="profile-stages",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    # bench-style warmup
    REGISTRY["tpch_q1_pricing_summary"].fn(spark, sf).count()
    warm = "/root/testdata/sf0.001"
    for name in args:
        REGISTRY[name].fn(spark, warm).count()
    from mit6_5840_6_824_lab1_mapreduce_spark.session import warm_python_worker_pool

    warm_python_worker_pool(spark)

    for name in args:
        import gc

        spark.catalog.clearCache()
        gc.collect()
        url = f"http://localhost:4099/api/v1/applications/{app_id}/stages?status=complete"
        before = {s["stageId"] for s in json.load(urllib.request.urlopen(url))}
        t0 = time.perf_counter()
        force(REGISTRY[name].fn(spark, sf))
        wall = time.perf_counter() - t0
        stages = json.load(urllib.request.urlopen(url))
        new = sorted(
            (s for s in stages if s["stageId"] not in before),
            key=lambda s: -(s.get("executorRunTime") or 0),
        )
        print(f"\n=== {name}: wall {wall:.3f}s, {len(new)} stages ===")
        tot_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"    total executorRunTime {tot_run/1000:.2f}s  (x{tot_run/1000/max(wall,1e-9):.1f} parallelism)")
        for s in new[:14]:
            dur = (s.get("executorRunTime") or 0) / 1000
            sub = s.get("submissionTime", "")[-12:-3]
            nm = s.get("name", "")[:70]
            ntask = s.get("numCompleteTasks", s.get("numTasks", 0))
            inp = (s.get("inputBytes") or 0) / 1e6
            sr = (s.get("shuffleReadBytes") or 0) / 1e6
            sw = (s.get("shuffleWriteBytes") or 0) / 1e6
            cpu = (s.get("executorCpuTime") or 0) / 1e9
            print(
                f"  run {dur:7.2f}s cpu {cpu:7.2f}s tasks {ntask:3d} "
                f"in {inp:7.1f}MB sr {sr:6.1f}MB sw {sw:6.1f}MB  {sub} {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
