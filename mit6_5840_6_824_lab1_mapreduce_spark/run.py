"""CLI mirroring the reference's worker ergonomics
(``mrworker wc.so 'pg-*.txt'`` → ``python -m
mit6_5840_6_824_lab1_mapreduce_spark.run wc 'pg-*.txt' out/``).

Runs a registered (map, reduce) app over whole-file text inputs and
writes ``"key value"`` lines across n_reduce partitions (S1→C1-C5→S4).
"""

from __future__ import annotations

import argparse

from .operators.mapreduce import run_job, whole_text_input
from .operators.mrapps import APPS
from .session import get_spark
from .sources.text import write_text_output


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="MapReduce job runner (Spark-backed)")
    ap.add_argument("app", choices=sorted(APPS), help="registered app name")
    ap.add_argument("inputs", help="input file glob (whole-file records)")
    ap.add_argument("out_dir", help="output directory (mr-out analog)")
    ap.add_argument("--n-reduce", type=int, default=10)
    args = ap.parse_args(argv)

    spark = get_spark(app_name=f"mr-{args.app}")
    map_fn, reduce_fn = APPS[args.app]
    inputs = whole_text_input(spark, args.inputs)
    result = run_job(inputs, map_fn, reduce_fn, n_reduce=args.n_reduce)
    write_text_output(result, args.out_dir, n_reduce=args.n_reduce)
    spark.stop()


if __name__ == "__main__":
    main()
