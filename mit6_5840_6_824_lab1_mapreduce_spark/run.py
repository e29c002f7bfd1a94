"""CLI mirroring the reference's worker ergonomics
(``mrworker wc.so 'pg-*.txt'`` → ``python -m
mit6_5840_6_824_lab1_mapreduce_spark.run mr wc 'pg-*.txt' out/``).

Two subcommands:

- ``mr <app> <glob> <out_dir>``: run a registered (map, reduce) app
  over whole-file text inputs and write ``"key value"`` lines across
  n_reduce partitions (S1→C1-C5→S4).
- ``query <name> <sf_dir>``: run any registered analytics query from
  the engine's registry and print results (csv or json lines) —
  ``query --list`` enumerates them all.

The bare legacy form ``run wc 'pg-*.txt' out/`` still works.
"""

from __future__ import annotations

import argparse
import sys

from .operators.mapreduce import run_job, whole_text_input
from .operators.mrapps import APPS
from .session import get_spark
from .sources.text import write_text_output


def _run_mr(app: str, inputs: str, out_dir: str, n_reduce: int) -> None:
    spark = get_spark(app_name=f"mr-{app}")
    map_fn, reduce_fn = APPS[app]
    result = run_job(whole_text_input(spark, inputs), map_fn, reduce_fn, n_reduce=n_reduce)
    write_text_output(result, out_dir, n_reduce=n_reduce)
    spark.stop()


def _run_query(name: str, sf_dir: str, fmt: str, limit: int | None) -> None:
    from .queries import REGISTRY

    if name not in REGISTRY:
        raise SystemExit(
            f"unknown query {name!r}; --list shows the {len(REGISTRY)} available"
        )
    spark = get_spark(app_name=f"query-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[name].fn(spark, sf_dir)
    if limit:
        df = df.limit(limit)
    rows = df.toJSON().collect() if fmt == "json" else None
    if fmt == "json":
        for r in rows:
            print(r)
    else:
        pdf = df.toPandas()
        pdf.to_csv(sys.stdout, index=False)
    spark.stop()


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    # legacy form: first arg is a registered MR app name
    if argv and argv[0] in APPS:
        argv = ["mr", *argv]

    ap = argparse.ArgumentParser(description="Spark-backed engine CLI")
    sub = ap.add_subparsers(dest="cmd", required=True)

    mr = sub.add_parser("mr", help="run a MapReduce app (mrworker analog)")
    mr.add_argument("app", choices=sorted(APPS), help="registered app name")
    mr.add_argument("inputs", help="input file glob (whole-file records)")
    mr.add_argument("out_dir", help="output directory (mr-out analog)")
    mr.add_argument("--n-reduce", type=int, default=10)

    q = sub.add_parser("query", help="run a registered analytics query")
    q.add_argument("name", nargs="?", help="query name (see --list)")
    q.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01",
                   help="table directory (default sf0.01)")
    q.add_argument("--format", choices=["csv", "json"], default="csv")
    q.add_argument("--limit", type=int, default=None)
    q.add_argument("--list", action="store_true", help="list query names")

    args = ap.parse_args(argv)
    if args.cmd == "mr":
        _run_mr(args.app, args.inputs, args.out_dir, args.n_reduce)
    else:
        if args.list:
            from .queries import REGISTRY

            for name in sorted(REGISTRY):
                print(name)
            return
        if not args.name:
            raise SystemExit("query name required (or --list)")
        _run_query(args.name, args.sf_dir, args.format, args.limit)


if __name__ == "__main__":
    main()
