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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1 word count — the reference's namesake job)
    on the smoke-scale tables."""
    return REGISTRY[FLAGSHIP].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}
