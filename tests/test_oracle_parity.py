"""Every registered query with an oracle must hash-match DuckDB —
the local restatement of the driver's CORRECTNESS gate, run at the
same sf it uses (0.01)."""

from __future__ import annotations

import pytest

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .conftest import SF_CORRECT
from .oracle_check import compare_query

CASES = [(n, e) for n, e in sorted(REGISTRY.items()) if e.oracle is not None]


@pytest.mark.parametrize("name,entry", CASES, ids=[n for n, _ in CASES])
def test_query_matches_oracle(spark, name, entry):
    compare_query(spark, entry.fn, entry.oracle, SF_CORRECT, name=name)


def test_all_queries_return_rows(spark):
    for name, e in sorted(REGISTRY.items()):
        df = e.fn(spark, SF_CORRECT)
        assert df.limit(1).count() >= 0, name
