"""Randomized parity battery for the WIDE exact-ratio consumers
(round-6, verdict r05 task 5).

`tpch_q8_market_share` / `tpch_q14_promo_revenue` compute money-share
ratios through `exact_ratio_wide_*` (DECIMAL(38,0) / HUGEINT) because
their numerators — money sums scaled by 10^4·10^6 — pass the int64
ceiling at realistic volumes. The helper is property-tested at the
unit level (`tests/test_exact_round.py`); this battery drives the two
FULL queries through the Spark-vs-DuckDB compare on generated
lineitem-shaped rows whose price magnitudes are adversarial:

- an "overflow band" (~10^12 cents/line) whose sums make the narrow
  int64 idiom throw (ANSI) — only the wide idiom survives;
- a "cast-safety band" (~10^14 cents ≈ 10^12 dollars/line), the
  largest magnitude where a cents-derived double still casts to the
  same DECIMAL(18,2) on both engines tie-free. Beyond value·100 ≈
  2^53·0.005 a double can land exactly on x.125-style dyadic
  half-cent ties where the engines' double→decimal casts may round
  differently — an input-cast hazard documented in SCALE.md §audit
  (class A), distinct from the ratio idiom under test, so the
  generator stays under it on purpose;
- exact zeros (all-zero revenue → NULL share via the idiom's nullif
  guard on both engines).

Joins/filters (PROMO parts, EUROPE customers, NATION_7 suppliers, the
Q14 ship-month) are randomized so empty numerators, empty months and
empty join legs all occur.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .oracle_check import compare_query

# Price in cents. Bands per the module docstring.
_CENTS = st.one_of(
    st.integers(min_value=0, max_value=99_999),
    st.integers(min_value=10**11, max_value=5 * 10**11),
    st.integers(min_value=5 * 10**13, max_value=10**14),
    st.just(0),
)

# One lineitem row: (orderkey, partkey, suppkey, cents, discount%, in_month)
_LINE = st.tuples(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=3),
    _CENTS,
    st.integers(min_value=0, max_value=10),
    st.booleans(),
)

_LINES = st.lists(_LINE, min_size=1, max_size=24)


def _write_star(tmp, lines) -> None:
    """A minimal TPC-H star around the generated lineitem rows, with
    every join leg Q8/Q14 touches. Same column names/dtypes as the
    driver-generated parquet (lineitem money columns are DOUBLE there
    too — prices here are cents/100 doubles, exact-cast-safe per the
    module docstring)."""
    pd.DataFrame(
        {"r_regionkey": [0, 1], "r_name": ["EUROPE", "ASIA"]}
    ).astype({"r_regionkey": "int32"}).to_parquet(tmp / "region.parquet")
    # NATION_7 present (Q8's numerator nation); nation 2 sits outside
    # EUROPE so customer legs can drop out of Q8 entirely.
    pd.DataFrame(
        {
            "n_nationkey": [0, 1, 2],
            "n_name": ["NATION_7", "NATION_1", "NATION_2"],
            "n_regionkey": [0, 0, 1],
        }
    ).astype({"n_nationkey": "int32", "n_regionkey": "int32"}).to_parquet(
        tmp / "nation.parquet"
    )
    pd.DataFrame(
        {
            "s_suppkey": [1, 2, 3],
            "s_name": ["s1", "s2", "s3"],
            "s_nationkey": [0, 1, 2],
            "s_acctbal": [0.0, 0.0, 0.0],
        }
    ).astype({"s_nationkey": "int32"}).to_parquet(tmp / "supplier.parquet")
    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_name": ["c1", "c2", "c3"],
            "c_nationkey": [0, 1, 2],
            "c_acctbal": [0.0, 0.0, 0.0],
            "c_mktsegment": ["BUILDING"] * 3,
        }
    ).astype({"c_nationkey": "int32"}).to_parquet(tmp / "customer.parquet")
    pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4],
            "p_name": ["pa", "pb", "pc", "pd"],
            "p_brand": ["Brand#11"] * 4,
            "p_type": ["PROMO", "STANDARD", "PROMO", "ECONOMY"],
            "p_size": [1, 2, 3, 4],
            "p_retailprice": [1.0, 2.0, 3.0, 4.0],
        }
    ).astype({"p_size": "int32"}).to_parquet(tmp / "part.parquet")
    # Orders across two years; custkey cycles all three nations.
    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 2, 3, 1],
            "o_orderstatus": ["F"] * 4,
            "o_totalprice": [0.0] * 4,
            "o_orderdate": pd.to_datetime(
                ["1995-03-01", "1995-07-01", "1996-02-01", "1996-11-01"]
            ),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    ).to_parquet(tmp / "orders.parquet", coerce_timestamps="us")
    pd.DataFrame(
        {
            "l_orderkey": [ln[0] for ln in lines],
            "l_partkey": [ln[1] for ln in lines],
            "l_suppkey": [ln[2] for ln in lines],
            "l_linenumber": pd.array(range(1, len(lines) + 1), dtype="int32"),
            "l_quantity": [1.0] * len(lines),
            "l_extendedprice": [ln[3] / 100.0 for ln in lines],
            "l_discount": [ln[4] / 100.0 for ln in lines],
            "l_tax": [0.0] * len(lines),
            "l_returnflag": ["N"] * len(lines),
            "l_linestatus": ["O"] * len(lines),
            "l_shipdate": pd.to_datetime(
                [
                    "1996-09-15" if ln[5] else "1995-06-01"
                    for ln in lines
                ]
            ),
        }
    ).to_parquet(tmp / "lineitem.parquet", coerce_timestamps="us")


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_LINES)
def test_wide_ratio_tpch_queries_match_oracle_on_adversarial_money(
    spark, tmp_path_factory, lines
):
    tmp = tmp_path_factory.mktemp("widemoney")
    _write_star(tmp, lines)
    for name in ("tpch_q14_promo_revenue", "tpch_q8_market_share"):
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp), name=f"wide-{name}")


def test_narrow_idiom_would_overflow_on_the_band(spark, tmp_path):
    """Meta-check that the overflow band actually stresses the wide
    idiom: the SAME aggregate through the narrow int64 idiom must
    throw under ANSI on a corpus from the top band — i.e. the battery
    above is exercising territory the narrow form cannot survive."""
    import pytest
    from pyspark.sql import functions as F

    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
    from mit6_5840_6_824_lab1_mapreduce_spark.queries._util import (
        exact_ratio_spark,
    )

    lines = [(1, 1, 1, 10**14, 0, True)] * 8  # 8 x 10^12-dollar lines
    _write_star(tmp_path, lines)
    li = table(spark, str(tmp_path), "lineitem")
    agg = li.agg(
        exact_ratio_spark(
            "sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000",
            "sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000",
        ).alias("share")
    )
    with pytest.raises(Exception, match="(?i)overflow|cast|out of range"):
        agg.collect()
    # and the wide twin returns the exact share on the same input
    from mit6_5840_6_824_lab1_mapreduce_spark.queries._util import (
        exact_ratio_wide_spark,
    )

    got = li.agg(
        exact_ratio_wide_spark(
            "sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000",
            "sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000",
        ).alias("share")
    ).collect()[0]["share"]
    assert got == 1.0
