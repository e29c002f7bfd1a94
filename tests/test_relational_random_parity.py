"""Randomized oracle-parity battery for the RELATIONAL family
(round 6).

Round 5 fuzzed the text/event-ratio/dedup surfaces; this extends the
same defense-against-fixture-luck to the window/percentile/set-op
queries, whose cross-engine determinism rests on different arguments:
class-A tie-free rounding (percentile interpolation of 2-decimal
money), unique-ordering claims under row_number, and session/as-of
boundary conditions. The generators are deliberately tie-heavy:
duplicate prices, duplicate timestamps per user, single-row and
all-equal corner shapes — if any output actually depends on an
under-specified ordering, two engines are where it shows.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .oracle_check import compare_query

# ---- orders (+customer) --------------------------------------------

# Duplicate-heavy prices: a tiny value pool guarantees ties inside
# quartile/percentile interpolation and top-k windows.
_PRICE_CENTS = st.sampled_from(
    [0, 1, 99, 100, 12_345, 12_345, 99_999, 100_000, 5_000_000]
)
_ORDER = st.tuples(
    st.integers(min_value=1, max_value=4),                      # custkey
    _PRICE_CENTS,
    st.sampled_from(["1995-02-03", "1995-11-30", "1996-06-15", "1997-01-02"]),
    st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
)
_ORDERS = st.lists(_ORDER, min_size=1, max_size=30)

_ORDER_QUERIES = [
    "customer_spend_quartiles",
    "orders_top3_per_customer",
    "custkeys_only_small_orders",
    "order_price_percentiles",
    "customers_without_urgent_orders",
]


def _write_orders(tmp, orders) -> None:
    pd.DataFrame(
        {
            "o_orderkey": range(1, len(orders) + 1),
            "o_custkey": [o[0] for o in orders],
            "o_orderstatus": ["F"] * len(orders),
            "o_totalprice": [o[1] / 100.0 for o in orders],
            "o_orderdate": pd.to_datetime([o[2] for o in orders]),
            "o_orderpriority": [o[3] for o in orders],
        }
    ).to_parquet(tmp / "orders.parquet", coerce_timestamps="us")
    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_name": ["c1", "c2", "c3", "c4"],
            "c_nationkey": pd.array([0, 1, 2, 0], dtype="int32"),
            "c_acctbal": [0.0] * 4,
            "c_mktsegment": ["BUILDING", "MACHINERY", "BUILDING", "AUTOMOBILE"],
        }
    ).to_parquet(tmp / "customer.parquet")


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_ORDERS)
def test_order_window_queries_match_oracle_on_tie_heavy_orders(
    spark, tmp_path_factory, orders
):
    tmp = tmp_path_factory.mktemp("randorders")
    _write_orders(tmp, orders)
    for name in _ORDER_QUERIES:
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp), name=f"rand-{name}")


# ---- events: sessions / as-of / MAD --------------------------------

# Duplicate timestamps per user are the as-of edge: multiple purchases
# at the SAME second as a click, and session gaps exactly at the
# boundary.
_EVENT = st.tuples(
    st.integers(min_value=1, max_value=3),                       # user
    st.sampled_from(["click", "view", "purchase", "error"]),
    st.sampled_from(
        [0, 1, 2, 59, 60, 61, 599, 600, 601, 1799, 1800, 1801, 3600]
    ),
    st.integers(min_value=0, max_value=99_999),                  # cents
)
_EVENTS = st.lists(_EVENT, min_size=2, max_size=40)

_EVENT_QUERIES = [
    "events_sessionization",
    "events_asof_last_purchase",
    "events_mad_outliers",
    # bucketed range join: the ts pool lands clicks exactly ON the
    # 600 s bucket edge and both sides of the 10-minute window bound
    "events_error_click_window",
]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_EVENTS)
def test_session_asof_mad_queries_match_oracle_on_tied_timestamps(
    spark, tmp_path_factory, events
):
    tmp = tmp_path_factory.mktemp("randevents2")
    pd.DataFrame(
        {
            "event_id": range(len(events)),
            "ts": pd.to_datetime([e[2] for e in events], unit="s"),
            "user_id": [e[0] for e in events],
            "event_type": [e[1] for e in events],
            "value": [e[3] / 100.0 for e in events],
            "props": ["{}"] * len(events),
        }
    ).to_parquet(tmp / "events.parquet", coerce_timestamps="us")
    for name in _EVENT_QUERIES:
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp), name=f"rand-{name}")


# ---- documents: decile interpolation over integer lengths ----------

_DOCLENS = st.lists(
    st.sampled_from([0, 1, 1, 7, 7, 7, 100, 101, 9999]),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_DOCLENS)
def test_doc_length_deciles_match_oracle_on_duplicate_lengths(
    spark, tmp_path_factory, lens
):
    tmp = tmp_path_factory.mktemp("randdocs2")
    pd.DataFrame(
        {
            "doc_id": range(len(lens)),
            "text": ["x" * min(n, 50) for n in lens],
            "lang": ["en"] * len(lens),
            "source": [f"s{i % 2}" for i in range(len(lens))],
            "n_chars": lens,
        }
    ).to_parquet(tmp / "documents.parquet")
    e = REGISTRY["doc_length_deciles"]
    compare_query(spark, e.fn, e.oracle, str(tmp), name="rand-doc_length_deciles")
