"""Property test: the funnel query against a pure-Python first-touch
reference AND its DuckDB oracle on randomized event logs — ties,
missing steps, and out-of-order arrivals included."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .oracle_check import compare_query

_STEPS = ["signup", "view", "click", "purchase"]
_TYPES = _STEPS + ["error"]

_event = st.tuples(
    st.integers(min_value=1, max_value=5),  # user_id
    st.sampled_from(_TYPES),
    st.integers(min_value=0, max_value=30),  # ts seconds
)
_log = st.lists(_event, min_size=1, max_size=40)


def _ref_funnel(events):
    """First-touch funnel: per step, the earliest event strictly after
    the user's earliest previous-step event."""
    prev: dict[int, int] = {}
    counts = []
    for i, step in enumerate(_STEPS):
        cur: dict[int, int] = {}
        for u, ty, ts in events:
            if ty != step:
                continue
            if i > 0 and (u not in prev or ts <= prev[u]):
                continue
            if u not in cur or ts < cur[u]:
                cur[u] = ts
        counts.append(len(cur))
        prev = cur
    return counts


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_log)
def test_funnel_matches_python_and_oracle(spark, tmp_path_factory, events):
    tmp = tmp_path_factory.mktemp("funnel")
    pd.DataFrame(
        {
            "event_id": range(len(events)),
            "ts": pd.to_datetime([e[2] for e in events], unit="s"),
            "user_id": [e[0] for e in events],
            "event_type": [e[1] for e in events],
            "value": [1.0] * len(events),
            "props": ["{}"] * len(events),
        }
    ).to_parquet(tmp / "events.parquet")
    e = REGISTRY["events_funnel_conversion"]
    # Spark == DuckDB on this exact log
    compare_query(spark, e.fn, e.oracle, str(tmp), name="funnel-prop")
    # Spark == pure-Python reference
    rows = e.fn(spark, str(tmp)).orderBy("step_rank").collect()
    assert [r.n_users for r in rows] == _ref_funnel(events)


def test_funnel_strictness_excludes_simultaneous_steps(spark, tmp_path):
    # view at the SAME timestamp as signup must NOT count (strict >).
    pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": pd.to_datetime([10, 10], unit="s"),
            "user_id": [1, 1],
            "event_type": ["signup", "view"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    ).to_parquet(tmp_path / "events.parquet")
    rows = (
        REGISTRY["events_funnel_conversion"]
        .fn(spark, str(tmp_path))
        .orderBy("step_rank")
        .collect()
    )
    assert [r.n_users for r in rows] == [1, 0, 0, 0]
