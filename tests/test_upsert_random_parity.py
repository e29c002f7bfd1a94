"""Randomized reference-model battery for the MERGE/upsert operator
(round 6) — the `test_kv.py` replay pattern applied to the table-scale
mutation surface: random initial tables and random update-batch
sequences, with the ground truth a pure-Python dict replay of the
documented contract (batch beats existing; within a batch the highest
`order_col` wins; only touched partitions rewritten).

Axes the fixed cases in test_upsert.py never exercise: multi-batch
sequences where later batches overwrite earlier batches' winners,
duplicate keys inside a batch with adversarial order values, batches
mixing inserts and updates across several partitions, and batches
touching a strict subset of partitions repeatedly. Keys are
partition-stable by construction, per the operator's precondition
(an update arrives in the partition its key lives in)."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.operators.upsert import merge_upsert

# Non-date-like partition values: Spark's partition-value type
# inference would read day=2024-01-01 back as a DATE, changing the
# round-tripped schema out from under the string-keyed replay.
_DAYS = ["p1", "p2", "p3"]
_SCHEMA = "key long, value long, ord long, day string"

# A batch is a list of (key, value, day_idx) rows; `ord` is assigned
# from the row position so duplicate keys in one batch always have
# DISTINCT order values (ties on (_src, ord) would make row_number —
# and therefore the contract — nondeterministic).
_row = st.tuples(
    st.integers(min_value=0, max_value=11),
    st.integers(min_value=-100, max_value=100),
    st.integers(min_value=0, max_value=len(_DAYS) - 1),
)
_scenario = st.tuples(
    st.lists(_row, min_size=0, max_size=8),               # initial table
    st.lists(st.lists(_row, min_size=1, max_size=8),      # update batches
             min_size=1, max_size=3),
)


def _stabilize(rows, day_of_key):
    """Pin each key's partition: first sighting chooses the day, every
    later row of that key (same batch or later) inherits it."""
    out = []
    for i, (k, v, d) in enumerate(rows):
        day = day_of_key.setdefault(k, _DAYS[d])
        out.append((k, v, i, day))  # ord = position in the batch
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_scenario)
def test_merge_upsert_matches_dict_replay(spark, scenario):
    initial, batches = scenario
    day_of_key: dict[int, str] = {}
    # initial table: last row per key wins (plain overwrite semantics
    # for fixture construction, applied identically to the replay)
    init_rows = {r[0]: r for r in _stabilize(initial, day_of_key)}
    state: dict[int, tuple] = dict(init_rows)

    d = tempfile.mkdtemp(prefix="mrmerge-rand-")
    path = f"{d}/tbl"
    try:
        if init_rows:
            spark.createDataFrame(
                list(init_rows.values()), _SCHEMA
            ).write.mode("overwrite").partitionBy("day").parquet(path)

        for batch in batches:
            rows = _stabilize(batch, day_of_key)
            touched = merge_upsert(
                spark,
                path,
                spark.createDataFrame(rows, _SCHEMA),
                key_cols=["key"],
                partition_col="day",
                order_col="ord",
            )
            assert sorted(set(touched)) == sorted({r[3] for r in rows})
            # replay: within the batch the highest ord wins, and the
            # batch winner replaces whatever the table held
            winners: dict[int, tuple] = {}
            for r in rows:
                if r[0] not in winners or r[2] > winners[r[0]][2]:
                    winners[r[0]] = r
            state.update(winners)

        got = {
            (r["key"], r["value"], r["ord"], r["day"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == set(state.values())
    finally:
        shutil.rmtree(d, ignore_errors=True)
