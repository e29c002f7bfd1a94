"""Structured Streaming restatement of the KV state machine (K1-K5).

The reference applies a Raft-ordered op stream to an in-memory map
with per-client duplicate suppression (src/kvraft/server.go:162-225).
Here the op stream arrives as a file/Kafka stream and the map lives in
Spark's keyed state store: ``applyInPandasWithState`` grouped by key,
state = (current value, per-client high-water request id). Durability
(K4's snapshot/restore) is the streaming checkpoint.

Correctness contract: within a micro-batch ops are applied in ``seq``
order; across batches ordering must be provided by the source (the
Raft-log analog — e.g. Kafka partitioned by key). Duplicate
suppression keys on the client's monotone request id, as the
reference does; since a clerk retry replays the *same op on the same
key*, per-key state suffices.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, value string"
STATE_SCHEMA = "value string, clients string"


def _apply_ops(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        value, clients_json = state.get
        clients: dict[str, int] = json.loads(clients_json)
    else:
        value, clients = "", {}

    rows: list[tuple[Any, ...]] = []
    for pdf in pdfs:
        rows.extend(
            pdf[["seq", "client_id", "request_id", "op", "value"]].itertuples(
                index=False, name=None
            )
        )
    rows.sort(key=lambda r: r[0])  # seq order within the batch

    for _seq, client_id, request_id, op, v in rows:
        if op == "Get":
            continue
        ck = str(client_id)
        if ck in clients and request_id <= clients[ck]:
            continue  # duplicate (K5)
        clients[ck] = int(request_id)
        if op == "Put":
            value = v
        elif op == "Append":
            value = value + v

    state.update((value, json.dumps(clients)))
    yield pd.DataFrame({"key": [key[0]], "value": [value]})


def kv_state_stream(ops_stream: DataFrame) -> DataFrame:
    """ops_stream: streaming DataFrame with the op-log schema
    (seq, client_id, request_id, op, key, value). Returns the updated
    (key, value) state per micro-batch."""
    return ops_stream.groupBy("key").applyInPandasWithState(
        _apply_ops,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
