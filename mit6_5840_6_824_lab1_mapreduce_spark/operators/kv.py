"""KV state-machine replay (SURVEY §2.4, K1-K5).

Reference semantics (src/kvraft/KVMachine.go:7-28, server.go:128-134):
  - Put(key, v): last-writer-wins overwrite
  - Append(key, v): string concatenation, creates if absent
  - exactly-once: an op with request_id ≤ the client's running
    high-water mark is suppressed (server.go:128-134)
  - Get: non-mutating; ErrNoKey → "" at the client

Raft's commit order is modeled by an explicit ``seq`` column. The
replay is pure DataFrame algebra — one window for dedup, one
aggregation per key — so it scales to an op log of any size: state is
never collected, and the only shuffles are by (client_id, request_id)
then by key.

Expected op-log schema:
  seq BIGINT, client_id BIGINT, request_id BIGINT,
  op STRING ('Get'|'Put'|'Append'), key STRING, value STRING
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_ops(ops: DataFrame) -> DataFrame:
    """K5: suppress any mutating op whose request_id is ≤ the client's
    running high-water mark at commit time — the reference keeps
    ``lastRequestId[clientId]`` and drops ops at or below it
    (src/kvraft/server.go:128-134), which on a log with regressing ids
    (a stale retry committing after a newer request) drops MORE than
    per-(client, request) first-occurrence would. Gets pass through
    (only PutAppend ids are tracked, server.go:186-199).

    One window shuffle on client_id; the high-water mark is a running
    max over preceding commits, so no state leaves the executors."""
    muts = ops.where(F.col("op") != "Get")
    w = (
        Window.partitionBy("client_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hw = F.max("request_id").over(w)
    return (
        muts.withColumn("_hw", hw)
        .where(F.col("_hw").isNull() | (F.col("request_id") > F.col("_hw")))
        .drop("_hw")
    )


def replay_final_state(ops: DataFrame) -> DataFrame:
    """K1-K3: final (key, value) state after replaying the op log in
    ``seq`` order with duplicate suppression.

    value(key) = value of the last Put (or '' if none) ++ concat of
    all deduped Appends committed after that Put, in commit order.
    """
    muts = dedup_ops(ops)
    per_key = muts.groupBy("key").agg(
        F.max(F.when(F.col("op") == "Put", F.col("seq"))).alias("put_seq"),
        F.max(
            F.when(F.col("op") == "Put", F.struct("seq", "value"))
        ).alias("last_put"),
        F.collect_list(
            F.when(F.col("op") == "Append", F.struct("seq", "value"))
        ).alias("appends"),
    )
    # Appends after the last Put, sorted by commit order, concatenated.
    appended = F.array_join(
        F.transform(
            F.array_sort(
                F.filter(
                    "appends",
                    lambda a: a["seq"] > F.coalesce(F.col("put_seq"), F.lit(-1)),
                )
            ),
            lambda a: a["value"],
        ),
        "",
    )
    base = F.coalesce(F.col("last_put")["value"], F.lit(""))
    return per_key.select("key", F.concat(base, appended).alias("value"))


def lookup(state: DataFrame, key: str) -> str:
    """K1 Get against a replayed state; ErrNoKey → '' (client.go:57-59)."""
    row = state.where(F.col("key") == key).select("value").collect()
    return row[0][0] if row else ""


def replay_python_model(ops_rows: list[tuple]) -> dict[str, str]:
    """The reference model restated in pure Python (models/kv.go:40-54 +
    dedup) — the differential-test oracle. ops_rows: (seq, client_id,
    request_id, op, key, value) tuples in any order."""
    state: dict[str, str] = {}
    last_req: dict[int, int] = {}
    for seq, client_id, request_id, op, key, value in sorted(ops_rows):
        if op == "Get":
            continue
        if client_id in last_req and request_id <= last_req[client_id]:
            continue
        last_req[client_id] = request_id
        if op == "Put":
            state[key] = value
        elif op == "Append":
            state[key] = state.get(key, "") + value
    return state
