"""Streaming MERGE sink: foreachBatch → partitioned upsert.

The reference's KV surface applies an op-stream to a state machine
exactly once (src/kvraft/server.go:128-199 — per-client dedup +
Raft-ordered apply); this sink is the table-scale equivalent:
each micro-batch is MERGEd into a partitioned parquet table by key,
so replayed batches (restart after a crash between the merge and the
checkpoint commit) re-apply the same keys idempotently —
last-writer-wins convergence instead of duplicate rows.

100 TB posture: the merge cost per micro-batch is bounded by the
batch's partition footprint (see operators/upsert.py), so a
continuous pipeline rewrites only the hot partitions each trigger;
the checkpoint gives exactly-once batch tracking on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.upsert import merge_upsert


def stream_merge_to_table(
    stream: DataFrame,
    target_path: str,
    key_cols: list[str],
    partition_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
    order_col: str | None = None,
) -> StreamingQuery:
    """Start a streaming query that upserts every micro-batch into
    the parquet table at `target_path` (created on first batch).

    `order_col` (e.g. an event seq/ts, descending) picks the winner
    among duplicate keys WITHIN a micro-batch. Without it that choice
    would fall to an arbitrary row_number tie-break, which can differ
    when a batch is replayed after a crash — breaking the idempotent
    last-writer-wins convergence this sink promises. It is required
    unless each batch is pre-deduplicated to one row per key."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession,
            target_path,
            batch_df,
            key_cols=key_cols,
            partition_col=partition_col,
            order_col=order_col,
        )

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
