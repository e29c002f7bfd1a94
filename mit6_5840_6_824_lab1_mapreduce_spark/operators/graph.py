"""Iterative graph operators: connected components by min-label
propagation — the clustering step that turns near-duplicate PAIRS
into dedup GROUPS (keep one doc per component).

This is the one operator class here that is inherently iterative:
each round is a join + aggregate (both hash-partitioned by vertex),
and the loop runs until no label changes — ≤ graph-diameter rounds.
Near-dup graphs are forests of tiny cliques, so the diameter is small
and the per-round shuffle is proportional to the edge count, never
quadratic. Labels persist per round and the previous round is
unpersisted (bounded storage); convergence is checked with a count()
on changed labels (the only driver-side value — a scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """``vertices``: one column ``id``. ``edges``: columns
    ``id_a, id_b`` (undirected, any orientation). Returns
    ``(id, component)`` where component = min vertex id reachable.

    Deterministic: min-label propagation has a unique fixed point.
    """
    adj0 = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    # Size the per-round parallelism to the EDGE COUNT, not the
    # session default: each iteration launches join+agg+count jobs,
    # and on a near-dup graph (hundreds of edges) a 32-way shuffle
    # per round is pure task-scheduling overhead — ~20k edges per
    # partition keeps tasks meaningful, while a corpus-scale graph
    # still fans out to the full default parallelism. The persisted
    # adjacency is cached ALREADY HASH-PARTITIONED on the join key,
    # so every round's join reads it co-partitioned (the per-round
    # shuffle moves only the label side).
    spark = edges.sparkSession
    n_edges = adj0.count()
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n_edges // 20_000 + 1))
    adj = adj0.repartition(n_parts, "src").persist()
    adj.count()
    adj0.unpersist()
    # Only edge-endpoint vertices iterate; the singleton majority (in
    # a near-dup graph, almost everything) never enters the loop and
    # is unioned back at the end as its own component. At corpus scale
    # this shrinks every per-round shuffle from |V| to |V_with_edges|.
    active = adj.select(F.col("src").alias("id")).distinct()
    # localCheckpoint (eager) rather than persist: an iterative loop
    # must TRUNCATE lineage each round or the logical plan doubles per
    # iteration (labels appears twice per round) and planning itself
    # OOMs after ~15 rounds. Checkpointed partitions live on the
    # executors; the driver only ever sees the scalar `changed` count.
    labels = active.select("id", F.col("id").alias("component")).localCheckpoint()

    changed = -1  # sentinel: max_iter=0 reaches the for-else with no rounds run
    try:
        for _ in range(max_iter):
            # each vertex's candidate label: min over its neighbors' labels
            neighbor_min = (
                adj.join(labels, adj.src == labels.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(neighbor_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")),
                    ).alias("component"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            # exhausted max_iter with labels still moving: the result is
            # a PARTIAL propagation, not components — callers on a deeper
            # graph must not mistake it for converged output
            raise RuntimeError(
                f"connected_components did not converge within {max_iter} "
                f"iterations ({changed} labels still changing); raise "
                "max_iter (diameter of the pair graph exceeds it)"
            )

        singletons = (
            vertices.join(labels.select("id"), "id", "left_anti")
            .select("id", F.col("id").alias("component"))
        )
        return labels.unionByName(singletons)
    finally:
        # runs on the non-convergence raise too — the persisted
        # adjacency table must not outlive the call
        adj.unpersist()
