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
    # ONE shuffle builds the deduped, co-partitioned adjacency (r12
    # optimization round, guide §2.4): repartition("src") FIRST, then
    # dedupe with groupBy(src, dst) — hashpartitioning(src) satisfies
    # the aggregate's clustering requirement (src is a prefix of the
    # grouping key), so the dedup adds NO second exchange and the
    # cached table comes out hash-partitioned on the join key, which
    # every round's join then reads co-partitioned (the per-round
    # shuffle moves only the label side). This replaces the r05-r11
    # shape (distinct -> count -> repartition(n_parts) -> persist ->
    # count -> unpersist), which paid TWO full passes over the edge
    # list and two extra job launches before the loop could start,
    # just to hand-size the partition count; AQE's partition
    # coalescing now sizes the shuffle from the data instead
    # (scale-adaptive, guide §2.2).
    adj = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .repartition("src")
        .distinct()
        .persist()
    )
    # localCheckpoint rather than persist: an iterative loop must
    # TRUNCATE lineage each round or the logical plan doubles per
    # iteration (labels appears twice per round) and planning itself
    # OOMs after ~15 rounds. Checkpointed partitions live on the
    # executors; the driver only ever sees the scalar `changed` count.
    # LAZY (r12): the first round's convergence count is the action
    # that materializes it — an eager checkpoint here was one more
    # job launch per call for partitions that round 1 reads anyway.
    #
    # Round 1 is FUSED into initialization: with identity labels the
    # first propagate's join degenerates to min(src) per dst, so pay
    # one aggregate here and skip a full join+checkpoint+count round
    # trip (round-5 perf item — one fewer iteration on every call).
    # Only edge-endpoint vertices iterate; the singleton majority (in
    # a near-dup graph, almost everything) never enters the loop and
    # is unioned back at the end as its own component. At corpus scale
    # this shrinks every per-round shuffle from |V| to |V_with_edges|.
    # The adjacency is SYMMETRIC, so groupBy(dst) already covers every
    # endpoint vertex — the r05-r11 shape's separate active-vertex
    # distinct + left join against this aggregate produced exactly the
    # same rows for one more shuffle and an extra join (removed r12).
    labels = (
        adj.groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("nbr_component"))
        .select(
            "id",
            F.least(F.col("id"), F.col("nbr_component")).alias("component"),
        )
        .localCheckpoint(eager=False)
    )

    def propagate(lbl: DataFrame) -> DataFrame:
        """One min-label step: (id, component, _chg)."""
        neighbor_min = (
            adj.join(lbl, adj.src == lbl.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        nxt = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_component"), F.col("component")),
        )
        # the change flag is derived in the SAME pass as the label
        # update (old label is already in hand) — a separate
        # new-vs-old join would pay one more shuffle for information
        # this select already has
        return lbl.join(neighbor_min, "id", "left").select(
            "id",
            nxt.alias("component"),
            (nxt != F.col("component")).alias("_chg"),
        )

    changed = -1  # sentinel: max_iter=0 reaches the for-else with no rounds run
    try:
        for _ in range(max_iter):
            # ONE propagation step per checkpointed round. (A doubled
            # step — two joins per checkpoint to halve the per-round
            # job count — was measured 50% SLOWER at bench scale: the
            # deeper per-round lineage costs more than the saved job
            # launches. Keep the loop shape simple.) The checkpoint is
            # LAZY: the convergence count is the action that
            # materializes it, so each round launches one job, not two
            # (an eager checkpoint ran its own job and the count a
            # second — measured round-6, the extra launch was pure
            # overhead since the count touches every partition anyway).
            new_labels = propagate(labels).localCheckpoint(eager=False)
            changed = new_labels.where("_chg").count()
            labels = new_labels.drop("_chg")
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


def weighted_pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = 1_000_000,
    truncate_every: int = 4,
) -> DataFrame:
    """Weighted PageRank, damping 0.85, FIXED iteration count, exact
    integer arithmetic: ranks are scaled integers (start = `scale`),
    per-edge contribution is ``(rank * weight) div out_weight`` and
    the update is ``0.15*scale + (85 * inflow) div 100`` — floor
    division everywhere, so the result is bit-identical on any
    engine/partitioning (no float summation ever occurs). The fixed
    count (vs convergence test) keeps the op expressible as chained
    SQL CTEs for the oracle; production would loop to an epsilon the
    same way connected_components does.

    ``edges``: (src, dst, weight>0) directed. Returns (node,
    rank_scaled). Per round: one join keyed on src (adjacency cached
    co-partitioned) + one aggregate by dst — edge-count-proportional
    shuffles, the same shape GraphX/Pregel lowers to. Lineage is
    truncated every `truncate_every` rounds (`localCheckpoint`; see
    below — the CC loop truncates per round, this op amortizes).
    int64 headroom: rank mass is bounded by |V|*scale, so
    rank*weight needs |V|*scale*max_w < 2^63 — at web scale move
    `scale` down or the contribution column to decimal(38,0).

    ``truncate_every``: lineage is truncated (eager localCheckpoint)
    every k rounds instead of every round (round-6 measurement: each
    eager checkpoint is a full job launch, which DOMINATED the fixed
    5-round run on a dimension-sized graph). Plan depth between
    truncations stays bounded at k joins — safe at any scale — and
    the FINAL ranks are always checkpointed so the returned frame is
    materialized before the cached adjacency is unpersisted.
    """
    # Out-weight via a window over the SAME src shuffle the adjacency
    # cache needs anyway (r12 optimization round): the r05-r11 shape
    # (groupBy(src) then join back on src) re-derived the edge table
    # on both sides of that join and paid the join itself; a
    # sum-over-partition window on the repartitioned edges attaches
    # `ow` in the same exchange — one pass, identical values (integer
    # sum, order-free).
    from pyspark.sql import Window

    adj = (
        edges.select("src", "dst", F.col("weight").alias("w"))
        .repartition("src")
        .withColumn("ow", F.sum("w").over(Window.partitionBy("src")))
        .persist()
    )
    nodes = (
        adj.select(F.col("src").alias("node"))
        .union(adj.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    base = int(0.15 * scale)
    # LAZY initial checkpoint (r12): the first eager truncation below
    # materializes it; plan depth until then is bounded by
    # truncate_every rounds. The r05-r11 eager form launched one more
    # job per call purely to materialize an identity projection.
    # Degenerate n_iter < 1 (ADVICE r12): the loop never runs, so the
    # initial ranks ARE the final ranks — checkpoint eagerly to honor
    # the contract that the returned frame is materialized before the
    # cached adjacency is unpersisted in the finally block.
    ranks = nodes.select(
        "node", F.lit(scale).cast("long").alias("r")
    ).localCheckpoint(eager=(n_iter < 1))
    try:
        for i in range(n_iter):
            contrib = (
                adj.join(ranks, adj.src == ranks.node)
                .select(F.col("dst").alias("node"), F.expr("(r * w) div ow").alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
            ranks = nodes.join(contrib, "node", "left").select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr("(85 * coalesce(inflow, 0L)) div 100")
                ).alias("r"),
            )
            if (i + 1) % truncate_every == 0 or i == n_iter - 1:
                # Intermediate truncations are LAZY (materialized by
                # whatever computes through them — plan depth stays
                # bounded either way); only the FINAL ranks checkpoint
                # is eager, honoring the contract that the returned
                # frame is materialized before the cached adjacency is
                # unpersisted in the finally block.
                ranks = ranks.localCheckpoint(eager=(i == n_iter - 1))
        return ranks.select("node", F.col("r").alias("rank_scaled"))
    finally:
        adj.unpersist()
        nodes.unpersist()
