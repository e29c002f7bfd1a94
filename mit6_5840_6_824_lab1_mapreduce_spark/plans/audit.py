"""Physical-plan audit: the `.explain("formatted")` discipline as a
queryable API. Every operator in this repo was iterated against its
physical plan (pushdown reached the scan? dimensions broadcast? Python
only where a codec runs?); this module turns those checks into a
structured report so CI, notebooks, and the registry hygiene tests
share ONE definition of "the plan is scale-clean".
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanAudit:
    n_exchanges: int            # shuffle boundaries (Exchange hashpartitioning/range)
    n_broadcast_joins: int      # BroadcastHashJoin operators
    n_sortmerge_joins: int      # SortMergeJoin operators
    n_nested_loop_joins: int    # BroadcastNestedLoopJoin (1-row/bounded builds only)
    n_python_stages: int        # Arrow/row Python evaluation stages
    n_wholestage_spans: int     # WholeStageCodegen regions
    has_cartesian: bool         # CartesianProduct anywhere
    has_pushed_filters: bool    # at least one non-empty PushedFilters on a scan
    top_k_only_sorts: bool      # every global sort is a TakeOrderedAndProject
    n_single_partition_windows: int  # Exchange SinglePartition feeding a Window

    @property
    def python_free(self) -> bool:
        return self.n_python_stages == 0

    def scale_clean(self, python_allowed: bool = False) -> bool:
        """The registry-wide contract: no cartesian, and Python stages
        only where the operator is documented to need them."""
        return not self.has_cartesian and (python_allowed or self.python_free)


def plan_audit(df: DataFrame) -> PlanAudit:
    """Audit the physical plan of a DataFrame. Structural fields
    (joins, exchanges, Python stages, cartesian) are valid on the
    unexecuted AQE plan; `n_wholestage_spans` is only populated after
    an action has run (AQE inserts codegen markers at execution — run
    `df.collect()` first if you need that field)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # A Window whose spec has no PARTITION BY requires all rows on one
    # task. That plan shape dies at 100 TB unless the frame is bounded
    # by construction (a k-row histogram, a sketch union) —
    # operators/rank.py is the distributed restatement for data-sized
    # frames, and tests/test_registry_plan_hygiene.py pins the
    # registry-wide ban. Detected from the Window node's OWN render,
    # not the exchange below it (review r09: the planner omits the
    # `Exchange SinglePartition` when the child already satisfies
    # single-partition distribution — coalesce(1), a top-k child, the
    # second of two chained global windows — which the old
    # adjacent-lines heuristic missed). Physical WindowExec prints
    #   Window [exprs], [partition cols], [order cols]   (partitioned)
    #   Window [exprs], [order cols]                     (global)
    #   Window [exprs]                                   (global, no order)
    # and a PARTITIONED window with no ORDER BY also prints two groups
    #   Window [exprs], [partition cols]
    # — distinguished because an order spec renders sort directions
    # (" ASC"/" DESC") and a partition column list never does. So a
    # global window is: one group, or two groups whose second is an
    # order spec. Brackets nest inside exprs — count top-level groups,
    # don't split on commas. WindowGroupLimit/WindowInPandas are
    # different node names and excluded by the exact node-name match.
    def _top_level_groups(s: str) -> list[str]:
        depth = 0
        groups: list[str] = []
        for ch in s:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth = max(0, depth - 1)
            elif depth > 0:
                groups[-1] += ch
        return groups

    n_sp_windows = 0
    for ln in plan.splitlines():
        head, sep, rest = ln.partition("Window [")
        # head must be pure tree art — an exact node-name match.
        if sep and head.strip("+-: |*()0123456789") == "":
            gs = _top_level_groups("[" + rest)
            if len(gs) == 1 or (
                len(gs) == 2 and (" ASC" in gs[1] or " DESC" in gs[1])
            ):
                n_sp_windows += 1
    n_sorts = plan.count("Sort [")
    n_topk = plan.count("TakeOrderedAndProject")
    # Window operators legitimately sort within partitions; only count
    # global (non-window, non-join) sorts against top-k discipline.
    n_smj = plan.count("SortMergeJoin")
    n_window = plan.count("Window")
    return PlanAudit(
        # shuffle boundaries only: "BroadcastExchange ..." also
        # contains the substring "Exchange ", so subtract it out
        n_exchanges=plan.count("Exchange ") - plan.count("BroadcastExchange "),
        n_broadcast_joins=plan.count("BroadcastHashJoin"),
        n_sortmerge_joins=n_smj,
        n_nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        n_python_stages=(
            plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        ),
        # codegen regions render as "*(n) Operator" in the simple plan
        # string (the literal "WholeStageCodegen" only appears in the
        # formatted mode); count distinct region ids
        n_wholestage_spans=len(
            {tok.split(")")[0] for tok in plan.split("*(")[1:]}
        ),
        has_cartesian="CartesianProduct" in plan,
        # ANY scan with a non-empty pushed-filter list counts — not
        # just the first-printed one
        has_pushed_filters=any(
            m.group(1).strip() for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
        ),
        top_k_only_sorts=n_sorts <= n_topk + 2 * n_smj + n_window,
        n_single_partition_windows=n_sp_windows,
    )
