"""Graph analytics queries over derived relational graphs.

Connected components (the dedup clustering loop) registers in
``queries/dedup.py``; this module holds the rank/centrality side:
weighted PageRank over the nation trade network — the canonical
iterative join+aggregate workload, run with exact integer arithmetic
so a fixed iteration count is hash-comparable against a chained-CTE
SQL restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import weighted_pagerank
from ..plans import table
from .registry import query

_PR_ITER = 5
_PR_SCALE = 1_000_000
_PR_BASE = 150_000

_PR_PRELUDE = r"""
    edges AS (
      SELECT sn.n_name AS src, cn.n_name AS dst, count(*) AS w
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)
"""


def _pr_iteration_sql(i: int) -> str:
    return f"""
    r{i} AS (
      SELECT n.node,
             CAST({_PR_BASE} + (85 * coalesce(s.inflow, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum((p.r * e.w) // o.ow) AS BIGINT) AS inflow
        FROM edges e
        JOIN r{i - 1} p ON e.src = p.node
        JOIN outw o ON e.src = o.src
        GROUP BY e.dst) s ON n.node = s.node
    )"""


@query(
    "graph_pagerank_nations",
    oracle=(
        "WITH "
        + _PR_PRELUDE
        + ","
        + ",".join(_pr_iteration_sql(i) for i in range(1, _PR_ITER + 1))
        + f"""
    SELECT node AS nation, r AS rank_scaled,
           round(CAST(r AS DOUBLE) / {_PR_SCALE}, 6) AS pr
    FROM r{_PR_ITER}
    """
    ),
)
def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 5 iterations, integer-exact)
    over the nation trade network: supplier-nation → customer-nation
    edges weighted by lineitem count. The graph derivation is the Q7
    star join (one fact shuffle, dimensions broadcast); the rank loop
    is the Pregel-shape join+aggregate per round from
    `operators/graph.py::weighted_pagerank` — the oracle replays the
    same integer recurrence through chained CTEs, so the driver's
    hash-compare pins all five iterations exactly."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.withColumnsRenamed({"n_nationkey": "c_nk", "n_name": "dst"})
    sn = n.withColumnsRenamed({"n_nationkey": "s_nk", "n_name": "src"})
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    ranks = weighted_pagerank(edges, n_iter=_PR_ITER, scale=_PR_SCALE)
    return ranks.select(
        F.col("node").alias("nation"),
        "rank_scaled",
        F.round(F.col("rank_scaled").cast("double") / _PR_SCALE, 6).alias("pr"),
    )
