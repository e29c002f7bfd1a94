"""Relational operator coverage over the driver's TPC-H-ish tables.

The reference engine has no joins/windows/sorts/set-ops (SURVEY §2.5) —
these queries are the additive surface that makes the Spark engine a
complete analytics engine, and they double as the bench workload.

Scale notes (100 TB posture), verified via .explain():
- dimension joins (region/nation/supplier/customer at bench sf) are
  broadcast — no shuffle of the fact table for those edges;
- aggregations are partial → shuffle-by-key → final (map-side combine);
- top-k = TakeOrderedAndProject (no global sort materialization);
- all money aggregates use exact decimal math (see _util) so results
  are partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.rank import ntile_from_rank, with_global_order
from ..plans import table
from ._util import MONEY, avg_of, disc_price, charge, exact_ratio_spark, exact_ratio_sql, exact_ratio_wide_spark, exact_ratio_wide_sql, sum_expr, sum_money, ts_str
from .registry import query


@query(
    "tpch_q1_pricing_summary",
    oracle=r"""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_charge,
           (CASE WHEN abs(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) >= 9007199254.740992 THEN (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) ELSE CAST(floor((CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS avg_qty,
           (CASE WHEN abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)) >= 9007199254.740992 THEN (CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)) ELSE CAST(floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS avg_price,
           (CASE WHEN abs(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)) >= 9007199254.740992 THEN (CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)) ELSE CAST(floor((CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * CAST(1000000 AS DOUBLE) + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE) END) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy grouped aggregation; the canonical
    map-side-combine workload (the wc of relational engines)."""
    li = table(spark, sf_dir, "lineitem", spread="l_shipdate").where(
        F.col("l_shipdate") <= "2001-09-01"
    )
    qty = F.col("l_quantity").cast(MONEY)
    price = F.col("l_extendedprice").cast(MONEY)
    disc = F.col("l_discount").cast(MONEY)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_expr(qty, "sum_qty"),
        sum_expr(price, "sum_base_price"),
        sum_expr(disc_price(), "sum_disc_price"),
        sum_expr(charge(), "sum_charge"),
        avg_of(F.sum(qty), F.count("*"), "avg_qty"),
        avg_of(F.sum(price), F.count("*"), "avg_price"),
        avg_of(F.sum(disc), F.count("*"), "avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=r"""
    SELECT l.l_orderkey AS orderkey,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective 3-way join + top-k. customer is the small
    side (broadcast); top-k compiles to TakeOrderedAndProject —
    no global sort. Tie-broken by orderkey for determinism."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-01-01")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-01-01")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer is sf-proportional — no forced broadcast hint; AQE
        # still broadcasts it at scales where it fits under the threshold
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_expr(disc_price(), "revenue"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            ts_str("o_orderdate", "orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=r"""
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join. All dimensions (region, nation,
    supplier, customer) broadcast; only the orders⋈lineitem edge
    shuffles — at 100 TB that is the only unavoidable shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # sf-proportional: no hint
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        sum_expr(disc_price(), "revenue")
    )


@query(
    "sales_rollup",
    oracle=r"""
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets coverage: ROLLUP over (returnflag, linestatus).
    NULL grouping rows coalesced to '<all>' for stable hashing."""
    li = table(spark, sf_dir, "lineitem", spread="l_extendedprice")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            sum_money("l_extendedprice", "sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n_items",
            "sum_price",
        )
    )


@query(
    "orders_top3_per_customer",
    oracle=r"""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           o_totalprice AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def orders_top3_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: per-group top-k via row_number.
    Single shuffle by custkey; at scale AQE handles group skew."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


@query(
    "customers_without_urgent_orders",
    oracle=r"""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage (left_anti — one shuffle, no row explosion).
    Filter on the build side before the join so the anti-join input is
    already pruned (predicate pushdown reaches the orders scan)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


@query(
    "custkeys_only_small_orders",
    oracle=r"""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def custkeys_only_small_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation coverage (EXCEPT = except distinct; Spark subtract)."""
    o = table(spark, sf_dir, "orders")
    all_c = o.select(F.col("o_custkey").alias("custkey"))
    big_c = o.where(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return all_c.subtract(big_c)


@query(
    "supplier_part_distinct_count",
    oracle=r"""
    SELECT l_suppkey AS suppkey,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def supplier_part_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-aggregate coverage (two-phase distinct agg under AQE)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_items"),
    )


@query(
    "brand_quantity_topk",
    oracle=r"""
    SELECT p.p_brand AS brand,
           round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY total_qty DESC, brand ASC
    LIMIT 10
    """,
)
def brand_quantity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast fact⋈dim join + grouped top-k."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(sum_money("l_quantity", "total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("brand"))
        .limit(10)
    )


@query(
    "customer_spend_quartiles",
    oracle=r"""
    WITH spend AS (
      SELECT o_custkey,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    q AS (
      SELECT o_custkey, total_spend,
             ntile(4) OVER (ORDER BY total_spend DESC, o_custkey) AS quartile
      FROM spend
    )
    SELECT quartile, count(*) AS n_customers,
           round(CAST(sum(CAST(total_spend AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS quartile_spend
    FROM q GROUP BY quartile
    """,
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ranked into spend quartiles, then per-quartile
    totals. The oracle's ntile window IS the spec; the Spark plan
    restates it as a distributed rank (range-bucketed row_number +
    prefix offsets, operators/rank.py) plus the exact SQL-standard
    ntile formula — customer count grows linearly with the corpus, so
    the r08-era `Window.orderBy` single-partition sort would funnel
    every customer through one task at 100 TB. The tie-broken ORDER BY
    keeps the rank (and thus ntile) deterministic."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(sum_money("o_totalprice", "total_spend"))
    ranked = with_global_order(
        spend,
        [F.desc("total_spend"), F.asc("o_custkey")],
        rn="rn",
        totals=[("c", F.lit(1))],
    )
    q = ranked.withColumn("quartile", ntile_from_rank(4, "rn", "c"))
    return q.groupBy("quartile").agg(
        F.count("*").alias("n_customers"),
        sum_money("total_spend", "quartile_spend"),
    )


@query(
    "nation_trade_volume",
    oracle=r"""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           count(*) AS n_lines,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))),
                      2) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade matrix. One fact-fact edge
    (lineitem⋈orders); customer/supplier/nation all broadcast — the
    plan has exactly one large shuffle at any scale."""
    li = table(spark, sf_dir, "lineitem", spread=True)
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.withColumnsRenamed({"n_nationkey": "c_nk", "n_name": "cust_nation"})
    sn = n.withColumnsRenamed({"n_nationkey": "s_nk", "n_name": "supp_nation"})
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))  # sf-proportional
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
    )
    return j.groupBy("cust_nation", "supp_nation").agg(
        F.count("*").alias("n_lines"),
        sum_expr(disc_price(), "volume"),
    )


@query(
    "monthly_return_share",
    oracle=rf"""
    WITH m AS (
      SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
             sum(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS num_d,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS den_d,
             count(*) AS n_lines
      FROM lineitem
      GROUP BY 1
    )
    SELECT ship_month,
           {exact_ratio_wide_sql('num_d * 100', 'den_d * 100')} AS return_share,
           n_lines
    FROM m
    """,
)
def monthly_return_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio per month —
    numerator and denominator in ONE pass (no self-join), exact
    decimal sums so the ratio hashes identically across engines."""
    li = table(spark, sf_dir, "lineitem", spread="l_shipdate")
    num = F.sum(
        F.when(
            F.col("l_returnflag") == "R", F.col("l_extendedprice").cast(MONEY)
        ).otherwise(F.lit(0).cast(MONEY))
    )
    den = F.sum(F.col("l_extendedprice").cast(MONEY))
    return (
        li.groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "ship_month"
            )
        )
        .agg(
            num.alias("num_d"),
            den.alias("den_d"),
            F.count("*").alias("n_lines"),
        )
        .select(
            "ship_month",
            # Integer-exact half-up over exact cents (r5 tie sweep);
            # wide variant: monthly revenue cents x 10^6 passes int64
            # around sf1k, far below the 100 TB target (advisor r05).
            exact_ratio_wide_spark("num_d * 100", "den_d * 100").alias(
                "return_share"
            ),
            "n_lines",
        )
    )


@query(
    "small_quantity_order_revenue",
    oracle=rf"""
    SELECT l1.l_partkey,
           {exact_ratio_sql('sum(CAST(l1.l_extendedprice AS DECIMAL(18,2))) * 100', '700', 2)}
             AS avg_yearly
    FROM lineitem l1
    WHERE l1.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey
    )
    GROUP BY l1.l_partkey
    """,
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    threshold) decorrelated into a window average over the same
    partition key — one shuffle by partkey instead of a per-row
    subquery; the oracle keeps the literal correlated form, proving
    the decorrelation lossless."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    flt = li.withColumn("part_avg_qty", F.avg("l_quantity").over(w)).where(
        F.col("l_quantity") < 0.2 * F.col("part_avg_qty")
    )
    return flt.groupBy("l_partkey").agg(
        # Integer-exact half-up of cents/700 (r5 tie sweep).
        exact_ratio_spark(
            "sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100", "700", 2
        ).alias("avg_yearly")
    )


@query(
    "top_revenue_suppliers",
    oracle=r"""
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the
    max-revenue supplier(s). The scalar MAX subquery becomes a
    broadcast join against a 1-row aggregate of the (already tiny,
    one row per supplier) revenue table — no second scan of
    lineitem, no single-partition window. Comparison happens on the
    rounded value on both sides so ties are engine-independent."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy("l_suppkey").agg(sum_expr(disc_price(), "total_revenue"))
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
    )


@query(
    "waiting_orders_suppliers",
    oracle=r"""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name AS name, count(*) AS numwait
    FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, name ASC
    LIMIT 10
    """,
)
def waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" = shipped >60 days after the
    order date, since this lineitem has no receipt/commit dates):
    suppliers who were the ONLY late supplier on a multi-supplier
    finished order. The EXISTS / NOT EXISTS pair is decorrelated into
    one per-order aggregate — n_supp = distinct suppliers, n_late_supp
    = distinct late suppliers — then a late line qualifies iff
    n_supp > 1 AND n_late_supp = 1. One groupBy(orderkey) + one
    co-partitioned join back replaces two correlated self-joins; at
    100 TB that is 2 shuffles on the same key (AQE reuses the
    exchange) instead of 3 self-join shuffles."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    late = lines.where(F.col("is_late")).select("l_orderkey", "l_suppkey")
    s = table(spark, sf_dir, "supplier")
    qualifying = late.join(per_order, "l_orderkey").where(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    return (
        qualifying.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("name"))
        .limit(10)
    )


@query(
    "inactive_rich_customers",
    oracle=r"""
    WITH thr AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey AS nationkey, count(*) AS numcust,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS totacctbal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_nationkey
    """,
)
def inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: "inactive" = no orders since 1999,
    since every customer here has some order): per-nation count and
    balance of above-average-balance customers with no recent orders.
    The scalar AVG subquery is a broadcast 1-row cross join (exact
    decimal sum / count, so the threshold double is engine-identical);
    the NOT EXISTS is a left_anti join against the date-pruned orders
    scan — the predicate reaches the parquet reader, so at scale the
    anti-join build side is only the recent slice."""
    c = table(spark, sf_dir, "customer")
    thr = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(MONEY)).cast("double") / F.count("*")).alias(
                "avg_bal"
            )
        )
    )
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "1999-01-01"
    ).select("o_custkey")
    rich = c.crossJoin(F.broadcast(thr)).where(F.col("c_acctbal") > F.col("avg_bal"))
    inactive = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return inactive.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("numcust"),
        sum_money("c_acctbal", "totacctbal"),
    )


@query(
    "order_price_percentiles",
    oracle=r"""
    SELECT o_orderpriority AS priority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (median + p90) of order
    value per priority — Spark's exact `percentile` (sort-based within
    group), matching DuckDB quantile_cont. Exact percentiles shuffle
    whole groups; for 100 TB dashboards swap in approx_percentile
    (t-digest sketch, map-side combinable) — kept exact here because
    the oracle hash-compares values."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.count("*").alias("n_orders"),
    )


@query(
    "orders_hash_sample",
    oracle=r"""
    SELECT o_orderpriority AS priority, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_price
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
    GROUP BY o_orderpriority
    """,
)
def orders_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 hash sample: keep rows whose md5(key) leads
    with '0', then aggregate. Unlike rand()-based sampling this is
    reproducible across engines, runs, and partitionings — the right
    primitive for sampled data-quality checks on a 100 TB table (the
    filter is embarrassingly parallel, no shuffle added)."""
    o = table(spark, sf_dir, "orders")
    sampled = o.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 1)
        == "0"
    )
    return sampled.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        sum_money("o_totalprice", "sum_price"),
    )


@query(
    "customer_order_cadence",
    oracle=rf"""
    WITH w AS (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             CAST(date_diff('day', lag(o_orderdate)
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS BIGINT) AS days_since_prev,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS n
      FROM orders
    )
    SELECT custkey, orderkey, days_since_prev,
           CASE WHEN n = 1 THEN CAST(0 AS DOUBLE)
                ELSE {exact_ratio_sql('rn - 1', 'n - 1')} END AS price_pct_rank,
           {exact_ratio_sql('rn', 'n')} AS price_cume_dist
    FROM w
    """,
)
def customer_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth in one pass: inter-order gap (lag) on
    the date ordering plus percent_rank/cume_dist on the price
    ordering, both per customer. Two orderings over the same
    partition key → one shuffle by custkey, two in-partition sorts;
    rank fractions are exact rationals so they hash identically."""
    o = table(spark, sf_dir, "orders")
    w_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    # The price ordering is UNIQUE (orderkey tiebreak), so
    # percent_rank == (rn-1)/(n-1) and cume_dist == rn/n exactly —
    # restated as integer-exact half-up ratios (r5 tie sweep: rank
    # fractions with denominators like 640 are the tie class).
    w_rows = (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w_date))
            .cast("long")
            .alias("days_since_prev"),
            F.row_number().over(w_price).alias("rn"),
            F.count("*").over(Window.partitionBy("o_custkey")).alias("n"),
        )
    )
    return w_rows.select(
        "custkey",
        "orderkey",
        "days_since_prev",
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(exact_ratio_spark("rn - 1", "n - 1"))
        .alias("price_pct_rank"),
        exact_ratio_spark("rn", "n").alias("price_cume_dist"),
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=r"""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure predicate-pushdown scan — every filter reaches
    the parquet reader (date range, discount band, quantity cap), no
    join, no shuffle beyond the 1-row final aggregate. The benchmark's
    canonical 'is your scan path efficient' probe."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        sum_expr(
            F.col("l_extendedprice").cast(MONEY) * F.col("l_discount").cast("decimal(3,2)"),
            "revenue",
        ),
        F.count("*").alias("n_items"),
    )


@query(
    "tpch_q10_returned_items",
    oracle=r"""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE)
             AS revenue,
           round(CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS acctbal,
           n.n_name AS nation
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: who returned the most revenue last quarter. Both
    filters (quarter, returnflag) push to the scans BEFORE the fact
    join, nation broadcasts, and the top-20 is TakeOrderedAndProject.
    The shape that proves filter-then-join ordering at scale."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum_expr(disc_price(), "revenue"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "revenue",
            F.round(F.col("c_acctbal").cast(MONEY).cast("double"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


@query(
    "tpch_q13_customer_distribution",
    oracle=r"""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over a LEFT OUTER join (the
    join predicate filter stays IN the join condition, not a WHERE —
    customers with zero qualifying orders must survive with count 0).
    Two aggregations: per-customer count (shuffle by custkey, the
    join's own partitioning — no extra exchange), then the tiny
    histogram rollup."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q18_large_volume_customers",
    oracle=r"""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    SELECT c.c_name AS name, c.c_custkey AS custkey,
           o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
           round(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2)
             AS totalprice,
           round(b.sum_qty, 2) AS sum_qty
    FROM big b
      JOIN orders o ON b.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY totalprice DESC, orderkey ASC
    LIMIT 10
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders via aggregate-then-join. The
    HAVING on the per-order quantity sum runs BEFORE the joins, so
    only the handful of big orders ever reach the orders/customer
    tables (a selective build side AQE turns into a broadcast);
    top-10 is TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).alias("sq"))
        .where(F.col("sq") > 300)
        .select("l_orderkey", F.col("sq").cast("double").alias("sum_qty"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = big.join(o, big.l_orderkey == o.o_orderkey).join(
        c, o.o_custkey == c.c_custkey
    )
    return (
        j.select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            ts_str("o_orderdate", "orderdate"),
            F.round(F.col("o_totalprice").cast(MONEY).cast("double"), 2).alias(
                "totalprice"
            ),
            F.round(F.col("sum_qty"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(10)
    )


@query(
    "tpch_q4_order_priority",
    oracle=r"""
    SELECT o.o_orderpriority AS orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with a
    non-equi residual (l_shipdate > o_orderdate; the testdata has no
    commit/receipt dates, so 'shipped after ordering' stands in for
    Q4's late-commit predicate). The quarter filter pushes to the
    orders scan; the semi join never materializes lineitem columns —
    the planner's cheapest existence test at any scale."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = table(spark, sf_dir, "lineitem")
    sj = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sj.groupBy(F.col("o_orderpriority").alias("orderpriority")).agg(
        F.count("*").alias("order_count")
    )


@query(
    "tpch_q8_market_share",
    oracle=r"""
    WITH flat AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(3,2))) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    )
    SELECT o_year,
           {MKT_SHARE} AS mkt_share
    FROM flat GROUP BY o_year
    """.replace("{MKT_SHARE}", exact_ratio_wide_sql(
        "sum(CASE WHEN supp_nation = 'NATION_7' THEN vol"
        " ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000",
        "sum(vol) * 10000")),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — NATION_7 suppliers'
    slice of PROMO-part revenue sold to EUROPE-region customers, per
    order year. Six-way join: the small dimensions (part, supplier,
    nation x2, region) broadcast; customer and orders are shuffled
    edges — customer is deliberately NOT hinted because it scales
    with the fact side and would not be broadcastable at 100 TB
    (SCALE.md round-2 decision; AQE may still elect a broadcast at
    small SF). Conditional numerator and denominator come out of ONE
    aggregation pass (no self-join of aggregates)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    flat = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            disc_price().alias("vol"),
            "supp_nation",
        )
    )
    # Integer-exact half-up over scale-4 decimal sums x 10^4, in the
    # WIDE (DECIMAL/HUGEINT) idiom — money sums scaled by 10^4*10^6
    # blow past int64 at realistic volumes (r5 tie sweep).
    return flat.groupBy("o_year").agg(
        exact_ratio_wide_spark(
            "sum(CASE WHEN supp_nation = 'NATION_7' THEN vol"
            " ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000",
            "sum(vol) * 10000",
        ).alias("mkt_share")
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=r"""
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity conjuncts
    across the part join. The per-table halves of the OR (brand+size
    on part, quantity bands on lineitem) are derivable as a pushed-down
    union-of-ranges by the optimizer; the residual OR evaluates post
    broadcast-join, never as three separate scans."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(20, 50) & q.between(20, 30))
    )
    return j.where(cond).agg(
        sum_expr(disc_price(), "revenue"), F.count("*").alias("n_items")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=rf"""
    SELECT {exact_ratio_wide_sql(
        "sum(CASE WHEN p.p_type = 'PROMO'"
        " THEN CAST(l.l_extendedprice AS DECIMAL(18,2))"
        " * (1 - CAST(l.l_discount AS DECIMAL(3,2)))"
        " ELSE CAST(0 AS DECIMAL(18,2)) END) * 1000000",
        "sum(CAST(l.l_extendedprice AS DECIMAL(18,2))"
        " * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) * 10000")}
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo parts' share of one month's revenue.
    Month filter pushes to the lineitem scan; part broadcasts;
    numerator and denominator come from ONE aggregation pass
    (conditional sum), both in exact decimal before the final
    double division."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", disc_price().alias("dp")
    )
    # 100*num/den as ONE exact rational: numerator scaled by 10^6
    # (10^4 decimal scale x the 100 percent factor), denominator by
    # 10^4, in the WIDE idiom (int64 overflowed at sf0.01 already —
    # r5 tie sweep).
    return j.agg(
        exact_ratio_wide_spark(
            "sum(CASE WHEN p_type = 'PROMO' THEN dp"
            " ELSE CAST(0 AS DECIMAL(18,2)) END) * 1000000",
            "sum(dp) * 10000",
        ).alias("promo_revenue_pct")
    )


@query(
    "tpch_q9_nation_profit",
    oracle=r"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                        - CAST(p.p_retailprice AS DECIMAL(18,2))
                          * CAST(l.l_quantity AS DECIMAL(18,2))
                          * CAST(0.10 AS DECIMAL(4,2))), 2) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND contains(p.p_name, 'red')
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year.
    The testdata has no partsupp, so supply cost is proxied as 10%
    of p_retailprice — the join topology (fact through four
    dimensions, substring filter on part name) is what Q9 exercises.
    part/supplier/nation broadcast; lineitem->orders is the one
    shuffled edge; profit sums in exact decimal per (nation, year)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.contains("p_name", F.lit("red"))).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = disc_price() - (
        F.col("p_retailprice").cast(MONEY)
        * F.col("l_quantity").cast(MONEY)
        * F.lit(0.10).cast("decimal(4,2)")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(sum_expr(profit, "sum_profit"))


@query(
    "tpch_q2_min_cost_supplier",
    oracle=r"""
    WITH px AS (
      SELECT p.p_partkey, p.p_type, p.p_size,
             s.s_suppkey, s.s_name, s.s_acctbal, n.n_name AS nation
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_type = 'ECONOMY' AND p.p_size <= 5
      GROUP BY ALL
    ),
    best AS (
      SELECT *, min(s_acctbal) OVER (PARTITION BY p_partkey) AS best_bal
      FROM px
    )
    SELECT p_partkey, s_suppkey, s_name, nation,
           round(CAST(s_acctbal AS DOUBLE), 2) AS acctbal
    FROM best WHERE s_acctbal = best_bal
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) with
    the minimum account balance among those that actually supply it
    (the testdata has no partsupp, so the part↔supplier edge derives
    from lineitem and s_acctbal stands in for ps_supplycost; the shape
    — correlated min over a second table, decorrelated to a window —
    is what Q2 exercises).

    Plan: part filter pushes to the scan and prunes the lineitem join
    early; supplier/nation broadcast; the distinct part-supplier edge
    collapses lineitem duplicates BEFORE the window, so the argmin
    runs over edges, not line items. Ties keep all minimal suppliers
    (deterministic output; the SQL standard's Q2 does the same)."""
    p = table(spark, sf_dir, "part").where(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 5)
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    edges = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_partkey", "l_suppkey")
        .distinct()
    )
    px = edges.join(F.broadcast(s), edges.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        px.withColumn("best_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("best_bal"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "nation",
            F.round(F.col("s_acctbal").cast("double"), 2).alias("acctbal"),
        )
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle=r"""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    """,
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per shipping class (l_returnflag stands in
    for the absent l_shipmode), split LATE lineitems — shipped more
    than 90 days after the order date (the schema has no
    commit/receipt dates) — into high- vs low-priority order counts
    in one conditional aggregation. One fact-fact equi-join, no
    second pass. Reference analog: the map-side classify + reduce
    count contract of wc (`/root/reference/src/mrapps/wc.go:21-28`)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q11_important_parts",
    oracle=r"""
    WITH val AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
               AS v
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(v) AS t FROM val)
    SELECT l_partkey AS partkey,
           round(CAST(v AS DOUBLE), 2) AS part_value
    FROM val, tot
    WHERE v > t * 0.002
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction
    of the GLOBAL total — the defining scalar-subquery-in-HAVING
    pattern (lineitem value stands in for the absent partsupp
    cost*qty). The per-part aggregate is one shuffle; the global
    total is a 1-row aggregate of that same result joined back
    broadcast (constant probe per row — never a second corpus scan).
    Threshold arithmetic stays in exact decimal on both engines."""
    li = table(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(F.sum(disc_price()).alias("v"))
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.join(F.broadcast(tot))
        .where(F.col("v") > F.col("t") * F.lit("0.002").cast("decimal(4,3)"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("v").cast("double"), 2).alias("part_value"),
        )
    )


@query(
    "tpch_q16_part_supplier_variety",
    oracle=r"""
    SELECT p_brand, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 5
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def tpch_q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers can provide each
    (brand, size) part family, excluding blacklisted suppliers —
    observed (part, supplier) pairs from lineitem stand in for the
    absent partsupp table; negative-balance suppliers play the
    'customer complaints' exclusion. Anti-join against the (tiny)
    exclusion list broadcasts; the distinct-pair projection and the
    count-distinct share the partkey/suppkey shuffle."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").where(F.col("p_size") <= 5).select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle=r"""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red %'
    ),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem JOIN red_parts ON l_partkey = p_partkey
      GROUP BY l_partkey, l_suppkey
    ),
    part_tot AS (
      SELECT l_partkey, sum(sq) AS tq FROM shipped GROUP BY l_partkey
    ),
    qualifying AS (
      SELECT s.l_suppkey, count(*) AS n_dominant_parts
      FROM shipped s JOIN part_tot t ON s.l_partkey = t.l_partkey
      WHERE s.sq > t.tq * 0.5
      GROUP BY s.l_suppkey
    )
    SELECT s_suppkey, s_name, n_dominant_parts
    FROM qualifying JOIN supplier ON l_suppkey = s_suppkey
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who DOMINATE the supply of a
    promoted part family — shipped more than half a part's total
    quantity of 'red %'-named parts (observed shipments stand in for
    the absent partsupp availability). The nested-subquery chain
    decorrelates into two aggregations over the SAME
    (partkey, suppkey) shuffle plus an equi-join back on partkey;
    the part filter broadcasts and prunes lineitem before anything
    aggregates. Exact decimal quantities end to end."""
    red = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    shipped = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).alias("sq"))
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    qual = (
        shipped.join(tot, "l_partkey")
        .where(F.col("sq") > F.col("tq") * F.lit("0.5").cast("decimal(2,1)"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominant_parts"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return qual.join(
        F.broadcast(s), qual.l_suppkey == s.s_suppkey
    ).select("s_suppkey", "s_name", "n_dominant_parts")


@query(
    "customer_rfm_segments",
    oracle=r"""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate),
                       (SELECT max(o_orderdate) FROM orders)) AS recency_days,
             count(*) AS frequency,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT *,
             ntile(4) OVER (ORDER BY recency_days ASC NULLS LAST,
                            o_custkey NULLS LAST) AS r_q,
             ntile(4) OVER (ORDER BY frequency DESC NULLS LAST,
                            o_custkey NULLS LAST) AS f_q,
             ntile(4) OVER (ORDER BY monetary DESC NULLS LAST,
                            o_custkey NULLS LAST) AS m_q
      FROM cust
    )
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           count(*) AS n_customers,
           round(CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS segment_monetary
    FROM scored GROUP BY r_q, f_q, m_q
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic lifecycle-marketing rollup: quartile each dimension
    independently, then aggregate customers per (R,F,M) cell. The
    oracle's three ntile windows are the spec; the Spark plan runs
    three distributed ranks (operators/rank.py) + the exact ntile
    formula — the per-customer frame is corpus-linear, so the r08-era
    global windows were three single-partition sorts of every
    customer. Recency anchors on the global max order date, a 1-row
    scalar aggregate broadcast back onto the frame (BNLJ_ALLOWED).

    r08 nulls contract class (b): EXPLICIT NULLS LAST on every
    nullable sort key INCLUDING tie-breaks (o_custkey is itself
    nullable) — Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST;
    unknown recency/frequency/monetary ranks worst, the standard
    RFM treatment. The oracle spells the same NULLS LAST."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        sum_money("o_totalprice", "monetary"),
    )
    anchor = cust.agg(F.max("last_order").alias("_max_last"))
    cust = (
        cust.crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days", F.datediff(F.col("_max_last"), F.col("last_order"))
        )
        .drop("_max_last")
    )
    scored = with_global_order(
        cust,
        [F.asc_nulls_last("recency_days"), F.asc_nulls_last("o_custkey")],
        rn="_rrn",
        totals=[("_c", F.lit(1))],
    ).withColumn("r_q", ntile_from_rank(4, "_rrn", "_c"))
    scored = with_global_order(
        scored,
        [F.desc_nulls_last("frequency"), F.asc_nulls_last("o_custkey")],
        rn="_frn",
    ).withColumn("f_q", ntile_from_rank(4, "_frn", "_c"))
    scored = with_global_order(
        scored,
        [F.desc_nulls_last("monetary"), F.asc_nulls_last("o_custkey")],
        rn="_mrn",
    ).withColumn("m_q", ntile_from_rank(4, "_mrn", "_c"))
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").alias("n_customers"),
        sum_money("monetary", "segment_monetary"),
    )


@query(
    "orders_market_basket",
    oracle=r"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_ord AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
    part_n AS (SELECT l_partkey, count(*) AS cnt FROM op GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS co_orders
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    top AS (
      SELECT part_a, part_b, co_orders
      FROM pairs ORDER BY co_orders DESC, part_a, part_b LIMIT 20
    )
    SELECT t.part_a, t.part_b, t.co_orders,
           CAST(pa.cnt AS BIGINT) AS n_a, CAST(pb.cnt AS BIGINT) AS n_b,
           {SUPPORT} AS support,
           {LIFT} AS lift
    FROM top t
    JOIN part_n pa ON t.part_a = pa.l_partkey
    JOIN part_n pb ON t.part_b = pb.l_partkey
    CROSS JOIN n_ord n
    """.replace("{SUPPORT}", exact_ratio_sql("t.co_orders", "n.n")
    ).replace(
        "{LIFT}", exact_ratio_wide_sql("t.co_orders * n.n", "pa.cnt * pb.cnt")
    ),
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top-20 part pairs by co-occurrence
    within orders, with support and lift. The pair join is a
    self-equi-join ON THE ORDER KEY — cost is Σ_order k²/2 with k
    bounded by basket size (≤13 here, ≤ dozens in any realistic
    basket), never corpus-quadratic. Top-k is TakeOrderedAndProject;
    the per-part counts and order total join back against the 20
    surviving rows (broadcast + a 1-row scalar). Lift arithmetic is
    exact integers until one final double division."""
    li = table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_ord = op.select(F.countDistinct("l_orderkey").alias("n"))
    part_n = op.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("co_orders"))
    )
    top = pairs.orderBy(F.desc("co_orders"), "part_a", "part_b").limit(20)
    pa = part_n.withColumnsRenamed({"l_partkey": "part_a", "cnt": "n_a"})
    pb = part_n.withColumnsRenamed({"l_partkey": "part_b", "cnt": "n_b"})
    return (
        top.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .join(F.broadcast(n_ord))
        .select(
            "part_a",
            "part_b",
            "co_orders",
            "n_a",
            "n_b",
            # Integer-exact half-up support/lift (r5 tie sweep).
            # support: co_orders <= n, safe in int64 to ~4.6e12 orders.
            # lift: count x count PRODUCT in the numerator grows
            # quadratically with sf — wide variant (advisor r05 class).
            exact_ratio_spark("co_orders", "n").alias("support"),
            exact_ratio_wide_spark("co_orders * n", "n_a * n_b").alias("lift"),
        )
    )


@query(
    "orders_pareto_share",
    oracle=r"""
    WITH spend AS (
      SELECT o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT s,
             row_number() OVER (ORDER BY s DESC, o_custkey) AS rn,
             count(*) OVER () AS n_cust,
             sum(s) OVER (ORDER BY s DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(s) OVER () AS total
      FROM spend
    )
    SELECT CAST(pct AS INT) AS top_pct,
           CAST(max(rn) AS BIGINT) AS n_top_customers,
           round(CAST(max(cum) AS DOUBLE), 2) AS top_revenue,
           {RSHARE} AS revenue_share
    FROM ranked, unnest([1, 5, 10, 20]) AS t(pct)
    WHERE rn * 100 <= n_cust * pct
    GROUP BY pct
    """.replace(
        "{RSHARE}", exact_ratio_wide_sql("max(cum) * 100", "max(total) * 100")
    ),
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: what share of total revenue do the top
    1/5/10/20% of customers produce — the 80/20 report every revenue
    dashboard opens with. Thresholds are integer-exact
    (rn*100 <= n*pct); the oracle's ranking/running-sum windows are
    the spec, restated as ONE distributed rank pass
    (operators/rank.py: range-bucketed row_number + exact decimal
    running sums + grand totals, no single-partition exchange — the
    per-customer frame is corpus-linear); the four cuts are
    conditional aggregates over the ranked rows, no join."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(MONEY)).alias("s")
    )
    ranked = with_global_order(
        spend,
        [F.desc("s"), F.asc("o_custkey")],
        rn="rn",
        running=[("cum", "s")],
        totals=[("n_cust", F.lit(1)), ("total", "s")],
    ).select("s", "rn", "n_cust", "cum", "total")
    pcts = F.array([F.lit(p) for p in (1, 5, 10, 20)])
    hits = ranked.select(
        "rn", "cum", "total", F.explode(pcts).alias("top_pct")
    ).where(F.col("rn") * 100 <= F.col("n_cust") * F.col("top_pct"))
    return hits.groupBy("top_pct").agg(
        F.max("rn").alias("n_top_customers"),
        F.round(F.max("cum").cast("double"), 2).alias("top_revenue"),
        # Integer-exact half-up over exact cents (r5 tie sweep); wide:
        # whole-table revenue cents x 10^6 blows int64 near sf100,
        # well inside the 100 TB target (advisor r05).
        exact_ratio_wide_spark("max(cum) * 100", "max(total) * 100").alias(
            "revenue_share"
        ),
    )
