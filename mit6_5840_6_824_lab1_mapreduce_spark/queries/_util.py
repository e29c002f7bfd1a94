"""Cross-engine determinism helpers.

The driver value-hashes Spark vs DuckDB results, so floating-point
aggregation order must not leak into outputs. Rule: aggregate money
columns as exact decimals (order-independent), cast the exact result
to double, round. Timestamps are always emitted as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
RATE = "decimal(3,2)"


def sum_money(col: str | Column, alias: str) -> Column:
    """Exact decimal sum → double, 2dp. DuckDB twin:
    round(CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE), 2) AS alias"""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(MONEY)).cast("double"), 2).alias(alias)


def sum_expr(expr: Column, alias: str, dp: int = 2) -> Column:
    """Exact decimal-expression sum → double, `dp` decimals."""
    return F.round(F.sum(expr).cast("double"), dp).alias(alias)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic."""
    return F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1).cast(RATE) - F.col("l_discount").cast(RATE)
    )


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * (F.lit(1).cast(RATE) + F.col("l_tax").cast(RATE))


def avg_of(sum_dec: Column, count_col: Column, alias: str, dp: int = 6) -> Column:
    """Deterministic average: exact-decimal sum → double ÷ count."""
    return F.round(sum_dec.cast("double") / count_col, dp).alias(alias)


def ts_str(col: str | Column, alias: str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (DuckDB twin:
    strftime(x, '%Y-%m-%d %H:%M:%S'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(alias)
