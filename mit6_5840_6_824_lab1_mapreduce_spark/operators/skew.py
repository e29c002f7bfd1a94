"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles most hot-key
joins at runtime by splitting oversized shuffle partitions. Salting is
the explicit fallback for the cases AQE cannot touch:

- joins where the skewed side cannot be split (stream-static joins,
  bucketed tables, broadcast-ineligible small sides);
- aggregations whose partial state does not reduce map-side
  (collect_list/collect_set), where one hot key funnels all rows
  through a single reducer.

Pattern: scatter the hot side across ``n_salts`` sub-keys, replicate
the other side per salt (join) or re-combine partials (agg). Salt
values never appear in results, so any salt distribution is correct;
``F.rand(seed)`` keeps runs reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: scatter the skewed side
    uniformly over ``n_salts`` salt values and replicate ``other``
    once per salt, then join on (keys + salt). The hot key's rows now
    land on ``n_salts`` reducers instead of one; the price is an
    ``n_salts``× blow-up of the (small) replicated side's shuffle.

    Supports inner and left joins (the skewed side is the left/probe
    side)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    s = skewed.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = s.join(o, on=on + ["_salt"], how=how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[Column, Column, str]],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates by
    (keys + salt) — spreading a hot key over ``n_salts`` reducers —
    phase 2 re-combines the partials by keys alone (tiny input: one
    row per key per salt).

    ``aggs``: (partial_agg_expr, combine_expr_over_partial, alias)
    triples; the combine expr references the partial's alias, e.g.::

        (F.count("*"), F.sum("c"), "c")                  # count
        (F.sum("x"), F.sum("sx"), "sx")                  # sum
        (F.collect_list("v"), F.flatten(F.collect_list("vs")), "vs")
    """
    salted = df.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[p.alias(a) for p, _c, a in aggs]
    )
    return partial.groupBy(*keys).agg(*[c.alias(a) for _p, c, a in aggs])
