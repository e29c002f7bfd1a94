"""Property tests for the tie-proof rounding idioms in queries/_util:

- exact_ratio_{spark,sql}: round-half-up of a TRUE rational num/den in
  pure int64, checked against a Fraction-based reference — this is the
  replacement for round(num/den, dp) whose Spark/DuckDB semantics
  diverge on decimal-tie quotients (e.g. odd/640 at dp=6).
- det_round_{spark,sql}: the explicit floor(x·10^dp + 0.5)/10^dp —
  engine-identical by construction; checked Spark vs DuckDB vs a
  Python IEEE replay, including near-tie adversarial values.
"""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.queries._util import (
    det_round_spark,
    det_round_sql,
    exact_ratio_spark,
    exact_ratio_split_spark,
    exact_ratio_split_sql,
    exact_ratio_sql,
)

_dens = st.integers(min_value=1, max_value=10**7)
_dps = st.sampled_from([2, 4, 6])


@st.composite
def _plain_ratio_args(draw):
    """(num, den, dp) inside exact_ratio's documented-EXACT domain:
    the scaled half-up quotient must stay under 2^53 (judge r06 —
    past it the int→double cast rounds before the /10^dp division and
    true half-up can miss by 1 ulp; cross-engine parity still holds,
    covered separately below). Since quotient ≤ num·10^dp (den ≥ 1),
    bounding num ≤ (2^53 − 1) / 10^dp suffices."""
    dp = draw(_dps)
    num = draw(st.integers(min_value=0, max_value=(2**53 - 1) // 10**dp))
    den = draw(_dens)
    return num, den, dp


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_plain_ratio_args())
def test_exact_ratio_cross_engine_and_true_half_up(spark, args):
    num, den, dp = args
    s = 10 ** dp
    sval = spark.range(1).select(
        exact_ratio_spark(str(num), str(den), dp).alias("v")
    ).head().v
    oval = duckdb.sql(
        f"SELECT {exact_ratio_sql(str(num), str(den), dp)} AS v"
    ).fetchone()[0]
    # True round-half-up of the rational num/den at dp decimals.
    ref_int = math.floor(Fraction(num * s, den) + Fraction(1, 2))
    assert ref_int == (2 * num * s + den) // (2 * den)
    ref = ref_int / s
    assert sval == ref, f"spark {sval!r} != ref {ref!r}"
    assert oval == ref, f"duckdb {oval!r} != ref {ref!r}"


# Known decimal-tie quotients where native round(double, dp) diverges
# between Spark and DuckDB — the class that motivated the idiom.
@pytest.mark.parametrize(
    "num,den,dp",
    [
        (1, 640, 6),      # 0.0015625  -> 7-digit decimal ending in 5
        (3, 640, 6),      # 0.0046875
        (7, 3200, 6),     # 0.0021875
        (1966079125, 100000, 4),  # the r04 falsifying value /1e5
    ],
)
def test_exact_ratio_on_decimal_tie_inputs(spark, num, den, dp):
    s = 10 ** dp
    sval = spark.range(1).select(
        exact_ratio_spark(str(num), str(den), dp).alias("v")
    ).head().v
    oval = duckdb.sql(
        f"SELECT {exact_ratio_sql(str(num), str(den), dp)} AS v"
    ).fetchone()[0]
    ref = math.floor(Fraction(num * s, den) + Fraction(1, 2)) / s
    assert sval == oval == ref


def test_exact_ratio_past_2pow53_parity_holds_half_up_does_not(spark):
    """Pin the judge-r06 counterexample at the plain idiom's exactness
    ceiling (num=576_460_752_305, den=1, dp=6: scaled quotient
    5.76e17 > 2^53, so the int→double cast rounds before the /10^dp
    division). The contract narrowed rather than the emission changing
    (an emission change would alter 47 call sites' oracle text and
    flood the driver seat window), so this test pins BOTH halves of
    the narrowed contract: the engines still agree bit-for-bit past
    the ceiling (the driver gate never sees this), and the plain
    result is measurably NOT true half-up — while the split variant
    (the documented upgrade path) is."""
    num, den, dp = 576_460_752_305, 1, 6
    s = 10 ** dp
    true_half_up = math.floor(Fraction(num * s, den) + Fraction(1, 2)) / s
    row = spark.range(1).select(
        exact_ratio_spark(str(num), str(den), dp).alias("plain"),
        exact_ratio_split_spark(str(num), str(den), dp).alias("split"),
    ).head()
    o_plain = duckdb.sql(
        f"SELECT {exact_ratio_sql(str(num), str(den), dp)} AS v"
    ).fetchone()[0]
    o_split = duckdb.sql(
        f"SELECT {exact_ratio_split_sql(str(num), str(den), dp)} AS v"
    ).fetchone()[0]
    # Parity across engines holds everywhere in int64 range.
    assert row.plain == o_plain
    # The plain idiom misses true half-up by 1 ulp out here...
    assert row.plain != true_half_up
    # ...which is exactly why its exact domain is documented/bounded.
    assert row.plain == 576460752304.9999
    # The split variant delivers true half-up, on both engines.
    assert row.split == o_split == true_half_up == 576460752305.0


@st.composite
def _past_ceiling_args(draw):
    """(num, den, dp) whose scaled half-up quotient EXCEEDS 2^53 while
    operands stay in int64 headroom — the region where the plain idiom
    is documented parity-only (both engines identical bits, not true
    half-up). den is kept ≤ 256 so a past-ceiling num always exists
    under the operand cap 2·num·10^dp + den < 2^63."""
    dp = draw(_dps)
    s = 10 ** dp
    den = draw(st.integers(min_value=1, max_value=256))
    lo = (2**53 * den) // s + 1
    hi = (2**63 - 1 - den) // (2 * s)
    num = draw(st.integers(min_value=lo, max_value=hi))
    return num, den, dp


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_past_ceiling_args())
def test_exact_ratio_past_ceiling_bit_parity(spark, args):
    """The narrowed contract's load-bearing half (review r07: the
    domain-bounding fix removed the old strategy's incidental
    property coverage of this region): past the 2^53 exactness
    ceiling the plain idiom must still be BIT-IDENTICAL across
    engines — the driver gate leans on exactly this — and within one
    grid step of the true value. The split variant must be exactly
    true half-up on the same draws."""
    num, den, dp = args
    s = 10 ** dp
    ref_int = math.floor(Fraction(num * s, den) + Fraction(1, 2))
    assert ref_int >= 2**53, "strategy must draw past the ceiling"
    row = spark.range(1).select(
        exact_ratio_spark(str(num), str(den), dp).alias("plain"),
        exact_ratio_split_spark(str(num), str(den), dp).alias("split"),
    ).head()
    o_plain = duckdb.sql(
        f"SELECT {exact_ratio_sql(str(num), str(den), dp)} AS v"
    ).fetchone()[0]
    assert row.plain == o_plain, (
        f"plain idiom lost cross-engine bit-parity: {row.plain!r} != "
        f"{o_plain!r}"
    )
    true_half_up = ref_int / s
    # Off by at most one ulp of the scaled quotient (one extra
    # rounding), never wildly wrong.
    assert abs(row.plain - true_half_up) <= 2 * math.ulp(true_half_up)
    if ref_int // s < 2**53:
        assert row.split == true_half_up


@st.composite
def _split_ratio_args(draw):
    """(num, den, dp) across the split variant's FULL exact domain:
    int64 operand headroom (2·num·10^dp + den < 2^63) and integer
    part of the output under 2^53 (num ≤ 2^53 − 1 suffices since
    quotient div 10^dp ≤ num for den ≥ 1). Deliberately reaches far
    PAST 2^53 scaled quotients — the region the plain idiom cannot
    round exactly."""
    dp = draw(_dps)
    den = draw(_dens)
    hi = min(2**53 - 1, (2**63 - 1 - den) // (2 * 10**dp))
    num = draw(st.integers(min_value=0, max_value=hi))
    return num, den, dp


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_split_ratio_args())
def test_exact_ratio_split_true_half_up(spark, args):
    num, den, dp = args
    s = 10 ** dp
    sval = spark.range(1).select(
        exact_ratio_split_spark(str(num), str(den), dp).alias("v")
    ).head().v
    oval = duckdb.sql(
        f"SELECT {exact_ratio_split_sql(str(num), str(den), dp)} AS v"
    ).fetchone()[0]
    ref = math.floor(Fraction(num * s, den) + Fraction(1, 2)) / s
    assert sval == ref, f"spark {sval!r} != ref {ref!r}"
    assert oval == ref, f"duckdb {oval!r} != ref {ref!r}"


_doubles = st.one_of(
    st.floats(min_value=0.0, max_value=1e9, allow_nan=False),
    st.floats(min_value=-1e6, max_value=0.0, allow_nan=False),
    # Near the pass-through threshold and beyond (floor->long overflow
    # guard on the Spark side).
    st.floats(min_value=1e12, max_value=1e19, allow_nan=False),
    # Exact decimal ties (dyadic and non-dyadic).
    st.sampled_from([0.0015625, 19660.79125, 0.0078125, 2.5e-7]),
)


def _py_det_round(x: float, dp: int) -> float:
    s = float(10 ** dp)
    if abs(x) >= float(2 ** 53) / s:
        return x
    return math.floor(x * s + 0.5) / s


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_doubles, _dps)
def test_det_round_cross_engine(spark, x, dp):
    # Inject via STRING->DOUBLE cast (correctly rounded on both
    # engines). A bare decimal literal like 1000000000000.0625 goes
    # through DuckDB's DECIMAL parser, whose DECIMAL->DOUBLE cast is
    # NOT correctly rounded past 2^53 scaled units — a real
    # cross-engine trap this test documented (Spark's BigDecimal
    # conversion IS correctly rounded), but a literal-injection
    # artifact, not a det_round property.
    lit = f"CAST('{x!r}' AS DOUBLE)"
    sval = spark.range(1).select(
        det_round_spark(lit, dp).alias("v")
    ).head().v
    oval = duckdb.sql(
        f"SELECT {det_round_sql(lit, dp)} AS v"
    ).fetchone()[0]
    ref = _py_det_round(x, dp)
    assert sval == ref, f"spark {sval!r} != ref {ref!r} for x={x!r} dp={dp}"
    assert oval == ref, f"duckdb {oval!r} != ref {ref!r} for x={x!r} dp={dp}"


from mit6_5840_6_824_lab1_mapreduce_spark.queries._util import (  # noqa: E402
    exact_ratio_wide_spark,
    exact_ratio_wide_sql,
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(min_value=0, max_value=10**22),
       st.integers(min_value=1, max_value=10**16),
       _dps)
def test_exact_ratio_wide_cross_engine(spark, num, den, dp):
    """The DECIMAL(38,0)/HUGEINT variant must agree with the Fraction
    reference far past the int64 OPERAND ceiling — as long as the
    QUOTIENT (value * 10^dp) stays under 2^53 (helper contract: past
    that, the scaled value exceeds double-exact range, rounding to dp
    decimals is meaningless, and the int→double cast itself rounds).
    Beyond the contract the two engines must still agree bit-for-bit
    (identical cast+divide on both sides)."""
    s = 10 ** dp
    ref_int = math.floor(Fraction(num * s, den) + Fraction(1, 2))
    if ref_int >= 2 ** 53:
        # Outside the helper contract: past 2^53 the int->double cast
        # rounds (no exact half-up exists), and past 2^63 Spark's
        # decimal `div` result wraps the long where DuckDB's HUGEINT
        # keeps going — callers (shares, percentages, per-group means)
        # are orders of magnitude below either line.
        return
    sval = spark.range(1).select(
        exact_ratio_wide_spark(str(num), str(den), dp).alias("v")
    ).head().v
    oval = duckdb.sql(
        f"SELECT {exact_ratio_wide_sql(str(num), str(den), dp)} AS v"
    ).fetchone()[0]
    ref = ref_int / s
    assert sval == ref, f"spark {sval!r} != ref {ref!r}"
    assert oval == ref, f"duckdb {oval!r} != ref {ref!r}"


# ---------------------------------------------------------------------------
# sum_expr: decimal-sum rounding must happen IN DECIMAL, before the
# double cast (r12 sf1.0 correctness sweep: nation_trade_volume
# diverged from its oracle on 5/600 groups whose exact 3dp sums ended
# on a half, e.g. 545661502.425 — Spark's round(double, 2) HALF_UPs
# the shortest decimal repr while DuckDB rounds the binary value).
# ---------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from mit6_5840_6_824_lab1_mapreduce_spark.queries._util import sum_expr  # noqa: E402

# Exact 3-4dp sums landing on 2dp halves — the manufactured-tie class
# (10x replication turns sf0.1's 4dp sums into 3dp sums, so any .xx25
# / .xx75 base sum becomes a 2dp rounding tie at sf1.0).
_TIE_SUMS = ["545661502.425", "0.425", "1234.565", "99999999.995", "7.005"]


def test_sum_expr_decimal_tie_cross_engine(spark):
    """sum_expr and its SQL twin (CAST(round(sum(..), 2) AS DOUBLE))
    agree with exact HALF_UP on tie sums; the OLD double-first form
    provably diverges on at least one of them — pinning why the form
    matters."""
    rows = [(i, v) for i, v in enumerate(_TIE_SUMS)]
    sdf = (
        spark.createDataFrame(rows, "k int, x string")
        .select("k", F.col("x").cast("decimal(18,4)").alias("x"))
    )
    got = {
        r.k: r.v
        for r in sdf.groupBy("k").agg(sum_expr(F.col("x"), "v")).collect()
    }
    vals = ", ".join(f"({i}, '{v}')" for i, v in rows)
    ducked = dict(
        duckdb.sql(
            f"SELECT k, CAST(round(sum(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE) AS v"
            f" FROM (VALUES {vals}) AS t(k, x) GROUP BY k"
        ).fetchall()
    )
    old_form = dict(
        duckdb.sql(
            f"SELECT k, round(CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE), 2) AS v"
            f" FROM (VALUES {vals}) AS t(k, x) GROUP BY k"
        ).fetchall()
    )
    diverged = 0
    for i, v in rows:
        ref = float(
            Decimal(v).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        )
        assert got[i] == ref, f"spark {got[i]!r} != HALF_UP {ref!r} for {v}"
        assert ducked[i] == ref, f"duckdb {ducked[i]!r} != HALF_UP {ref!r} for {v}"
        if old_form[i] != ref:
            diverged += 1
    assert diverged > 0, (
        "expected the old round(CAST(sum AS DOUBLE), 2) form to diverge on "
        "at least one tie — if DuckDB now HALF_UPs doubles, re-evaluate"
    )


def test_sum_expr_multirow_tie_sum(spark):
    """A tie manufactured by SUMMING (0.2125 x 2 = 0.425), not by a
    single value — the aggregate path itself, exactly the sf1.0
    nation_trade_volume shape."""
    sdf = spark.createDataFrame(
        [("0.2125",), ("0.2125",)], "x string"
    ).select(F.col("x").cast("decimal(18,4)").alias("x"))
    v = sdf.agg(sum_expr(F.col("x"), "v")).head().v
    assert v == 0.43, f"expected HALF_UP 0.43, got {v!r}"
    o = duckdb.sql(
        "SELECT CAST(round(sum(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE)"
        " FROM (VALUES ('0.2125'), ('0.2125')) AS t(x)"
    ).fetchone()[0]
    assert o == 0.43
