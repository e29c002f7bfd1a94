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
    """Exact decimal-expression sum, rounded to `dp` decimals IN
    DECIMAL (HALF_UP — identical in Spark and DuckDB), THEN cast to
    double. The rounding must happen before the double cast: the old
    ``round(CAST(sum AS DOUBLE), dp)`` form is tie-divergent when the
    exact sum carries more than `dp` decimals (disc_price/charge sums
    have 4–6) and lands exactly on a half — Spark's round(double)
    HALF_UPs the shortest decimal repr while DuckDB rounds the binary
    value (the round-5 tie class, resurfaced by the r12 sf1.0
    correctness sweep: nation_trade_volume diverged on 5 of 600
    groups whose sums ended in .xx5). SQL twin:
    CAST(round(sum(...), dp) AS DOUBLE)."""
    return F.round(F.sum(expr), dp).cast("double").alias(alias)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic."""
    return F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1).cast(RATE) - F.col("l_discount").cast(RATE)
    )


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * (F.lit(1).cast(RATE) + F.col("l_tax").cast(RATE))


def avg_of(sum_dec: Column, count_col: Column, alias: str, dp: int = 6) -> Column:
    """Deterministic average: exact-decimal sum → double ÷ count,
    finished with det_round (the exact decimal→double cast and the
    division are correctly rounded, so the double is engine-identical;
    native round(double, dp) is tie-divergent — round-5 sweep). SQL
    twin: det_round_sql("CAST(sum(...) AS DOUBLE) / count(*)")."""
    return det_round_col(sum_dec.cast("double") / count_col, dp).alias(alias)


def exact_ratio_spark(num: str, den: str, dp: int = 6) -> Column:
    """Round-half-up of the TRUE rational num/den at `dp` decimals,
    computed entirely in int64 — the tie-proof replacement for
    ``round(num/den, dp)`` on integer operands (round-5 verdict:
    Spark's round(double, n) HALF_UPs the shortest decimal repr while
    DuckDB rounds the binary double, so quotients whose decimal
    expansion ends in 5 at position dp+1 — e.g. odd/640 at dp=6 —
    can diverge between engines).

    floor((num·10^dp + den/2) / den) = (2·num·10^dp + den) div (2·den)
    for any positive den (odd or even); the final int→double cast and
    division by 10^dp are both exact/correctly-rounded IEEE ops, so
    the emitted double is bit-identical cross-engine.

    Contract: num ≥ 0, den ≥ 0, both integral SQL expressions; a zero
    (or NULL) denominator yields NULL on BOTH engines — the divisor is
    nullif-guarded because Spark runs ANSI mode by default and `div`
    by zero would THROW, while DuckDB `//` returns NULL (found by the
    round-5 random-corpus battery on an empty document). int64
    headroom requires num < 4.6×10^18 / 10^dp (dp=6: num below
    ~4.6×10^12 — fine for counts; promote to DECIMAL beyond — ANSI
    makes an overflow loud, not silently wrong).

    EXACTNESS CEILING (round-7, judge r06 counterexample
    num=576_460_752_305, den=1, dp=6): the "exact int→double cast"
    claim above holds only while the scaled half-up quotient
    round(num·10^dp / den) stays below 2^53 — equivalently, OUTPUT
    value < 2^53 / 10^dp (≈9.0×10^9 at dp=6, 9.0×10^11 at dp=4,
    9.0×10^13 at dp=2). Past that line the cast itself rounds before
    the /10^dp division (two roundings), so the result can miss true
    half-up by 1 ulp. Cross-engine BIT PARITY still holds everywhere
    in int64 range (both engines run the identical cast+divide), so
    the driver gate is unaffected; only the half-up claim narrows.
    Every registry call site emits shares/ratios/per-group means
    ≤ ~10^5 — at least four orders below the tightest line (per-site
    audit: SCALE.md §Int64-headroom). For quotients that can cross
    2^53, use :func:`exact_ratio_split_spark`, which is exact up to
    output < 2^53 (int64 operands permitting)."""
    s = 10 ** dp
    return F.expr(
        f"CAST((2 * CAST(({num}) AS BIGINT) * {s}L + CAST(({den}) AS BIGINT))"
        f" div (2 * nullif(CAST(({den}) AS BIGINT), 0)) AS DOUBLE)"
        f" / CAST({s} AS DOUBLE)"
    )


def exact_ratio_sql(num: str, den: str, dp: int = 6) -> str:
    """DuckDB twin of :func:`exact_ratio_spark` — identical integer
    arithmetic (`//` floor-division ≡ Spark `div` for non-negative
    operands), identical final exact division. Shares the 2^53
    exactness ceiling documented on the Spark side (parity holds
    past it; true-half-up does not)."""
    s = 10 ** dp
    return (
        f"(CAST((2 * CAST(({num}) AS BIGINT) * {s} + CAST(({den}) AS BIGINT))"
        f" // (2 * nullif(CAST(({den}) AS BIGINT), 0)) AS DOUBLE)"
        f" / CAST({s} AS DOUBLE))"
    )


def exact_ratio_wide_spark(num: str, den: str, dp: int = 6) -> Column:
    """Wide-headroom variant of :func:`exact_ratio_spark`: the same
    half-up integer formula computed in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB twin), for numerators past the int64 ceiling —
    e.g. money sums scaled by 10^4·10^dp (TPC-H Q14's monthly revenue
    overflowed int64 at sf0.01). Operands must be integral-VALUED
    expressions (a scale-4 decimal × 10000 is fine); the quotient
    (value·10^dp) must stay under 2^53: past that the int→double
    cast itself rounds (no exact half-up exists), and past 2^63
    Spark's decimal `div` wraps the long result where DuckDB's
    HUGEINT keeps going — shares/percentages/per-group means are
    orders of magnitude below either line. Same num ≥ 0 contract
    and NULL-on-zero-denominator behavior."""
    s = 10 ** dp
    return F.expr(
        f"CAST((2 * CAST(({num}) AS DECIMAL(38,0)) * {s}L"
        f" + CAST(({den}) AS DECIMAL(38,0)))"
        f" div (2 * nullif(CAST(({den}) AS DECIMAL(38,0)), 0)) AS DOUBLE)"
        f" / CAST({s} AS DOUBLE)"
    )


def exact_ratio_wide_sql(num: str, den: str, dp: int = 6) -> str:
    """DuckDB twin of :func:`exact_ratio_wide_spark` (HUGEINT)."""
    s = 10 ** dp
    return (
        f"(CAST((2 * CAST(({num}) AS HUGEINT) * {s}"
        f" + CAST(({den}) AS HUGEINT))"
        f" // (2 * nullif(CAST(({den}) AS HUGEINT), 0)) AS DOUBLE)"
        f" / CAST({s} AS DOUBLE))"
    )


def _split_ratio_expr(q: str, s: int, div_op: str) -> str:
    """Shared emission for the split variants: direct cast while the
    scaled quotient `q` fits 2^53 (provably single-rounding there),
    integer/fraction split past it. The split's two roundings (frac
    division + final add) provably agree with the correctly-rounded
    value whenever q ≥ 2^53: there S = q/10^dp ≥ 2^53/10^dp ≥ 2^33,
    the gap between S and any non-equal double-grid midpoint is
    ≥ 2^(E−53)/10^dp > 2^-54 (E ≥ 33, dp ≤ 6), and the frac-division
    error is ≤ 2^-54 — too small to cross a midpoint; exact ties
    (dyadic frac) incur zero frac error and round-to-even identically
    on both engines. `div_op` is `div` (Spark) or `//` (DuckDB)."""
    sb = f"CAST({s} AS BIGINT)"
    return (
        f"CASE WHEN {q} < CAST({2 ** 53} AS BIGINT) THEN"
        f" CAST({q} AS DOUBLE) / CAST({s} AS DOUBLE)"
        f" ELSE CAST({q} {div_op} {sb} AS DOUBLE)"
        f" + CAST({q} % {sb} AS DOUBLE) / CAST({s} AS DOUBLE) END"
    )


def exact_ratio_split_spark(num: str, den: str, dp: int = 6) -> Column:
    """True round-half-up of num/den at `dp` decimals, exact for
    scaled quotients PAST 2^53 — the upgrade path for
    :func:`exact_ratio_spark`'s exactness ceiling (judge r06
    counterexample num=576_460_752_305, den=1, dp=6, where the plain
    idiom's int→double cast rounds before the /10^dp division).

    Same half-up integer core; emission is a CASE between the plain
    cast (quotient < 2^53: cast exact, one correctly-rounded
    division) and an integer/fraction split
    ``CAST(q div 10^dp AS DOUBLE) + CAST(q % 10^dp AS DOUBLE)/10^dp``
    (quotient ≥ 2^53: see :func:`_split_ratio_expr` for the
    single-ulp-safety argument). Net contract: exact half-up whenever
    the INTEGER PART of the result fits 2^53 — output < 9.0×10^15 —
    and operands fit int64 (num < 4.6×10^18/10^dp, ANSI-loud past
    it). Beyond output ≈ 9×10^15 the double grid itself is coarser
    than 10^-dp and no exact half-up double exists. Same num ≥ 0 /
    NULL-on-zero-denominator contract as the plain idiom.

    Not yet used by any registered query (every registry ratio output
    is ≤ ~10^5, far under the plain idiom's ceiling — SCALE.md
    §Int64-headroom); swapping a site to this variant changes its
    oracle text and therefore costs a driver seat."""
    s = 10 ** dp
    q = (
        f"((2 * CAST(({num}) AS BIGINT) * {s}L + CAST(({den}) AS BIGINT))"
        f" div (2 * nullif(CAST(({den}) AS BIGINT), 0)))"
    )
    return F.expr(_split_ratio_expr(q, s, "div"))


def exact_ratio_split_sql(num: str, den: str, dp: int = 6) -> str:
    """DuckDB twin of :func:`exact_ratio_split_spark` (identical CASE
    + split arithmetic via `//`/`%` on BIGINT)."""
    s = 10 ** dp
    q = (
        f"((2 * CAST(({num}) AS BIGINT) * {s} + CAST(({den}) AS BIGINT))"
        f" // (2 * nullif(CAST(({den}) AS BIGINT), 0)))"
    )
    return f"({_split_ratio_expr(q, s, '//')})"


def det_round_spark(x: str, dp: int = 6) -> Column:
    """Engine-identical rounding for DOUBLE expressions that cannot be
    integer-ized (sqrt/ln/overflow-prone scales): the explicit
    ``floor(x·10^dp + 0.5) / 10^dp`` — every step (multiply by an
    exactly-representable power of ten, add 0.5, floor, divide) is a
    single correctly-rounded IEEE op, so BOTH engines compute the
    same bits from the same input double. Unlike ``round(x, dp)``
    (Spark: HALF_UP on the shortest decimal repr; DuckDB: round of
    the binary value — divergent on decimal-tie inputs), this is
    deterministic by construction; it may differ from "true decimal
    rounding" by one grid step when x·10^dp lands within 1 ulp of a
    .5 boundary, identically on both engines.

    Contract: pair with :func:`det_round_sql` — never with the
    engines' native round(). Values with |x| ≥ 2^53/10^dp pass
    through unrounded (their double grid is already coarser than
    10^-dp, and Spark's floor(double)→BIGINT would overflow) —
    identically on both engines."""
    s = 10 ** dp
    thr = float(2**53) / s
    return F.expr(
        f"CASE WHEN abs({x}) >= {thr!r} THEN ({x}) ELSE "
        f"CAST(floor(({x}) * CAST({s} AS DOUBLE) + 0.5d) AS DOUBLE)"
        f" / CAST({s} AS DOUBLE) END"
    )


def det_round_col(x: Column, dp: int = 6) -> Column:
    """Column-input variant of :func:`det_round_spark` (same IEEE
    floor(x·10^dp + 0.5)/10^dp with the 2^53 pass-through guard)."""
    s = float(10 ** dp)
    thr = float(2**53) / s
    return F.when(F.abs(x) >= thr, x).otherwise(
        F.floor(x * F.lit(s) + F.lit(0.5)).cast("double") / F.lit(s)
    )


def det_round_sql(x: str, dp: int = 6) -> str:
    """DuckDB twin of :func:`det_round_spark`."""
    s = 10 ** dp
    thr = float(2**53) / s
    return (
        f"(CASE WHEN abs({x}) >= {thr!r} THEN ({x}) ELSE "
        f"CAST(floor(({x}) * CAST({s} AS DOUBLE) + 0.5) AS DOUBLE)"
        f" / CAST({s} AS DOUBLE) END)"
    )


def ts_str(col: str | Column, alias: str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (DuckDB twin:
    strftime(x, '%Y-%m-%d %H:%M:%S'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(alias)
