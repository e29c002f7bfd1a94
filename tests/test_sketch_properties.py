"""Property tests for the estimator queries: randomized inputs must
agree with pure-Python references (and the DuckDB oracle) — pinning
the estimator arithmetic itself, not just one corpus's answer."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .oracle_check import compare_query

_prices = st.lists(
    st.integers(min_value=1, max_value=2_000_000),  # cents
    min_size=1,
    max_size=60,
)


def _ref_hist_quantiles(cents):
    """Python restatement of the integer-exact estimator: scaled
    integer interpolation for the estimate, order-statistic rational
    arithmetic for the exact percentile — the same half-up integers
    both engines compute (round-4 verdict headline fix)."""
    hist: dict[int, int] = {}
    for c in cents:
        b = c.bit_length() - 1 if c > 0 else 0
        hist[b] = hist.get(b, 0) + 1
    n = len(cents)
    s = sorted(cents)
    out = []
    for num, den in ((1, 2), (9, 10), (99, 100)):
        k = (num * n + den - 1) // den
        f, rem = divmod(num * (n - 1), den)
        c_lo, c_hi = s[f], s[min(f + 1, n - 1)]
        exact_p4 = ((c_lo * den + (c_hi - c_lo) * rem) * 100 + den // 2) // den
        cum = 0
        for b in sorted(hist):
            prev = cum
            cum += hist[b]
            if cum >= k:
                lo, hi = 1 << b, (1 << (b + 1)) - 1
                est_p4 = (
                    lo * 10000
                    + (hi - lo) * (k - prev - 1) * 10000 // max(hist[b] - 1, 1)
                    + 50
                ) // 100
                out.append((k, b, est_p4 / 10000.0, exact_p4 / 10000.0))
                break
    return out


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_prices)
def test_histogram_quantiles_match_python_and_oracle(
    spark, tmp_path_factory, cents
):
    tmp = tmp_path_factory.mktemp("hq")
    pd.DataFrame({"o_totalprice": [c / 100.0 for c in cents]}).to_parquet(
        tmp / "orders.parquet"
    )
    e = REGISTRY["sketch_histogram_quantiles"]
    compare_query(spark, e.fn, e.oracle, str(tmp), name="hq-prop")
    rows = e.fn(spark, str(tmp)).orderBy("k_rank", "qname").collect()
    ref = _ref_hist_quantiles(cents)
    got = sorted(((r.k_rank, r.bucket, r.est_price, r.exact_price) for r in rows))
    assert len(got) == len(ref)
    for (gk, gb, ge, gx), (rk, rb, re_, rx) in zip(got, sorted(ref), strict=True):
        assert (gk, gb) == (rk, rb)
        # Exact: both sides are the same integer divided by 10^4.
        assert ge == re_
        assert gx == rx


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _det_round(x: float, dp: int) -> float:
    """Python restatement of _util.det_round_*: explicit
    floor(x*10^dp + 0.5)/10^dp in IEEE double arithmetic."""
    s = float(10 ** dp)
    if abs(x) >= float(2 ** 53) / s:
        return x
    return math.floor(x * s + 0.5) / s


def _ref_join_estimate(a_keys, b_keys, k=64):
    ah = sorted({_h60(f"jk:{x}") for x in a_keys})[:k]
    bh = sorted({_h60(f"jk:{x}") for x in b_keys})[:k]
    mk = sorted(set(ah) | set(bh))[:k]
    m = len(mk)
    kth = max(mk)
    c = sum(1 for h in mk if h in set(ah) and h in set(bh))
    n_true = len(set(a_keys) & set(b_keys))
    u = float(m) if m < k else float(k - 1) * float(1 << 60) / float(kth)
    return dict(
        kth_hash=kth, m_merged=m, n_both=c, n_true=n_true,
        union_est=_det_round(u, 4),
        # Integer-exact half-up of c/m at 6 decimals (exact_ratio idiom).
        jaccard_est=((2 * c * 10**6 + m) // (2 * m)) / 10**6,
        inter_est=_det_round((c / m) * u, 4),
    )


_keys = st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=80)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_keys, _keys)
def test_join_estimate_matches_python_and_oracle(
    spark, tmp_path_factory, a_keys, b_keys
):
    tmp = tmp_path_factory.mktemp("jk")
    pd.DataFrame({"o_orderkey": a_keys}).to_parquet(tmp / "orders.parquet")
    pd.DataFrame({"l_orderkey": b_keys}).to_parquet(tmp / "lineitem.parquet")
    e = REGISTRY["sketch_join_estimate"]
    compare_query(spark, e.fn, e.oracle, str(tmp), name="jk-prop")
    r = e.fn(spark, str(tmp)).head()
    ref = _ref_join_estimate(a_keys, b_keys)
    assert r.kth_hash == ref["kth_hash"]
    assert r.m_merged == ref["m_merged"]
    assert r.n_both == ref["n_both"]
    assert r.n_true == ref["n_true"]
    # Exact: the engine expressions are deterministic doubles /
    # integer-exact ratios, and the Python reference replays the same
    # IEEE ops (round-5 tie-class sweep).
    assert r.union_est == ref["union_est"]
    assert r.jaccard_est == ref["jaccard_est"]
    assert r.inter_est == ref["inter_est"]
