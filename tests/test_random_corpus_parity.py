"""Randomized cross-engine parity battery (round 5).

The r04 lesson: a driver-green row on the fixed sf0.01 fixture can be
FIXTURE LUCK — `sketch_histogram_quantiles` was wrong on adversarial
input while green on the fixture. These tests re-run the full
Spark-vs-DuckDB compare over Hypothesis-generated corpora/logs for the
query families whose outputs were converted to the tie-proof rounding
idioms, so the parity contract is exercised on inputs nobody curated.

Runtime note: one compare per (query, example); the battery is sized
to stay under ~2 minutes on local[32].
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .oracle_check import compare_query

# Words chosen to exercise stopword hits ('the', 'and'), repetition,
# digits and punctuation (quality ratios), and multi-language
# stopwords (language id).
_WORDS = [
    "the", "and", "data", "spark", "alpha", "beta", "und", "der",
    "los", "les", "42", "3.14", "x;y", "a,b!", "--", "zz",
]

_text = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=25
).map(" ".join)

_corpus = st.lists(_text, min_size=1, max_size=8)

# Queries driven per corpus example: pure text-metrics surface with
# integer-exact ratio outputs (cheap, no LSH machinery).
_TEXT_QUERIES = [
    "text_quality_score",
    "text_repetition_stats",
    "corpus_source_mix",
    "text_bigram_novelty",
    "corpus_bigram_lm_counts",
    "corpus_ngram_diversity",
]


def _write_documents(tmp, texts) -> None:
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": [["en", "de", "es"][i % 3] for i in range(len(texts))],
            "source": [f"s{i % 2}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp / "documents.parquet")


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpus)
def test_text_metric_queries_match_oracle_on_random_corpora(
    spark, tmp_path_factory, texts
):
    tmp = tmp_path_factory.mktemp("randcorpus")
    _write_documents(tmp, texts)
    for name in _TEXT_QUERIES:
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp), name=f"rand-{name}")


_event = st.tuples(
    st.integers(min_value=1, max_value=4),          # user_id
    st.sampled_from(["signup", "view", "click", "purchase", "error"]),
    st.integers(min_value=0, max_value=60),          # ts seconds
    st.integers(min_value=0, max_value=200_000),     # value cents
)
_log = st.lists(_event, min_size=2, max_size=60)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_log)
def test_event_ratio_queries_match_oracle_on_random_logs(
    spark, tmp_path_factory, events
):
    tmp = tmp_path_factory.mktemp("randlog")
    pd.DataFrame(
        {
            "event_id": range(len(events)),
            "ts": pd.to_datetime([e[2] for e in events], unit="s"),
            "user_id": [e[0] for e in events],
            "event_type": [e[1] for e in events],
            "value": [e[3] / 100.0 for e in events],
            "props": ["{}"] * len(events),
        }
    ).to_parquet(tmp / "events.parquet")
    for name in ("events_action_markov", "events_outlier_stats"):
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp), name=f"rand-{name}")


# Deliberate tie-denominator corpus: group sizes engineered to the
# 2^(n+1)*5^t class (640 = 2^7 * 5) where the OLD native round(double, 6)
# could diverge — a regression canary for the exact_ratio conversion.
def test_markov_on_tie_denominator_group(spark, tmp_path):
    n = 640
    rows = []
    # user 1 emits 641 events: signup then 640 alternating views/clicks
    # -> from_action 'signup' has exactly 1 transition; 'view' rows
    # create a from_n=640-ish denominator downstream.
    types = ["signup"] + ["view", "click"] * (n // 2) + ["view"]
    for i, ty in enumerate(types):
        rows.append((i, pd.Timestamp(2000 + 0, 1, 1) + pd.Timedelta(seconds=i), 1, ty, 1.0, "{}"))
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    e = REGISTRY["events_action_markov"]
    compare_query(spark, e.fn, e.oracle, str(tmp_path), name="markov-tie")
    rows_out = e.fn(spark, str(tmp_path)).collect()
    # the engineered log must actually produce a binary-heavy
    # denominator (the tie-class trigger), or the canary tests nothing
    assert any(r.from_n % 64 == 0 for r in rows_out), (
        f"canary lost its tie-class denominator: {[r.from_n for r in rows_out]}"
    )


# Near-dup-rich corpora: texts drawn from a tiny template pool with
# random tails, so exact dups, containments, and high-Jaccard pairs
# all occur — driving the LSH/verify surface (integer-exact Jaccard
# and containment ratios) through the oracle compare on random input.
_TEMPLATES = [
    "the quick brown fox jumps over the lazy dog again and again",
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs for the winter trip",
    "sphinx of black quartz judge my vow",
]

_dedup_doc = st.tuples(
    st.sampled_from(_TEMPLATES),
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=4),
).map(lambda t: " ".join([t[0], *t[1]]))

_dedup_corpus = st.lists(_dedup_doc, min_size=2, max_size=7)

_DEDUP_QUERIES = [
    "dedup_exact",
    "dedup_shingle_containment",
    "dedup_ngram_jaccard",
]


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_dedup_corpus)
def test_dedup_verify_queries_match_oracle_on_near_dup_corpora(
    spark, tmp_path_factory, texts
):
    tmp = tmp_path_factory.mktemp("randdedup")
    _write_documents(tmp, texts)
    for name in _DEDUP_QUERIES:
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp), name=f"rand-{name}")
