"""Structural invariants for the round-4 additions — properties the
oracle hash-compare implies but never states, pinned so refactors
cannot silently break the semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .conftest import SF_SMOKE


def test_funnel_counts_are_monotone_non_increasing(spark):
    rows = (
        REGISTRY["events_funnel_conversion"]
        .fn(spark, SF_SMOKE)
        .orderBy("step_rank")
        .collect()
    )
    assert [r.step for r in rows] == ["signup", "view", "click", "purchase"]
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].conversion == 1.0
    assert all(0.0 <= r.conversion <= 1.0 for r in rows)


def test_ngram_diversity_ratios_are_valid(spark):
    rows = REGISTRY["corpus_ngram_diversity"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.distinct_grams <= r.total_grams
        assert 0.0 < r.diversity <= 1.0
    # longer grams repeat less: per source, diversity must not drop
    # as n grows (1-gram diversity is the floor)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.gram_n] = r.diversity
    for src, d in by_src.items():
        assert d[1] <= d[2] <= d[3], (src, d)


def test_bpe_fertility_bounds(spark):
    rows = REGISTRY["corpus_bpe_token_counts"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_bpe_tokens >= r.n_words  # every word is >= 1 subword
        assert r.fertility >= 1.0


def test_join_estimate_sketch_sanity(spark):
    r = REGISTRY["sketch_join_estimate"].fn(spark, SF_SMOKE).head()
    assert 0 < r.m_merged <= r.kmv_k
    assert 0 <= r.n_both <= r.m_merged
    assert 0.0 <= r.jaccard_est <= 1.0
    assert r.union_est > 0
    # orders/lineitem keys overlap almost fully: the estimate must be
    # in the right order of magnitude (sketch error is ~1/sqrt(k))
    assert r.n_true > 0
    assert 0.2 * r.n_true < r.inter_est < 5 * r.n_true


def test_histogram_quantiles_are_ordered_and_in_bucket(spark):
    rows = (
        REGISTRY["sketch_histogram_quantiles"]
        .fn(spark, SF_SMOKE)
        .orderBy("k_rank")
        .collect()
    )
    assert [r.qname for r in rows] == ["p50", "p90", "p99"]
    ests = [r.est_price for r in rows]
    exacts = [r.exact_price for r in rows]
    assert ests == sorted(ests)
    assert exacts == sorted(exacts)
    for r in rows:
        lo, hi = (1 << r.bucket) / 100.0, ((1 << (r.bucket + 1)) - 1) / 100.0
        assert lo <= r.est_price <= hi


def test_semantic_mixture_covers_every_document(spark):
    df = REGISTRY["corpus_semantic_mixture"].fn(spark, SF_SMOKE)
    total = df.agg(F.sum("n_docs")).head()[0]
    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table

    assert total == table(spark, SF_SMOKE, "documents").count()


def test_cluster_sample_caps_per_cluster(spark):
    df = REGISTRY["embedding_cluster_sample"].fn(spark, SF_SMOKE)
    over = df.groupBy("cid").count().where(F.col("count") > 5).count()
    assert over == 0
    assert df.where((F.col("pick_rank") < 1) | (F.col("pick_rank") > 5)).count() == 0


# ---- property: diversity vs pure-Python reference ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_doc = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta"]),
    min_size=0, max_size=12,
).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _ref_diversity(texts):
    out = {}
    toks = [t.split() for t in texts]
    for n in (1, 2, 3):
        grams = [
            tuple(ts[i:i + n]) for ts in toks for i in range(len(ts) - n + 1)
        ]
        if grams:
            out[n] = (len(grams), len(set(grams)))
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpus)
def test_diversity_matches_python_reference(spark, tmp_path_factory, texts):
    import pandas as pd

    tmp = tmp_path_factory.mktemp("div")
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp / "documents.parquet")
    rows = REGISTRY["corpus_ngram_diversity"].fn(spark, str(tmp)).collect()
    got = {r.gram_n: (r.total_grams, r.distinct_grams) for r in rows}
    assert got == _ref_diversity(texts)


def test_training_export_is_leakage_safe_and_consistent(spark):
    exp = REGISTRY["pipeline_training_export"].fn(spark, SF_SMOKE)
    rows = exp.collect()
    assert rows
    # no exported component hashes to the holdout side
    import hashlib

    for r in rows:
        assert hashlib.md5(f"lsplit:{r.component}".encode()).hexdigest()[0] not in (
            "0",
            "1",
        )
        assert r.seq_first <= r.seq_last
        assert r.n_tokens >= 1
    # exported set == (keep verdicts ∩ train split) minus zero-token docs
    clean = (
        REGISTRY["pipeline_clean_corpus"]
        .fn(spark, SF_SMOKE)
        .where("verdict = 'keep'")
        .select("doc_id")
    )
    split = (
        REGISTRY["corpus_leakage_safe_split"]
        .fn(spark, SF_SMOKE)
        .where("split = 'train'")
        .select("doc_id")
    )
    from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
    from mit6_5840_6_824_lab1_mapreduce_spark.queries.training import TOKEN_RE

    toks = table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)).alias("nt"),
    )
    expect = {
        r.doc_id
        for r in clean.join(split, "doc_id")
        .join(toks, "doc_id")
        .where(F.col("nt") > 0)
        .collect()
    }
    assert {r.doc_id for r in rows} == expect
