"""Differential tests for the RDD parity engine: distributed run vs
the sequential oracle (the reference's own test strategy,
src/main/test-mr.sh:77-108 — compare after external sort)."""

from __future__ import annotations

from mit6_5840_6_824_lab1_mapreduce_spark.functions.hashing import fnv1a32, reduce_bucket
from mit6_5840_6_824_lab1_mapreduce_spark.operators import mrapps
from mit6_5840_6_824_lab1_mapreduce_spark.operators.mapreduce import (
    run_job,
    run_job_combining,
    run_sequential,
)

CORPUS = [
    ("pg-a.txt", "the quick brown fox jumps over the lazy dog\nthe dog barks"),
    ("pg-b.txt", "a quick brown cat naps; the fox runs. über-fox! 42 times\n"),
    ("pg-c.txt", "döner über straße ÄÖÜ niño café\nthe the the"),
    ("pg-d.txt", ""),
    ("pg-e.txt", "punctuation... only!!! 123 456 --- ___"),
]


def _golden(app: str):
    m, r = mrapps.APPS[app]
    return sorted(run_sequential(CORPUS, m, r))


def test_fnv1a_known_vectors():
    # FNV-1a 32-bit reference vectors (public constants).
    assert fnv1a32("") == 0x811C9DC5
    assert fnv1a32("a") == 0xE40C292C
    assert fnv1a32("foobar") == 0xBF9CF968
    assert 0 <= reduce_bucket("anything", 10) < 10


def test_wc_distributed_matches_sequential(spark):
    m, r = mrapps.APPS["wc"]
    got = sorted(run_job(CORPUS, m, r, n_reduce=5, spark=spark).collect())
    assert got == _golden("wc")


def test_indexer_distributed_matches_sequential(spark):
    m, r = mrapps.APPS["indexer"]
    got = sorted(run_job(CORPUS, m, r, n_reduce=3, spark=spark).collect())
    assert got == _golden("indexer")


def test_file_meta_distributed_matches_sequential(spark):
    m, r = mrapps.APPS["nocrash"]
    got = sorted(run_job(CORPUS, m, r, n_reduce=4, spark=spark).collect())
    assert got == _golden("nocrash")


def test_combining_path_matches_wc(spark):
    rdd = spark.sparkContext.parallelize(CORPUS)
    got = sorted(
        run_job_combining(
            rdd, mrapps.wc_map, lambda a, b: str(int(a) + int(b)), n_reduce=5
        ).collect()
    )
    assert got == _golden("wc")


def test_bucket_layout_parity(spark):
    """Keys land in the FNV-1a bucket the reference would use
    (mr-out-<r> layout parity, src/mr/worker.go:25-29,86-94)."""
    m, r = mrapps.APPS["wc"]
    out = run_job(CORPUS, m, r, n_reduce=7, spark=spark)
    per_part = out.mapPartitionsWithIndex(
        lambda i, rows: [(i, k) for k, _ in rows]
    ).collect()
    for part, key in per_part:
        assert part == reduce_bucket(key, 7)


from hypothesis import given, settings
from hypothesis import strategies as st

_doc_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
    max_size=200,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc_text, min_size=1, max_size=6))
def test_wc_property_distributed_matches_sequential(spark, texts):
    """Property: for arbitrary corpora (accented Latin incl. the
    tokenizer edge cases), the distributed job equals the sequential
    oracle after canonical sort — the reference's own invariant."""
    corpus = [(f"f{i}.txt", t) for i, t in enumerate(texts)]
    m, r = mrapps.APPS["wc"]
    got = sorted(run_job(corpus, m, r, n_reduce=3, spark=spark).collect())
    want = sorted(run_sequential(corpus, m, r))
    assert got == want
