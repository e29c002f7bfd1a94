"""Degenerate-input behavior: empty tables, no-edge graphs, and
single-row corpora must flow through the operator pipelines without
errors and with the documented shapes — at 100 TB, some partition or
some tenant's slice is always empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_dedup_pairs,
)
from mit6_5840_6_824_lab1_mapreduce_spark.operators.graph import (
    connected_components,
)
from mit6_5840_6_824_lab1_mapreduce_spark.operators.kv import replay_final_state


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_connected_components_no_edges_all_singletons(spark):
    verts = spark.range(5).select(F.col("id"))
    edges = spark.createDataFrame([], "id_a long, id_b long")
    out = connected_components(verts, edges).collect()
    assert {(r.id, r.component) for r in out} == {(i, i) for i in range(5)}


def test_connected_components_empty_graph(spark):
    verts = spark.createDataFrame([], "id long")
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(verts, edges).count() == 0


def test_minhash_empty_and_tiny_corpus(spark):
    empty = _docs(spark, [])
    assert minhash_lsh_dedup_pairs(empty).count() == 0
    # one doc: no pairs; two short docs (< 3 tokens): no shingles, no pairs
    one = _docs(spark, [(1, "alpha beta gamma delta")])
    assert minhash_lsh_dedup_pairs(one).count() == 0
    short = _docs(spark, [(1, "alpha"), (2, "alpha")])
    assert minhash_lsh_dedup_pairs(short).count() == 0


def test_minhash_identical_pair_found(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    pair = _docs(spark, [(1, text), (2, text)])
    rows = minhash_lsh_dedup_pairs(pair, threshold=0.99).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].jaccard == 1.0


def test_exact_dedup_empty(spark):
    assert exact_dedup_groups(_docs(spark, [])).count() == 0


def test_kv_replay_empty_log(spark):
    ops = spark.createDataFrame(
        [], "seq long, client_id long, request_id long, op string, key string, value string"
    )
    assert replay_final_state(ops).count() == 0


def test_pagerank_empty_and_single_edge(spark):
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.graph import (
        weighted_pagerank,
    )

    empty = spark.createDataFrame([], "src string, dst string, weight long")
    assert weighted_pagerank(empty).count() == 0
    # one directed edge a->b: a gets only the base, b gets base + 85%
    # of a's full rank (a has a single out-edge)
    one = spark.createDataFrame([("a", "b", 7)], "src string, dst string, weight long")
    got = {r.node: r.rank_scaled for r in weighted_pagerank(one, n_iter=1).collect()}
    assert got["a"] == 150_000
    assert got["b"] == 150_000 + (85 * 1_000_000) // 100


def test_incremental_dedup_all_unique_batch(spark):
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.dedup import (
        incremental_dedup_verdicts,
    )

    # NOTE: the tokenizer keeps ONLY letter runs (digits vanish), so
    # distinctness must come from letter words, not numbers.
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    docs = spark.createDataFrame(
        [
            (
                i,
                f"{w}ish {w}like {w}ward {w}most {w}ness {w}ism {w}ful {w}less",
            )
            for i, w in enumerate(words)
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup_verdicts(docs).collect()
    assert {r.doc_id for r in out} == {0, 5}  # the % 5 == 0 batch
    assert all(r.verdict == "unique" and r.keep for r in out)


def test_incremental_dedup_exact_copy_of_index(spark):
    from mit6_5840_6_824_lab1_mapreduce_spark.operators.dedup import (
        incremental_dedup_verdicts,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(3, text), (5, text)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in incremental_dedup_verdicts(docs).collect()}
    assert set(out) == {5}
    r = out[5]
    assert r.verdict == "dup_of_index" and not r.keep and r.best_match_id == 3
