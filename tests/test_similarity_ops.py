"""Algebraic invariants for the similarity/ANN operators — the
properties that hold at ANY scale, independent of the DuckDB oracles:
exhaustive probing must recover the exact answer, and the batched
path must equal the one-query path per query."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators import similarity as S

from .conftest import SF_CORRECT


def _emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


def test_batch_topk_equals_single_query_topk(spark):
    """batch_topk restricted to one q_id must equal brute_force_topk
    for that query (same k, same tie-breaks)."""
    emb = _emb(spark)
    batch = {
        (r.q_id, r.vec_id, r.cos)
        for r in S.batch_topk(emb, n_queries=3, k=5).collect()
    }
    for qid in range(3):
        single = S.brute_force_topk(emb, query_vec_id=qid, k=5).collect()
        expect = {(qid, r.vec_id, r.cos) for r in single}
        got = {t for t in batch if t[0] == qid}
        assert got == expect, f"q_id={qid}"


def test_ivf_full_probe_recovers_exact_topk(spark):
    """With n_probe = n_seeds (probe every inverted list) IVF search
    degenerates to exact search — the recall dial's end stop. Pins
    that the index/assign/search plumbing loses nothing; only probe
    pruning may trade recall."""
    emb = _emb(spark)
    exact = [(r.vec_id, r.cos) for r in S.brute_force_topk(emb, 0, k=7).collect()]
    full_probe = [
        (r.vec_id, r.cos)
        for r in S.ivf_topk(emb, query_vec_id=0, k=7, n_seeds=8, n_probe=8).collect()
    ]
    assert full_probe == exact


def test_ivf_assign_is_total_and_unique(spark):
    """Every vector gets exactly one centroid, and every centroid id
    is one of the seeds."""
    emb = _emb(spark)
    v = S.embeddings_quantized(emb)
    c1 = S.ivf_refined_centroids(v, n_seeds=8)
    a = S.ivf_assign(v, c1)
    n = emb.count()
    assert a.count() == n
    assert a.select("vec_id").distinct().count() == n
    cids = {r.cid for r in a.select("cid").distinct().collect()}
    assert cids <= set(range(8))


def test_ivf_centroid_members_sum_to_corpus(spark):
    """The refined-centroid member counts partition the corpus."""
    emb = _emb(spark)
    v = S.embeddings_quantized(emb)
    c1 = S.ivf_refined_centroids(v, n_seeds=8)
    total = c1.agg(F.sum("n_members")).collect()[0][0]
    assert total == emb.count()


def test_kmeans_members_partition_corpus_at_any_depth(spark):
    """Every Lloyd iteration must keep the assignment total: member
    counts partition the corpus after 1 and after 3 rounds."""
    emb = _emb(spark)
    v = S.embeddings_quantized(emb)
    n = emb.count()
    for it in (1, 3):
        c = S.kmeans_train(v, n_seeds=8, n_iter=it)
        assert c.agg(F.sum("n_members")).collect()[0][0] == n, f"n_iter={it}"
