"""Hot-bucket guard for the LSH band self-joins (round-1 verdict #8):
a degenerate band value (many identical/boilerplate docs) creates one
giant bucket whose self-join is m²/2 pairs. The cap drops oversized
buckets BEFORE the join; `oversized_buckets` audits what was skipped.

Recall contract under test: pairs whose only shared bucket is
oversized are lost; pairs sharing any normal-sized bucket survive.
"""

from __future__ import annotations


from mit6_5840_6_824_lab1_mapreduce_spark.operators.dedup import (
    lsh_bands_df,
    lsh_candidate_pairs,
    minhash_lsh_dedup_pairs,
    minhash_signature_df,
    oversized_buckets,
    shingle_pairs_df,
    simhash32,
    simhash_near_pairs,
)

_BOILER = "the quick brown fox jumps over the lazy dog again and again " * 3


def _skewed_docs(spark, n_hot: int = 30):
    """n_hot identical boilerplate docs (one giant bucket in EVERY
    band) + one genuinely-near pair + unrelated docs."""
    rows = [(i, _BOILER) for i in range(n_hot)]
    rows += [
        # an exact duplicate pair: shares every band deterministically,
        # lives in buckets of size 2 — must survive any cap > 2
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (200, "completely different text about distributed dataflow engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_drops_hot_bucket_keeps_real_pairs(spark):
    docs = _skewed_docs(spark)
    uncapped = minhash_lsh_dedup_pairs(docs, threshold=0.5)
    capped = minhash_lsh_dedup_pairs(docs, threshold=0.5, max_bucket_size=10)

    got_uncapped = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    got_capped = {(r["id_a"], r["id_b"]) for r in capped.collect()}

    # uncapped: all 30·29/2 boilerplate pairs + the real near-pair
    assert (100, 101) in got_uncapped and len(got_uncapped) == 30 * 29 // 2 + 1
    # capped: the hot bucket's pairs are gone, the real pair survives
    assert got_capped == {(100, 101)}


def test_oversized_buckets_audit(spark):
    docs = _skewed_docs(spark)
    sh = shingle_pairs_df(docs)
    bands = lsh_bands_df(minhash_signature_df(sh))
    audit = oversized_buckets(bands, max_bucket_size=10).collect()
    # the 30 identical docs share one bucket in each of the 4 bands
    assert len(audit) == 4
    assert all(r["bucket_size"] == 30 for r in audit)


def test_capped_candidates_subset_of_uncapped(spark):
    docs = _skewed_docs(spark)
    bands = lsh_bands_df(minhash_signature_df(shingle_pairs_df(docs)))
    full = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(bands).collect()}
    capped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(bands, max_bucket_size=10).collect()
    }
    assert capped <= full


def test_simhash_cap_drops_hot_segment_bucket(spark):
    docs = _skewed_docs(spark)
    fps = simhash32(docs)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(fps, max_hamming=3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(fps, max_hamming=3, max_bucket_size=10).collect()
    }
    # identical docs are hamming-0 pairs; the cap removes that clique
    assert len(uncapped) >= 30 * 29 // 2
    assert all(a >= 100 or b >= 100 for a, b in capped)
    assert capped <= uncapped


def test_incremental_verdicts_consistent_with_batch_lsh(spark):
    """The incremental path must agree with the from-scratch batch
    dedup on the same corpus: a new doc (id % 5 == 0) has a verified
    near-dup pair in `dedup_minhash_lsh` iff the incremental verdict
    flags it as a dup — same signatures, same bands, same verify."""
    from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY
    from .conftest import SF_CORRECT

    batch = REGISTRY["dedup_minhash_lsh"].fn(spark, SF_CORRECT).collect()
    inc = REGISTRY["dedup_incremental_new"].fn(spark, SF_CORRECT).collect()
    dup_new_ids = {
        i
        for r in batch
        for i in (r.id_a, r.id_b)
        if i % 5 == 0
    }
    for r in inc:
        flagged = r.n_index_dups + r.n_batch_dups > 0
        assert flagged == (r.doc_id in dup_new_ids), r
        if r.verdict == "unique":
            assert r.keep and r.best_match_id is None, r
