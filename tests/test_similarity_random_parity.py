"""Randomized cross-engine parity for the embedding-similarity
family (round 6) — the `test_random_corpus_parity` pattern extended
to the last un-fuzzed oracle surface: cosine scoring, LSH bucketing,
and the norm-QA profile on embeddings nobody curated.

Adversarial axes the fixed sf fixtures never exercise:
- ZERO-NORM vectors (a dead embedding, or components below the
  0.5e-6 quantization epsilon): cosine is undefined. Under ANSI
  mode Spark used to THROW DIVIDE_BY_ZERO on the double division
  while DuckDB yields NULL — one dead embedding anywhere in a
  100 TB corpus would have killed the whole job. `cosine` now uses
  try_divide (NULL, dropped by threshold/rank predicates on both
  engines — both default to NULLS LAST under DESC).
- exact duplicates and scaled copies (cos == 1 ties, rank
  tie-breaks on vec_id);
- negative components (bucket sign bits, negative cosines);
- near-threshold magnitudes around the 0.45 pair cutoff.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

from .oracle_check import compare_query

DIM = 64  # the hyperplane table is 8x64; corpus vectors must match

# Deterministic base directions (values on the 1e-6 quantization grid
# so scaled copies stay EXACT multiples after quantization).
_PATTERNS = [
    np.array([0.25 if i % 2 == 0 else -0.5 for i in range(DIM)]),
    np.array([1.0 if i < 8 else 0.0 for i in range(DIM)]),
    np.array([((i * 7) % 5 - 2) * 0.125 for i in range(DIM)]),
    np.array([0.5 for _ in range(DIM)]),
]
_ZERO = np.zeros(DIM)
_EPSILON = np.full(DIM, 1e-9)  # quantizes to the zero vector


def _write_embeddings(tmp, vectors: list[np.ndarray]) -> None:
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vectors)), type=pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, dtype=np.float32) for v in vectors],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(
                [i % 3 for i in range(len(vectors))], type=pa.int32()
            ),
        }
    )
    pq.write_table(tbl, f"{tmp}/embeddings.parquet")


_SIM_QUERIES = [
    "dedup_embedding_cosine",
    "similarity_lsh_near_pairs",
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    "embedding_norm_stats",
    "embedding_quantize_int8",
]


def test_all_dead_label_quantizes_to_null_not_crash(spark, tmp_path):
    """Regression pin (round-6 fuzz class): a label whose EVERY
    embedding quantizes to zero has amax_q = 0; the int8 quantization
    must emit NULL certificates for that label on both engines, not
    throw DIVIDE_BY_ZERO under ANSI. Label layout is i % 3, so six
    vectors with _ZERO/_EPSILON at positions 0 and 3 make label 0
    entirely dead while labels 1-2 stay live."""
    vectors = [
        _ZERO,          # label 0 (dead)
        _PATTERNS[0],   # label 1
        _PATTERNS[1],   # label 2
        _EPSILON,       # label 0 (dead: quantizes to zero)
        _PATTERNS[2],   # label 1
        2.0 * _PATTERNS[0],  # label 2
    ]
    _write_embeddings(tmp_path, vectors)
    e = REGISTRY["embedding_quantize_int8"]
    compare_query(spark, e.fn, e.oracle, str(tmp_path), name="dead-label-q8")


def _run_all(spark, tmp) -> None:
    for name in _SIM_QUERIES:
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp), name=f"rand-{name}")


def test_zero_norm_embeddings_null_not_crash(spark, tmp_path):
    """Regression pin for the round-6 finding: a corpus containing a
    true zero vector AND a sub-epsilon vector must run every
    similarity query without DIVIDE_BY_ZERO and match the oracle
    (NULL cosine rows drop from pairs; rank output agrees)."""
    vectors = [
        _PATTERNS[0],          # vec_id=0 is the top-k query vector
        _ZERO,
        _EPSILON,
        _PATTERNS[1],
        2.0 * _PATTERNS[0],    # scaled copy: cos==1 with the query
        _PATTERNS[2],
    ]
    _write_embeddings(tmp_path, vectors)
    _run_all(spark, tmp_path)


def test_zero_norm_query_vector_matches_oracle(spark, tmp_path):
    """The QUERY vector itself (vec_id=0) has zero norm: every
    cosine in the top-k rank is NULL; both engines sort NULLS LAST
    under DESC and tie-break on vec_id, so the k rows still agree."""
    vectors = [_ZERO, _PATTERNS[0], _PATTERNS[1], _PATTERNS[2], _EPSILON]
    _write_embeddings(tmp_path, vectors)
    _run_all(spark, tmp_path)


# A corpus is a list of (pattern, scale, flip-sign, zero-out-tail)
# specs; duplicates are likely by construction (4 patterns, small
# modifier space), driving cos==1 ties and hot LSH buckets.
_vec_spec = st.tuples(
    st.integers(min_value=0, max_value=len(_PATTERNS) - 1),
    st.sampled_from([1.0, 2.0, 0.5]),
    st.booleans(),
    st.integers(min_value=0, max_value=2),
)
_corpus = st.lists(_vec_spec, min_size=2, max_size=8)


def _build(spec) -> np.ndarray:
    pat, scale, flip, zero_tail = spec
    v = _PATTERNS[pat] * scale * (-1.0 if flip else 1.0)
    if zero_tail:
        v = v.copy()
        v[-(zero_tail * 16):] = 0.0
    return v


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpus, st.booleans())
def test_similarity_queries_match_oracle_on_random_embeddings(
    spark, tmp_path_factory, specs, add_zero
):
    tmp = tmp_path_factory.mktemp("randsim")
    vectors = [_build(s) for s in specs]
    if add_zero:
        vectors.append(_ZERO)
    _write_embeddings(tmp, vectors)
    _run_all(spark, tmp)
