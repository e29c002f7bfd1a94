"""Randomized differential tests for the iterative graph operators
(round 6) — the `test_random_corpus_parity` pattern applied to the
one operator class with no DuckDB oracle twin: the ground truth here
is an INDEPENDENT sequential algorithm, not a second SQL engine.

- `connected_components` vs a pure-Python union-find: min-label
  propagation and union-find share no code or algorithmic shape, so
  agreement on random graphs (self-loops, duplicate/bidirectional
  edges, negative ids, isolated vertices, multi-hop paths) is real
  evidence. The fixed cases in test_graph.py pin the convergence /
  singleton contracts; this battery covers the topology space nobody
  hand-picked.
- `weighted_pagerank` vs a sequential replay of its written spec
  (contribution = (r*w) div ow per edge, inflow summed per dst,
  update = 0.15*scale + (85*inflow) div 100). The operator promises
  bit-identical integer output on ANY partitioning; the replay is
  single-threaded, so agreement proves the distributed join/agg
  arrangement computes exactly the spec — the failure mode this
  catches is floor-division applied at the wrong granularity (e.g.
  dividing after partial aggregation), which no same-engine test
  would see.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit6_5840_6_824_lab1_mapreduce_spark.operators.graph import (
    connected_components,
    weighted_pagerank,
)

# Node ids deliberately include negatives and gaps: min-label CC must
# work on arbitrary int64 labels, not dense 0..n indexes.
_NODE_POOL = st.integers(min_value=-50, max_value=50)

_graph = st.tuples(
    # edges: duplicates, self-loops, and both orientations all legal
    st.lists(st.tuples(_NODE_POOL, _NODE_POOL), min_size=0, max_size=40),
    # extra isolated vertices (exercise the union-back singleton path)
    st.lists(_NODE_POOL, min_size=1, max_size=10),
)


def _union_find_components(edges, vertices):
    """Ground truth: classic union-find, component label = min id."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for v in vertices:
        groups.setdefault(find(v), []).append(v)
    return {v: min(members) for members in groups.values() for v in members}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_graph)
def test_connected_components_match_union_find(spark, graph):
    edges, extra = graph
    vertices = sorted({v for e in edges for v in e} | set(extra))
    vdf = spark.createDataFrame([(v,) for v in vertices], "id long")
    edf = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        edf = edf.limit(0)
    got = {
        r["id"]: r["component"]
        for r in connected_components(vdf, edf).collect()
    }
    assert got == _union_find_components(edges, vertices)


def test_connected_components_interleaved_negative_paths(spark):
    """Two node-interleaved paths (one all-negative) must not merge:
    propagation visits both in the same rounds and the min label of
    each is at the far end of its chain (worst-case hop count)."""
    path_a = [-9, 3, -7, 5, -5, 7, -3, 9]  # min = -9 at the head
    path_b = [10, -10, 12, -12, 14, -14]   # min = -14 at the tail
    edges = list(zip(path_a, path_a[1:])) + list(zip(path_b, path_b[1:]))
    vertices = sorted(set(path_a + path_b) | {0})  # 0 isolated
    vdf = spark.createDataFrame([(v,) for v in vertices], "id long")
    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(vdf, edf).collect()
    }
    expect = {v: -9 for v in path_a} | {v: -14 for v in path_b} | {0: 0}
    assert got == expect


def _pagerank_replay(edges, n_iter, scale):
    """Sequential replay of the documented integer PageRank spec.
    Python's // floors like Spark's `div` for the non-negative
    rank/weight domain generated here (weights >= 1, ranks >= 0)."""
    nodes = sorted({v for e in edges for v in e[:2]})
    ow = {}
    for s, _, w in edges:
        ow[s] = ow.get(s, 0) + w
    rank = {v: scale for v in nodes}
    base = int(0.15 * scale)
    for _ in range(n_iter):
        inflow = {}
        for s, d, w in edges:
            inflow[d] = inflow.get(d, 0) + (rank[s] * w) // ow[s]
        rank = {v: base + (85 * inflow.get(v, 0)) // 100 for v in nodes}
    return rank


_wedges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=25,
).map(
    # one weight per (src, dst): the operator sums duplicate edges into
    # out-weight but contributes per ROW, while the replay iterates raw
    # rows — identical semantics, but dedup keeps the case canonical
    lambda es: sorted({(s, d): w for s, d, w in es}.items())
).map(lambda es: [(s, d, w) for (s, d), w in es])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_wedges, st.integers(min_value=1, max_value=4))
def test_weighted_pagerank_matches_sequential_replay(spark, edges, n_iter):
    edf = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in weighted_pagerank(edf, n_iter=n_iter).collect()
    }
    assert got == _pagerank_replay(edges, n_iter, 1_000_000)
