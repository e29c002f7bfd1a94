r"""r08 nulls-fix preview: PROOF the written fix plan works.

Round 7 pinned 16 cross-engine divergences found by the nulls fixture
(SCALE.md §Null-input contract) instead of fixing them — every fix
touches a registered oracle's text and 16 def-hash changes would
scramble the determined r07 seat window. A written plan can still be
wrong, so this module executes ONE representative fix per root-cause
class against the actual nulls fixture and asserts the divergence
disappears, without touching any registered definition:

- class (a) NULL join/group keys  → dedup_exact_keep,   sentinel rule
- class (b) nullable sort keys    → customer_rfm_segments, explicit
                                    NULLS LAST on both engines
- class (c) NULL embeddings/elems → dedup_embedding_cosine, one shared
                                    drop rule on both engines

In r08 the same rules move INTO the registered definitions (plus the
matching oracle text) and the pins are removed; these tests then
become redundant with the unpinned sweep lane and can be deleted —
they exist to de-risk the plan, not to live forever.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators import similarity as S
from mit6_5840_6_824_lab1_mapreduce_spark.queries._util import sum_money
from tests.oracle_check import _normalize, duckdb_connect
from tools.degenerate_sweep import write_fixture


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    return write_fixture(str(tmp_path_factory.mktemp("nullsfix") / "nulls"), "nulls")


def _assert_frames_match(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), f"{name}: rows spark={len(sdf)} oracle={len(odf)}"
    s, o = _normalize(sdf), _normalize(odf)
    assert s.equals(o), f"{name}: value mismatch\n{s}\n{o}"


def test_class_a_null_group_key_sentinel_fixes_exact_keep(spark, nulls_dir):
    """Pinned: dedup_exact_keep loses NULL-text docs (spark=3 rows vs
    oracle=4 — the groups join drops NULL digests, the oracle's window
    keeps them). The r08 rule: coalesce the content digest to a
    sentinel, so NULL-text documents form ONE dedup group with a
    min-doc_id keeper like any other duplicate class — on BOTH
    engines. Preview runs the registered plan SHAPE (digest aggregate
    + join-back) with the sentinel digest."""
    docs = spark.read.parquet(f"{nulls_dir}/documents.parquet")
    digest = F.coalesce(F.md5("text"), F.lit("<null-text>"))
    hashed = docs.select("doc_id", digest.alias("content_hash"))
    g = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )
    fixed = (
        hashed.join(g, "content_hash")
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "content_hash", "n_copies")
    )
    con = duckdb_connect(nulls_dir)
    try:
        odf = con.sql(
            """
            SELECT doc_id, content_hash, n_copies FROM (
              SELECT doc_id,
                     coalesce(md5(text), '<null-text>') AS content_hash,
                     min(doc_id) OVER (PARTITION BY coalesce(md5(text), '<null-text>'))
                       AS keep_id,
                     count(*) OVER (PARTITION BY coalesce(md5(text), '<null-text>'))
                       AS n_copies
              FROM documents
            ) WHERE doc_id = keep_id
            """
        ).df()
    finally:
        con.close()
    sdf = fixed.toPandas()
    _assert_frames_match(sdf, odf, "exact_keep_sentinel")
    # And the NULL-text doc is actually IN the verdicts now (the pin's
    # complaint was that it vanished from the Spark side entirely).
    assert "<null-text>" in {
        r.content_hash for r in fixed.collect()
    } or all(t is not None for t in [r.text for r in docs.collect()])


def test_class_b_explicit_null_order_fixes_rfm(spark, nulls_dir):
    """Pinned: customer_rfm_segments ntiles on nullable recency /
    monetary — Spark ASC is NULLS FIRST, DuckDB ASC is NULLS LAST, so
    quartiles diverge. The r08 rule: EXPLICIT NULLS LAST on every
    nullable sort key, both engines (unknown recency/monetary ranks
    worst, the standard RFM treatment). Preview reconstructs the
    registered plan with asc_nulls_last/desc_nulls_last and the
    matching `NULLS LAST` oracle clauses."""
    o = spark.read.parquet(f"{nulls_dir}/orders.parquet")
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        sum_money("o_totalprice", "monetary"),
    )
    w_all = Window.partitionBy()
    cust = cust.withColumn(
        "recency_days",
        F.datediff(F.max("last_order").over(w_all), F.col("last_order")),
    )
    scored = (
        cust.withColumn(
            "r_q",
            F.ntile(4).over(
                Window.orderBy(
                    F.asc_nulls_last("recency_days"), F.asc_nulls_last("o_custkey")
                )
            ),
        )
        .withColumn(
            "f_q",
            # EVERY key needs the explicit treatment, including the
            # tie-break: o_custkey itself is nullable on this fixture
            # (a NULL-custkey order group), and the first preview run
            # caught exactly this — the class-(b) audit must cover
            # tie-break columns, not just the headline sort key.
            F.ntile(4).over(
                Window.orderBy(
                    F.desc_nulls_last("frequency"), F.asc_nulls_last("o_custkey")
                )
            ),
        )
        .withColumn(
            "m_q",
            F.ntile(4).over(
                Window.orderBy(F.desc_nulls_last("monetary"), F.asc_nulls_last("o_custkey"))
            ),
        )
    )
    fixed = scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").alias("n_customers"),
        sum_money("monetary", "segment_monetary"),
    )
    con = duckdb_connect(nulls_dir)
    try:
        odf = con.sql(
            r"""
            WITH cust AS (
              SELECT o_custkey,
                     date_diff('day', max(o_orderdate),
                               (SELECT max(o_orderdate) FROM orders)) AS recency_days,
                     count(*) AS frequency,
                     round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                       AS monetary
              FROM orders GROUP BY o_custkey
            ),
            scored AS (
              SELECT *,
                     ntile(4) OVER (ORDER BY recency_days ASC NULLS LAST,
                                    o_custkey NULLS LAST) AS r_q,
                     ntile(4) OVER (ORDER BY frequency DESC NULLS LAST,
                                    o_custkey) AS f_q,
                     ntile(4) OVER (ORDER BY monetary DESC NULLS LAST,
                                    o_custkey NULLS LAST) AS m_q
              FROM cust
            )
            SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
                   CAST(m_q AS INT) AS m_q,
                   count(*) AS n_customers,
                   round(CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE), 2)
                     AS segment_monetary
            FROM scored GROUP BY r_q, f_q, m_q
            """
        ).df()
    finally:
        con.close()
    _assert_frames_match(fixed.toPandas(), odf, "rfm_nulls_last")


def test_class_c_shared_drop_rule_fixes_embedding_cosine(spark, nulls_dir):
    """Pinned: dedup_embedding_cosine (and 5 siblings) diverge when a
    vector is NULL or contains a NULL element. The r08 rule: ONE
    shared, loudly-countable drop — a vector participates in
    similarity only if it is non-NULL and fully populated — applied
    before quantization on BOTH engines. Preview feeds both engines
    the identically-filtered relation through the UNCHANGED registered
    logic, which is exactly what the r08 WHERE clause will do."""
    from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

    emb = spark.read.parquet(f"{nulls_dir}/embeddings.parquet")
    ok = emb.where(
        F.col("embedding").isNotNull()
        & ~F.exists("embedding", lambda x: x.isNull())
    )
    fixed = S.embedding_near_pairs(ok, threshold=0.45)
    con = duckdb_connect(nulls_dir)
    try:
        con.execute(
            f"""
            CREATE OR REPLACE VIEW embeddings AS
            SELECT * FROM read_parquet('{nulls_dir}/embeddings.parquet')
            WHERE embedding IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM unnest(embedding) AS u(x)
                              WHERE x IS NULL)
            """
        )
        odf = con.sql(REGISTRY["dedup_embedding_cosine"].oracle).df()
    finally:
        con.close()
    _assert_frames_match(fixed.toPandas(), odf, "embedding_cosine_drop_rule")
    # The drop rule is countable: exactly the 2 bad vectors (one NULL
    # list, one NULL element) are excluded on this fixture.
    assert emb.count() - ok.count() == 2
