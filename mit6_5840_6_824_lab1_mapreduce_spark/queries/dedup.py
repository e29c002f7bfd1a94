"""Dedup operator suite as oracle-checked queries over ``documents``.

The DuckDB oracles re-derive the full pipelines (shingle → minhash →
bands → verify; token → simhash) independently in SQL; the Spark side
uses the scalable banded implementations from operators/dedup.py — so
the compare also proves the banded algorithms equal their brute-force
restatements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..plans import table
from ._util import exact_ratio_spark
from .registry import query

_SHINGLES_SQL = r"""
  toks AS (
    SELECT doc_id AS id,
           list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS ts
    FROM documents
  ),
  sh0 AS (
    SELECT id, unnest(CASE WHEN len(ts) >= 3
      THEN list_transform(range(1, len(ts) - 1),
                          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
      ELSE CAST([] AS VARCHAR[]) END) AS shingle
    FROM toks
  ),
  sh AS (SELECT DISTINCT id, shingle FROM sh0)
"""

_MINHASH_SQL = (
    "sig AS (SELECT id, "
    + ", ".join(f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(16))
    + " FROM sh GROUP BY id)"
)

_BANDS_SQL = r"""
  bands AS (
    SELECT id, 0 AS band_idx, md5(h0||h1||h2||h3) AS band_hash FROM sig
    UNION ALL SELECT id, 1, md5(h4||h5||h6||h7) FROM sig
    UNION ALL SELECT id, 2, md5(h8||h9||h10||h11) FROM sig
    UNION ALL SELECT id, 3, md5(h12||h13||h14||h15) FROM sig
  )
"""


@query(
    "dedup_exact",
    oracle=rf"""
    SELECT coalesce(md5(text), '{D.NULL_TEXT_DIGEST}') AS content_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY coalesce(md5(text), '{D.NULL_TEXT_DIGEST}')
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest (one shuffle by
    digest; at 100 TB, digest once at ingest and dedup becomes a
    groupBy on a 32-byte key)."""
    return D.exact_dedup_groups(table(spark, sf_dir, "documents"))


@query(
    "dedup_minhash_lsh",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
    ),
    cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS jaccard
    FROM inter i JOIN cnt ca ON i.id_a = ca.id JOIN cnt cb ON i.id_b = cb.id
    WHERE (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.8
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4×4) + exact-Jaccard verify at 0.8 on word
    3-gram shingles. Candidate generation is an equi-join on band
    buckets — the only algorithm in this family that survives 100 TB."""
    return D.minhash_lsh_dedup_pairs(
        table(spark, sf_dir, "documents"), threshold=0.8
    )


@query(
    "dedup_minhash_lsh_capped",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    bands_capped AS (
      -- hot-bucket guard, restated: drop band buckets larger than 2
      SELECT id, band_idx, band_hash FROM (
        SELECT *, count(*) OVER (PARTITION BY band_idx, band_hash) AS bsz
        FROM bands
      ) WHERE bsz <= 2
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands_capped a JOIN bands_capped b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
    ),
    cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS jaccard
    FROM inter i JOIN cnt ca ON i.id_a = ca.id JOIN cnt cb ON i.id_b = cb.id
    WHERE (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.8
    """,
)
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH dedup with the hot-bucket guard ACTIVE (bucket cap
    2 — deliberately tight so the cap provably bites at test scale; a
    production corpus would use 10³-10⁴). The oracle restates the same
    cap with a window count, so the driver's compare pins the recall
    contract exactly: pairs whose only shared bucket is oversized are
    dropped, everything else is unchanged. Guards the candidate join
    against degenerate buckets (boilerplate/empty docs) that would
    generate m²/2 pairs from one hot value."""
    return D.minhash_lsh_dedup_pairs(
        table(spark, sf_dir, "documents"), threshold=0.8, max_bucket_size=2
    )


@query(
    "dedup_exact_keep",
    oracle=rf"""
    SELECT doc_id, content_hash, n_copies FROM (
      SELECT doc_id, coalesce(md5(text), '{D.NULL_TEXT_DIGEST}') AS content_hash,
             min(doc_id) OVER (PARTITION BY coalesce(md5(text), '{D.NULL_TEXT_DIGEST}'))
               AS keep_id,
             count(*) OVER (PARTITION BY coalesce(md5(text), '{D.NULL_TEXT_DIGEST}'))
               AS n_copies
      FROM documents
    ) WHERE doc_id = keep_id
    """,
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper selection at query level: the documents that SURVIVE
    exact dedup (keeper = min doc_id per content digest), with copy
    counts — the other half of `dedup_exact`'s group listing. At scale
    this is the join that materializes the deduplicated corpus: groups
    (a digest-keyed aggregate) joined back to the doc table on digest."""
    docs = table(spark, sf_dir, "documents")
    g = D.exact_dedup_groups(docs)
    # content_digest: null-safe sentinel (r08 nulls contract class a)
    # so the join-back keeps NULL-text documents as their own group.
    hashed = docs.select(
        "doc_id", D.content_digest(F.col("text")).alias("content_hash")
    )
    return (
        hashed.join(g, "content_hash")
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "content_hash", "n_copies")
    )


@query(
    "dedup_oversized_buckets",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL}
    SELECT band_idx, band_hash, count(*) AS bucket_size
    FROM bands
    GROUP BY band_idx, band_hash
    HAVING count(*) > 2
    """,
)
def dedup_oversized_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit half of the hot-bucket recall contract: exactly the
    band buckets `dedup_minhash_lsh_capped` (cap 2) drops, with their
    sizes. Run alongside a capped dedup job to log what was skipped —
    at 100 TB these rows are the degenerate values (boilerplate, empty
    docs) that would each have generated size²/2 candidate pairs."""
    docs = table(spark, sf_dir, "documents")
    bands = D.lsh_bands_df(D.minhash_signature_df(D.shingle_pairs_df(docs)))
    return D.oversized_buckets(bands, max_bucket_size=2)


_SIMHASH_SQL = r"""
  toks AS (
    SELECT doc_id AS id,
           unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '')) AS tok
    FROM documents
  ),
  tc AS (SELECT id, tok, count(*) AS cnt, md5(tok) AS hx FROM toks GROUP BY id, tok),
  bits AS (
    SELECT id, bs.b AS b,
           sum(CASE WHEN substr(hx, CAST(bs.b + 1 AS INTEGER), 1)
                         IN ('1','3','5','7','9','b','d','f')
                    THEN cnt ELSE -cnt END) AS s
    FROM tc CROSS JOIN (SELECT unnest(range(0, 32)) AS b) bs
    GROUP BY id, bs.b
  ),
  fp AS (
    SELECT id,
           CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY id
  )
"""


@query(
    "dedup_simhash_fingerprints",
    oracle=rf"WITH {_SIMHASH_SQL} SELECT id, simhash FROM fp",
)
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document (count-weighted token
    hashes; one md5 per distinct token)."""
    return D.simhash32(table(spark, sf_dir, "documents"))


@query(
    "dedup_simhash_pairs",
    oracle=rf"""
    WITH {_SIMHASH_SQL}
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at hamming ≤ 3. Spark side uses pigeonhole
    banding (4 segments → equi-join, no cross product); the oracle
    brute-forces all pairs — matching results prove the banding is
    lossless."""
    fps = D.simhash32(table(spark, sf_dir, "documents"))
    return D.simhash_near_pairs(fps, max_hamming=3)


@query(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH g AS (SELECT doc_id AS id, lang, source, text FROM documents),
    grams0 AS (
      SELECT id, unnest(CASE WHEN length(text) >= 8
        THEN list_transform(range(1, length(text) - 6),
                            i -> substr(text, CAST(i AS INTEGER), 8))
        ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM g
    ),
    grams AS (SELECT DISTINCT id, gram FROM grams0),
    cnt AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.id < b.id
    ),
    inter AS (
      SELECT p.id_a, p.id_b, count(*) AS n_inter
      FROM pairs p
      JOIN grams ga ON ga.id = p.id_a
      JOIN grams gb ON gb.id = p.id_b AND gb.gram = ga.gram
      GROUP BY p.id_a, p.id_b
    )
    SELECT i.id_a, i.id_b,
           (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS jaccard
    FROM inter i JOIN cnt ca ON i.id_a = ca.id JOIN cnt cb ON i.id_b = cb.id
    WHERE (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 8-gram Jaccard within bounded candidate groups
    (same lang+source). The bounded-group pattern is the scale story:
    similarity only ever computed inside small blocking partitions."""
    docs = table(spark, sf_dir, "documents")
    g = docs.select(F.col("doc_id").alias("id"), "lang", "source", "text")
    # Intersection via gram self-join WITHIN blocking keys — shuffle is
    # partitioned by (gram, lang, source), and blocked pairs that share
    # no gram never materialize. (The naive pairs×grams expansion was
    # 3× slower at bench scale and quadratic in block size at 100 TB.)
    # Per-doc gram dedup is array_distinct before the explode — narrow,
    # no shuffle (vs. a cluster-wide distinct on 2.5M exploded rows).
    gm = g.select(
        "id", "lang", "source",
        F.explode(F.array_distinct(D.char_ngrams_expr("text", 8))).alias("gram"),
    ).persist()  # feeds cnt + both sides of the intersection join
    cnt = gm.groupBy("id").agg(F.count("*").alias("n"))
    # shuffle_hash: high-cardinality random join keys gain nothing
    # from sort-merge's ordering; hash join skips sorting both sides
    # (and, unlike broadcast, stays valid when gm is TB-sized).
    a, b = gm.alias("a"), gm.hint("shuffle_hash").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(cnt.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(cnt.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            # Integer-exact half-up Jaccard (round-5 tie-class sweep).
            exact_ratio_spark(
                "n_inter", "n_a + n_b - n_inter"
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.3)
    )


_CC_SQL = r"""
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
    ),
    cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    ),
    jpairs AS (
      SELECT i.id_a, i.id_b
      FROM inter i JOIN cnt ca ON i.id_a = ca.id JOIN cnt cb ON i.id_b = cb.id
      WHERE (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.8
    ),
    e AS (
      SELECT id_a AS src, id_b AS dst FROM jpairs
      UNION SELECT id_b, id_a FROM jpairs
    ),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
    )
"""


def _minhash_components(spark: SparkSession, sf_dir: str) -> "DataFrame":
    """Shared cluster derivation for the three component consumers
    (components / keep / leakage-safe split): documents -> MinHash+LSH
    pair graph at threshold 0.8 -> min-label connected components.
    One definition so the dedup threshold and CC entry point can
    never drift between the queries that must agree on clusters."""
    from ..operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup_pairs(docs, threshold=0.8).select("id_a", "id_b")
    verts = docs.select(F.col("doc_id").alias("id"))
    return connected_components(verts, pairs)


@query(
    "dedup_minhash_components",
    oracle=rf"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    {_CC_SQL}
    SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    """,
)
def dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components (min-label
    propagation, operators/graph.py) over the MinHash+LSH pair graph
    — the step that turns pairs into dedup groups with one keeper per
    component. Iterative DataFrame loop, ≤ diameter rounds, each a
    hash join + aggregate; the oracle is a recursive-CTE transitive
    closure over the identical pair graph."""
    cc = _minhash_components(spark, sf_dir)
    return cc.select(F.col("id").alias("doc_id"), "component")


@query(
    "dedup_minhash_keep",
    oracle=rf"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    {_CC_SQL},
    comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src)
    SELECT component AS doc_id, count(*) AS cluster_size
    FROM comp GROUP BY component
    """,
)
def dedup_minhash_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving corpus after fuzzy dedup — the final step of the
    pipeline (pairs → clusters → keeper per cluster). Keeper = the
    component representative itself (min-label CC makes the component
    id the minimum doc_id in the cluster, so keeper selection is a
    groupBy, not another join); cluster_size = how many near-dups each
    keeper absorbed (1 = unique). At 100 TB this is the job that
    writes the training corpus: one aggregate over the CC output, then
    (in production) a semi-join of `documents` against these keeper
    ids."""
    cc = _minhash_components(spark, sf_dir)
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("cluster_size"))
        .select(F.col("component").alias("doc_id"), "cluster_size")
    )


@query(
    "dedup_pair_source_matrix",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
    ),
    cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    ),
    jpairs AS (
      SELECT i.id_a, i.id_b
      FROM inter i JOIN cnt ca ON i.id_a = ca.id JOIN cnt cb ON i.id_b = cb.id
      WHERE (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.8
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_pairs
    FROM jpairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    GROUP BY least(da.source, db.source), greatest(da.source, db.source)
    """,
)
def dedup_pair_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where does duplication come from: near-dup pairs rolled up to
    an unordered source×source matrix — diagonal entries are
    intra-source duplication (mirrors, re-crawls), off-diagonal are
    cross-source (syndication) — the report that decides which crawl
    slices to drop wholesale before paying for per-doc dedup.

    Pair ids join back to the (tiny) doc→source projection; sources
    are normalized least/greatest so each unordered pair counts once.
    Adds one broadcast-sized join per side on top of the standard
    pair pipeline."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup_pairs(docs, threshold=0.8)
    src = docs.select("doc_id", "source")
    sa = src.withColumnsRenamed({"doc_id": "id_a", "source": "src_a"})
    sb = src.withColumnsRenamed({"doc_id": "id_b", "source": "src_b"})
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "dedup_shingle_containment",
    oracle=r"""
    WITH g AS (SELECT doc_id AS id, lang, source, text FROM documents),
    toks AS (
      SELECT id, lang, source,
             list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS ts
      FROM g
    ),
    sh0 AS (
      SELECT id, lang, source, unnest(CASE WHEN len(ts) >= 3
        THEN list_transform(range(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
        ELSE CAST([] AS VARCHAR[]) END) AS shingle
      FROM toks
    ),
    sh AS (SELECT DISTINCT id, lang, source, shingle FROM sh0),
    cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.lang = b.lang AND a.source = b.source
        AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT i.id_a, i.id_b, i.n_inter,
           (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n) AS BIGINT)) // (2 * nullif(CAST((ca.n) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS contain_a,
           (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((cb.n) AS BIGINT)) // (2 * nullif(CAST((cb.n) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS contain_b
    FROM inter i JOIN cnt ca ON i.id_a = ca.id JOIN cnt cb ON i.id_b = cb.id
    WHERE greatest((CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n) AS BIGINT)) // (2 * nullif(CAST((ca.n) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)),
                   (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((cb.n) AS BIGINT)) // (2 * nullif(CAST((cb.n) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE))) >= 0.5
    """,
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: |S(A)∩S(B)| / |S(A)| on word
    3-gram shingles — catches a short document wholly quoted inside a
    longer one, which symmetric Jaccard misses (the union term drowns
    the overlap). Emits both directions; a pair survives if either
    containment ≥ 0.5.

    Same bounded-block scale shape as `dedup_ngram_jaccard`: the
    intersection comes from the shingle self-join WITHIN (lang,
    source) blocks — pairs sharing no shingle never materialize, the
    shuffle is partitioned by (shingle, lang, source), and per-doc
    shingle dedup is array_distinct before the explode."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        "lang",
        "source",
        F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0).alias("ts"),
    )
    sh = toks.select(
        "id", "lang", "source",
        F.explode(F.array_distinct(D.gram_windows(F.col("ts"), 3))).alias("shingle"),
    ).persist()  # feeds cnt + both sides of the intersection join
    cnt = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.hint("shuffle_hash").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    # Integer-exact half-up containments (round-5 tie-class sweep).
    ca = exact_ratio_spark("n_inter", "n_a")
    cb = exact_ratio_spark("n_inter", "n_b")
    return (
        inter.join(cnt.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(cnt.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .where(F.greatest(ca, cb) >= 0.5)
        .select("id_a", "id_b", "n_inter", ca.alias("contain_a"), cb.alias("contain_b"))
    )


@query(
    "dedup_incremental_new",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    cand AS (
      SELECT DISTINCT a.id AS new_id, b.id AS other_id
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.id <> b.id
      WHERE a.id % 5 = 0
    ),
    cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT c.new_id, c.other_id, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.id = c.new_id
      JOIN sh sb ON sb.id = c.other_id AND sb.shingle = sa.shingle
      GROUP BY c.new_id, c.other_id
    ),
    ver AS (
      SELECT i.new_id, i.other_id
      FROM inter i JOIN cnt ca ON i.new_id = ca.id
                   JOIN cnt cb ON i.other_id = cb.id
      WHERE (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.8
    ),
    agg AS (
      SELECT new_id,
             count(CASE WHEN other_id % 5 <> 0 THEN 1 END) AS n_index_dups,
             count(CASE WHEN other_id % 5 = 0 THEN 1 END) AS n_batch_dups,
             min(other_id) AS best_match_id,
             min(CASE WHEN other_id % 5 = 0 THEN other_id END) AS best_batch
      FROM ver GROUP BY new_id
    )
    SELECT d.doc_id,
           coalesce(a.n_index_dups, 0) AS n_index_dups,
           coalesce(a.n_batch_dups, 0) AS n_batch_dups,
           a.best_match_id,
           CASE WHEN coalesce(a.n_index_dups, 0) > 0 THEN 'dup_of_index'
                WHEN coalesce(a.n_batch_dups, 0) > 0 THEN 'dup_in_batch'
                ELSE 'unique' END AS verdict,
           (coalesce(a.n_index_dups, 0) = 0
            AND (coalesce(a.n_batch_dups, 0) = 0 OR d.doc_id < a.best_batch))
             AS keep
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.new_id
    WHERE d.doc_id % 5 = 0
    """,
)
def dedup_incremental_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: every 5th document plays the NEW
    batch arriving against the rest of the corpus as the stored
    index. Per new doc: near-dup counts against index vs batch, a
    deterministic keeper decision (min-id within batch groups), and
    the survive/drop verdict — the decision a production ingest job
    makes without ever re-deduping the full corpus. Probe join
    touches only band buckets containing a new doc; verify shingles
    only candidate docs."""
    return D.incremental_dedup_verdicts(table(spark, sf_dir, "documents"))


@query(
    "dedup_threshold_curve",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
    ),
    cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    ),
    jac AS (
      SELECT (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS j
      FROM inter i JOIN cnt ca ON i.id_a = ca.id JOIN cnt cb ON i.id_b = cb.id
      WHERE (CAST((2 * CAST((n_inter) AS BIGINT) * 1000000 + CAST((ca.n + cb.n - n_inter) AS BIGINT)) // (2 * nullif(CAST((ca.n + cb.n - n_inter) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) >= 0.7
    )
    SELECT count(*) AS n_pairs_070,
           CAST(sum(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pairs_080,
           CAST(sum(CASE WHEN j >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pairs_090,
           CAST(sum(CASE WHEN j >= round(1.0, 6) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pairs_exact,
           min(j) AS min_jaccard,
           (CAST((2 * CAST((sum(CAST(round(j * 1000000, 0) AS BIGINT))) AS BIGINT) * 1000000 + CAST((1000000 * count(*)) AS BIGINT)) // (2 * nullif(CAST((1000000 * count(*)) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS mean_jaccard
    FROM jac
    """,
)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold calibration for the fuzzy-dedup gate: ONE verify
    pass at the loosest threshold (0.7) yields the pair counts at
    0.7 / 0.8 / 0.9 / exact-1.0 plus the score distribution edges —
    the report an operator reads before picking the production
    cutoff, at the cost of a single run instead of four. The mean is
    computed from integer-scaled scores (sum of round(j*1e6) ints)
    so no float summation order reaches the hash compare."""
    pairs = D.minhash_lsh_dedup_pairs(
        table(spark, sf_dir, "documents"), threshold=0.7
    )
    j = F.col("jaccard")
    return pairs.agg(
        F.count("*").alias("n_pairs_070"),
        F.sum(F.when(j >= 0.8, 1).otherwise(0)).cast("long").alias("n_pairs_080"),
        F.sum(F.when(j >= 0.9, 1).otherwise(0)).cast("long").alias("n_pairs_090"),
        F.sum(F.when(j >= F.round(F.lit(1.0), 6), 1).otherwise(0))
        .cast("long")
        .alias("n_pairs_exact"),
        # j is already an exact k/1e6 value - min needs no re-round;
        # the mean divides the exact integer score sum via the
        # integer-exact half-up idiom (round-5 sweep). round(x, 0) to
        # an integer grid is tie-safe cross-engine (every half is
        # dyadic), unlike fractional-dp rounds.
        F.min(j).alias("min_jaccard"),
        exact_ratio_spark(
            "sum(CAST(round(jaccard * 1000000, 0) AS BIGINT))",
            "1000000 * count(1)",
        ).alias("mean_jaccard"),
    )


LSPLIT_SALT = "lsplit:"


def lsplit_is_holdout_sql(col: str) -> str:
    """Oracle-side leakage-safe split predicate: TRUE when the
    component hashes to the holdout side (~1/8). ONE definition so
    the split rule can never drift between corpus_leakage_safe_split
    and pipeline_training_export."""
    return (
        f"substr(md5('{LSPLIT_SALT}' || CAST({col} AS VARCHAR)), 1, 1)"
        " IN ('0', '1')"
    )


def lsplit_is_holdout(col: "F.Column") -> "F.Column":
    """Spark twin of lsplit_is_holdout_sql."""
    return F.substring(
        F.md5(F.concat(F.lit(LSPLIT_SALT), col.cast("string"))), 1, 1
    ).isin("0", "1")


@query(
    "corpus_leakage_safe_split",
    oracle=rf"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    {_CC_SQL},
    comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src)
    SELECT doc_id, component,
           CASE WHEN {lsplit_is_holdout_sql("component")} THEN 'holdout'
                ELSE 'train' END AS split
    FROM comp
    """,
)
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/holdout split: the split hash is keyed on
    the NEAR-DUP CLUSTER representative, not the document — so a
    near-duplicate pair can never straddle train and holdout. A plain
    per-doc hash split (corpus_split_assign) leaks: two near-copies
    land on opposite sides and the holdout scores memorization. This
    is the split assignment an LLM eval pipeline must use after fuzzy
    dedup clustering.

    Plan shape: the MinHash+LSH pair graph and min-label connected
    components are the existing bucketed dedup path (never all-pairs,
    lineage-truncated CC loop); the split itself is a map-side hash
    of the component id — singleton docs hash their own id, cluster
    members inherit their representative's draw."""
    cc = _minhash_components(spark, sf_dir)
    return cc.select(
        F.col("id").alias("doc_id"),
        "component",
        F.when(lsplit_is_holdout(F.col("component")), "holdout")
        .otherwise("train")
        .alias("split"),
    )


@query(
    "dedup_edit_distance",
    oracle=rf"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL},
    {_BANDS_SQL},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
    ),
    ascii_p AS (
      SELECT doc_id,
             substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 64) AS p
      FROM documents
    )
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(da.p, db.p) AS BIGINT) AS prefix_dist,
           (CAST((2 * CAST((64 - levenshtein(da.p, db.p)) AS BIGINT) * 1000000 + CAST((64) AS BIGINT)) // (2 * nullif(CAST((64) AS BIGINT), 0)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS prefix_sim
    FROM cand c
    JOIN ascii_p da ON da.doc_id = c.id_a
    JOIN ascii_p db ON db.doc_id = c.id_b
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification — the dedup modality Jaccard and
    MinHash both miss: small in-place edits (timestamps, counters,
    injected bylines) keep Levenshtein low while reordering-based
    measures stay blind. Candidates come from the same LSH banding as
    the MinHash path (never all-pairs); each pair pays one
    dynamic-programming distance over the 64-char prefixes — the
    standard cost bound, since full-text Levenshtein is quadratic in
    document length and prefix agreement is the signal a near-dup
    audit ranks by.

    Scale shape: candidate generation is the bucketed band equi-join;
    the text join-back prunes to candidate ids only (two broadcast-
    sized id joins at bench scale, co-partitioned joins at 100 TB);
    distance cost is candidates x 64^2 — tracks the near-dup rate,
    not the corpus.

    Prefixes are ASCII-normalized (non-printable-ASCII stripped)
    before the distance: DuckDB's levenshtein counts BYTES while
    Spark's counts characters, so multi-byte text would diverge —
    on ASCII the two definitions coincide exactly."""
    docs = table(spark, sf_dir, "documents")
    cand = D.lsh_candidate_pairs(
        D.lsh_bands_df(D.minhash_signature_df(D.shingle_pairs_df(docs)))
    )
    prefix = docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace("text", "[^ -~]", ""), 1, 64
        ).alias("p"),
    )
    pa = prefix.withColumnsRenamed({"doc_id": "id_a", "p": "p_a"})
    pb = prefix.withColumnsRenamed({"doc_id": "id_b", "p": "p_b"})
    dist = F.levenshtein("p_a", "p_b")
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a",
            "id_b",
            dist.cast("long").alias("prefix_dist"),
            # Integer-exact half-up (r5 sweep): 1 - d/64 as (64-d)/64.
            exact_ratio_spark(
                "64 - levenshtein(p_a, p_b)", "64"
            ).alias("prefix_sim"),
        )
    )
