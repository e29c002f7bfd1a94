"""Training-blend assembly ops over ``documents``: the steps between
a cleaned corpus and actual training batches — sequence packing,
temperature-weighted source sampling, and repeated-passage detection.

These are the ops a pre-training data pipeline runs AFTER dedup /
quality filtering (queries/dedup.py, queries/pipeline.py) to turn the
surviving documents into a token-budgeted, source-balanced stream.

Scale notes (100 TB posture):
- packing is per-shard: contiguous token packing is inherently
  sequential WITHIN a stream, so the corpus is sharded first
  (hash of doc_id) and each shard packs independently — the window
  partitions by shard, so parallelism = shard count, exactly how
  production packers write one tokenized shard per worker;
- temperature sampling is a two-pass plan: a per-source count
  aggregate (tiny — one row per source) broadcast back against the
  corpus, then a deterministic per-doc hash threshold — no shuffle
  of the documents themselves at all;
- passage fingerprinting explodes to non-overlapping fixed-size
  blocks (corpus tokens / BLOCK rows — linear, not quadratic) and
  aggregates by block hash, the same bounded explode-aggregate shape
  as the shingle pipelines in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import table
from ._util import (
    det_round_col,
    det_round_sql,
    exact_ratio_wide_spark,
    exact_ratio_wide_sql,
)
from .registry import query

# Tokens per packed training sequence (a toy stand-in for 2048/4096;
# the math is budget-independent) and shard fan-out for parallel
# packing. At corpus scale, raise PACK_SHARDS to the writer count.
PACK_BUDGET = 256
PACK_SHARDS = 8

TOKEN_RE = r"[\p{L}]+"


def _tokens() -> F.Column:
    return F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)


def pack_sequences_frame(d: "DataFrame") -> "DataFrame":
    """Shared packing rule (Spark side): given (doc_id, n_tokens
    [, extra cols]), shard by doc_id, lay documents end to end in
    doc_id order per shard, and cut every PACK_BUDGET tokens. ONE
    definition for corpus_pack_sequences and pipeline_training_export
    so the boundary rule can never drift between them."""
    t = d.withColumn("shard", F.col("doc_id") % PACK_SHARDS).where(
        F.col("n_tokens") > 0
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    seq_first = F.floor((F.col("cum") - F.col("n_tokens")) / PACK_BUDGET)
    seq_last = F.floor((F.col("cum") - 1) / PACK_BUDGET)
    return (
        c.withColumn("seq_first", seq_first.cast("long"))
        .withColumn("seq_last", seq_last.cast("long"))
        .drop("cum")
    )


def pack_sql(src_cte: str, extra_cols: str = "") -> str:
    """Shared packing rule (oracle side): the cumsum CTE + seq math
    over a (doc_id, shard, n_tokens [, extras]) CTE named `src_cte`.
    `extra_cols` is a leading-comma column list carried through."""
    return f"""
    packc AS (
      SELECT doc_id, shard, n_tokens{extra_cols},
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM {src_cte} WHERE n_tokens > 0
    ),
    packed AS (
      SELECT doc_id, shard, n_tokens{extra_cols},
             CAST(floor((cum - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS seq_first,
             CAST(floor((cum - 1) / {PACK_BUDGET}.0) AS BIGINT) AS seq_last
      FROM packc
    )"""


@query(
    "corpus_pack_sequences",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
             CAST(len(regexp_extract_all(text, '[\p{{L}}]+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    {pack_sql("t")}
    SELECT doc_id, shard, n_tokens, seq_first, seq_last,
           CAST(seq_last - seq_first + 1 AS BIGINT) AS n_seqs
    FROM packed
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: lay each shard's documents end to
    end in doc_id order and cut the token stream every PACK_BUDGET
    tokens — each document lands in sequences [seq_first, seq_last]
    (n_seqs > 1 means it straddles a boundary and is split across
    training sequences, the standard packing tradeoff).

    The running token offset is a per-shard window cumulative sum —
    integer-exact, and parallel across shards (contiguity is only
    promised within a shard, which is what real packers deliver:
    one output shard per writer)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    packed = pack_sequences_frame(d)
    return packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        "seq_first",
        "seq_last",
        (F.col("seq_last") - F.col("seq_first") + 1).cast("long").alias("n_seqs"),
    )


# Temperature exponent for source rebalancing: keep probability
# (n_min / n_source)^(1 - ALPHA) — the smallest source is kept whole,
# larger sources are downsampled toward a flatter mix (ALPHA=1 keeps
# the natural distribution; ALPHA=0 targets uniform).
SAMPLE_ALPHA = 0.5


@query(
    "corpus_sample_temperature",
    oracle=rf"""
    WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    p AS (
      SELECT source, n_docs,
             sqrt(CAST(min(n_docs) OVER () AS DOUBLE) / n_docs) AS target_rate
      FROM s
    ),
    kept AS (
      SELECT d.source,
             CASE WHEN CAST(('0x' || substr(md5('sample:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                           AS UBIGINT) / 4294967296.0 < p.target_rate
                  THEN 1 ELSE 0 END AS keep
      FROM documents d JOIN p USING (source)
    )
    SELECT p.source, p.n_docs, {det_round_sql('p.target_rate')} AS target_rate,
           CAST(sum(k.keep) AS BIGINT) AS n_kept
    FROM kept k JOIN p USING (source)
    GROUP BY p.source, p.n_docs, p.target_rate
    """,
)
def corpus_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source sampling: per-source keep rate
    (n_min/n_source)^(1-ALPHA), decided per document by a
    deterministic md5 threshold — reproducible sampling with no RNG
    state, the way production blends pin a sampling seed.

    Plan shape: per-source counts are one tiny aggregate (a row per
    source) joined back broadcast; the keep decision is a per-row
    expression. Nothing shuffles the corpus."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    s = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    p = s.select(
        "source",
        "n_docs",
        # sqrt, not pow(x, 1-ALPHA): with ALPHA=0.5 they are the same
        # function, but IEEE requires sqrt to be correctly rounded while
        # pow may differ in the last ulp BETWEEN ENGINES — and the
        # per-doc keep decision compares u < target_rate exactly.
        F.sqrt(
            F.min("n_docs").over(Window.partitionBy()).cast("double")
            / F.col("n_docs")
        ).alias("target_rate"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    kept = d.join(F.broadcast(p), "source").select(
        "source", "n_docs", "target_rate", (u < F.col("target_rate")).cast("int").alias("keep")
    )
    # det_round of the sqrt rate (irrational; native round(double, 6)
    # is tie-divergent cross-engine - round-5 sweep).
    return kept.groupBy(
        "source", "n_docs", det_round_col(F.col("target_rate")).alias("target_rate")
    ).agg(F.sum("keep").cast("long").alias("n_kept"))


# Non-overlapping passage block size (tokens). Exact block-hash
# matches across documents flag copied passages — the substring-level
# duplication that document-level dedup (exact or MinHash) misses.
PASSAGE_BLOCK = 16


@query(
    "dedup_passage_blocks",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[\p{{L}}]+') AS ts
      FROM documents
    ),
    blocks AS (
      SELECT doc_id,
             unnest(list_transform(range(0, CAST(floor(len(ts) / {PASSAGE_BLOCK}.0) AS BIGINT)),
               i -> md5(array_to_string(
                      ts[i * {PASSAGE_BLOCK} + 1 : i * {PASSAGE_BLOCK} + {PASSAGE_BLOCK}],
                      ' ')))) AS block_hash
      FROM toks
    ),
    db AS (SELECT DISTINCT doc_id, block_hash FROM blocks),
    bdf AS (SELECT block_hash, count(*) AS df FROM db GROUP BY block_hash)
    SELECT db.doc_id,
           count(*) AS n_blocks,
           CAST(sum(CASE WHEN bdf.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_blocks
    FROM db JOIN bdf USING (block_hash)
    GROUP BY db.doc_id
    """,
)
def dedup_passage_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-passage detection: hash non-overlapping
    PASSAGE_BLOCK-token blocks and count, per document, how many of
    its distinct blocks also occur in another document — the signal
    for stripping boilerplate passages that survive document-level
    dedup because the surrounding text differs.

    Linear explode (corpus_tokens / BLOCK rows), block-hash-keyed
    aggregate, one equi-join back — the bounded shingle shape, never
    doc x doc."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", _tokens().alias("ts")
    )
    n_blocks = F.floor(F.size("ts") / PASSAGE_BLOCK).cast("int")
    block_hashes = F.when(
        n_blocks >= 1,
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.md5(
                F.concat_ws(" ", F.slice("ts", i * PASSAGE_BLOCK + 1, PASSAGE_BLOCK))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    db = (
        toks.select("doc_id", F.explode(block_hashes).alias("block_hash"))
        .distinct()
    )
    bdf = db.groupBy("block_hash").agg(F.count("*").alias("df"))
    return (
        db.join(bdf, "block_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum((F.col("df") >= 2).cast("int")).cast("long").alias("n_shared_blocks"),
        )
    )


# Overlapping chunking for embedding/retrieval prep: windows of
# CHUNK_TOKENS tokens advancing by CHUNK_STRIDE (< CHUNK_TOKENS →
# consecutive chunks overlap, preserving context across boundaries).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


@query(
    "corpus_chunk_windows",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[\p{{L}}]+') AS ts
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, len(ts) AS doc_tokens,
             unnest(list_transform(
               range(0, CAST(ceil(greatest(CAST(len(ts) - {CHUNK_TOKENS} AS BIGINT), 0)
                                  / {CHUNK_STRIDE}.0) AS BIGINT) + 1),
               i -> struct_pack(
                 chunk_idx := i,
                 start_tok := i * {CHUNK_STRIDE},
                 n_tokens := least(len(ts) - i * {CHUNK_STRIDE}, {CHUNK_TOKENS}),
                 chunk_hash := md5(array_to_string(
                   ts[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}],
                   ' '))))) AS c
      FROM toks WHERE len(ts) > 0
    )
    SELECT doc_id, doc_tokens,
           CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
           CAST(c.start_tok AS BIGINT) AS start_tok,
           CAST(c.n_tokens AS BIGINT) AS n_tokens,
           c.chunk_hash
    FROM chunks
    """,
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (the embedding/retrieval prep
    op): every document yields ceil(max(len-CHUNK,0)/STRIDE)+1 windows
    of up to CHUNK_TOKENS tokens starting every CHUNK_STRIDE —
    adjacent chunks share CHUNK_TOKENS - CHUNK_STRIDE tokens of
    context, and the last window always reaches the document's final
    token (ceil, not floor: a floor here silently drops the tail). The
    result carries offsets + an md5 of the chunk text (not the text
    itself — at corpus scale the chunk table is written columnar and
    the text rematerializes by offset on demand).

    Pure per-row explode (linear in corpus tokens / STRIDE); no
    shuffle at all — chunking fuses into the scan stage."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", _tokens().alias("ts")
    ).where(F.size("ts") > 0)
    n_chunks = (
        F.ceil(F.greatest(F.size("ts") - CHUNK_TOKENS, F.lit(0)) / CHUNK_STRIDE) + 1
    ).cast("int")
    chunk = lambda i: F.struct(  # noqa: E731
        i.cast("long").alias("chunk_idx"),
        (i * CHUNK_STRIDE).cast("long").alias("start_tok"),
        F.least(F.size("ts") - i * CHUNK_STRIDE, F.lit(CHUNK_TOKENS))
        .cast("long")
        .alias("n_tokens"),
        F.md5(
            F.concat_ws(" ", F.slice("ts", i * CHUNK_STRIDE + 1, CHUNK_TOKENS))
        ).alias("chunk_hash"),
    )
    return toks.select(
        "doc_id",
        F.size("ts").cast("long").alias("doc_tokens"),
        F.explode(
            F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk)
        ).alias("c"),
    ).select("doc_id", "doc_tokens", "c.chunk_idx", "c.start_tok", "c.n_tokens", "c.chunk_hash")


# Per-stratum sample size for eval-set construction.
STRAT_K = 3


@query(
    "corpus_stratified_sample",
    oracle=rf"""
    SELECT source, lang, doc_id, rk FROM (
      SELECT source, lang, doc_id,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {STRAT_K}
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: up to STRAT_K docs per
    (source, lang) stratum, chosen by md5 hash order — a seeded
    uniform draw with no RNG state, the way eval/holdout slices are
    cut so every stratum is represented regardless of its size.

    One window per stratum over hash order; at scale this is a
    shuffle by (source, lang) followed by a per-partition top-k heap
    (WindowGroupLimit pushes rk <= K before the sort materializes) —
    never a global sort."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    return (
        d.select("source", "lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= STRAT_K)
    )


# Token budget for the mixture plan (a stand-in for e.g. 10T tokens).
MIX_BUDGET_TOKENS = 1_000_000


@query(
    "corpus_mixture_plan",
    oracle=rf"""
    WITH s AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(regexp_extract_all(text, '[\p{{L}}]+'))) AS BIGINT)
               AS total_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT *,
             CAST({det_round_sql('sqrt(CAST(total_tokens AS DOUBLE))')} AS DECIMAL(28,6)) AS wgt
      FROM s
    ),
    t AS (
      SELECT *, CAST(wgt AS DOUBLE)
                  / nullif(CAST(sum(wgt) OVER () AS DOUBLE), 0)
                  AS target_share,
             sum(total_tokens) OVER () AS tt
      FROM w
    )
    SELECT source, n_docs, total_tokens,
           {exact_ratio_wide_sql('total_tokens', 'tt')} AS natural_share,
           {det_round_sql('target_share')} AS target_share,
           {det_round_sql(f'target_share * {MIX_BUDGET_TOKENS} / nullif(total_tokens, 0)')} AS epochs
    FROM t
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture table a training run is configured from: per
    source, its natural token share, its temperature-adjusted target
    share (∝ tokens^ALPHA — flattens the head, boosts the tail), and
    the implied epoch count over that source at MIX_BUDGET_TOKENS
    (epochs > 1 ⇒ the source repeats; the standard small-source
    upsampling signal).

    One corpus aggregate (per-source token sums); every window below
    it runs over the tiny per-source table. The corpus shuffles
    once, by source."""
    d = table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens())).cast("long").alias("total_tokens"),
    )
    wall = Window.partitionBy()
    # weights are sqrt (IEEE-exact cross-engine, = tokens^ALPHA for
    # ALPHA=0.5) rounded to 6dp and summed as EXACT decimals — a raw
    # double window-sum would make target_share depend on row order
    # det_round everywhere a sqrt-derived double is finished, and the
    # integer-exact idiom for the pure-integer natural share (r5 sweep).
    wgt = det_round_col(F.sqrt(F.col("total_tokens").cast("double"))).cast(
        "decimal(28,6)"
    )
    # nullif on BOTH divisors (round-6 fuzz finding): an all-empty
    # corpus zeroes sum(wgt) and an empty SOURCE zeroes total_tokens —
    # under ANSI the bare division THROWS, so one all-empty ingest
    # shard would kill the whole job; shares/epochs of nothing are
    # NULL on both engines (the oracle spells nullif too rather than
    # leaning on DuckDB's version-dependent 0-division).
    target = wgt.cast("double") / F.nullif(
        F.sum(wgt).over(wall).cast("double"), F.lit(0.0)
    )
    return s.withColumn(
        "tt", F.sum("total_tokens").over(wall)
    ).select(
        "source",
        "n_docs",
        "total_tokens",
        # Wide: corpus token sums x 10^6 pass int64 near ~4.6e12
        # tokens — inside the 100 TB target (advisor r05 class).
        exact_ratio_wide_spark("total_tokens", "tt").alias("natural_share"),
        det_round_col(target).alias("target_share"),
        det_round_col(
            target * MIX_BUDGET_TOKENS
            / F.nullif(F.col("total_tokens").cast("double"), F.lit(0.0))
        ).alias("epochs"),
    )
