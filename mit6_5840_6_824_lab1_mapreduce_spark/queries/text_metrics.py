"""Text-analysis operators for training-data pipelines: token
statistics, quality scoring, language ID, document fingerprinting.
All pure JVM expressions (regexp + higher-order functions); ratios are
int-derived doubles rounded to 6dp for cross-engine stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..plans import table
from ._util import (
    exact_ratio_spark,
    exact_ratio_sql,
    exact_ratio_wide_spark,
    exact_ratio_wide_sql,
)
from .registry import query

_STOP = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "se", "no", "por"),
    "fr": ("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "les"),
}


def _inlist(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


@query(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           length(text) AS n_chars,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[\p{L}]+')) AS BIGINT) AS word_tokens,
           CAST(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]')) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace runs, letter runs, and a
    BPE-ish pre-tokenizer regex (letters | digits | single symbol) —
    the standard cheap proxy for LLM token budgeting."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0)).cast("long").alias("word_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"), 0)
        ).cast("long").alias("bpe_ish_tokens"),
    )


# quality_score = 0.4*least(w,100)/100 + 0.3*(1 - p/c) + 0.3*(st/w) as ONE
# exact rational over the common denominator 1000*c*w (round-5 sweep):
# num = 4*L*c*w + 300*c*w - 300*p*w + 300*st*c  (>= 0 since p <= c).
# int64 headroom: docs up to ~10^5 chars keep 2*num*10^6 < 2^63.
_QSCORE_NUM = (
    "4 * least(n_words, 100) * n_chars * n_words"
    " + 300 * n_chars * n_words - 300 * punct_chars * n_words"
    " + 300 * n_stop * n_chars"
)
_QSCORE_DEN = "1000 * n_chars * n_words"


@query(
    "text_quality_score",
    oracle=rf"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[\p{{L}}]', '', 'g')) AS alpha_chars,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_chars,
             length(text) - length(regexp_replace(text, '[^\p{{L}}\p{{N}} \t\n]', '', 'g')) AS punct_chars,
             CAST(len(regexp_extract_all(text, '[\p{{L}}]+')) AS BIGINT) AS n_words,
             CAST(len(list_filter(regexp_extract_all(text, '[\p{{L}}]+'),
                                  t -> t IN ({_inlist(_STOP["en"])}))) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_words,
           {exact_ratio_sql('punct_chars', 'n_chars')} AS punct_ratio,
           {exact_ratio_sql('digit_chars', 'n_chars')} AS digit_ratio,
           {exact_ratio_sql('n_stop', 'n_words')} AS stop_ratio,
           {exact_ratio_sql('alpha_chars', 'n_words')} AS mean_word_len,
           {exact_ratio_sql(_QSCORE_NUM, _QSCORE_DEN)} AS quality_score
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality scoring: length, punctuation/digit
    density, stopword ratio, mean word length — the usual pre-training
    filter features, all from regexp counts (no UDFs)."""
    return quality_frame(table(spark, sf_dir, "documents"))


def quality_frame(d: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Quality metrics as a frame transform — stateless projections,
    so it applies unchanged to a streaming DataFrame (the pipeline's
    quality stage is streaming-safe by construction). ``keep`` names
    extra input columns to carry through unchanged, letting callers
    CHAIN stateless frames over one corpus scan instead of joining
    per-frame outputs (the round-5 pipeline fusion)."""
    strip = lambda pat: F.length("text") - F.length(  # noqa: E731
        F.regexp_replace("text", pat, "")
    )
    words = F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0)
    m = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        strip(r"[\p{L}]").alias("alpha_chars"),
        strip(r"[0-9]").alias("digit_chars"),
        strip(r"[^\p{L}\p{N} \t\n]").alias("punct_chars"),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(words, lambda t: t.isin(*_STOP["en"]))).cast("long").alias("n_stop"),
        *[F.col(k) for k in keep if k not in ("doc_id", "n_chars")],
    )
    # Integer-exact half-up ratios (round-5 tie-class sweep): native
    # round(double, 6) diverges cross-engine on decimal-tie quotients.
    return m.select(
        "doc_id",
        "n_chars",
        "n_words",
        exact_ratio_spark("punct_chars", "n_chars").alias("punct_ratio"),
        exact_ratio_spark("digit_chars", "n_chars").alias("digit_ratio"),
        exact_ratio_spark("n_stop", "n_words").alias("stop_ratio"),
        exact_ratio_spark("alpha_chars", "n_words").alias("mean_word_len"),
        exact_ratio_spark(_QSCORE_NUM, _QSCORE_DEN).alias("quality_score"),
        *[F.col(k) for k in keep if k not in ("doc_id", "n_chars")],
    )


@query(
    "text_language_id",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, lang, regexp_extract_all(text, '[\p{{L}}]+') AS ws
      FROM documents
    ),
    sc AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(ws, t -> t IN ({_inlist(_STOP["en"])}))) AS BIGINT) AS s_en,
             CAST(len(list_filter(ws, t -> t IN ({_inlist(_STOP["de"])}))) AS BIGINT) AS s_de,
             CAST(len(list_filter(ws, t -> t IN ({_inlist(_STOP["es"])}))) AS BIGINT) AS s_es,
             CAST(len(list_filter(ws, t -> t IN ({_inlist(_STOP["fr"])}))) AS BIGINT) AS s_fr
      FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
                WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
                WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS pred_lang,
           lang AS true_lang
    FROM sc
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID (n-gram-free heuristic; fixed
    priority tie-break). On this synthetic corpus the text carries no
    real language signal — the operator is graded on determinism, and
    pred vs true_lang is exposed for accuracy measurement."""
    return language_frame(table(spark, sf_dir, "documents"))


def language_frame(d: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Language ID as a frame transform — stateless, streaming-safe
    (see quality_frame; ``keep`` carries extra columns through for
    one-scan chaining)."""
    words = F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0)
    score = lambda lang: F.size(  # noqa: E731
        F.filter(words, lambda t: t.isin(*_STOP[lang]))
    ).cast("long")
    sc = d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        score("en").alias("s_en"),
        score("de").alias("s_de"),
        score("es").alias("s_es"),
        score("fr").alias("s_fr"),
        *[F.col(k) for k in keep if k != "doc_id"],
    )
    return sc.select(
        "doc_id",
        F.when(F.greatest("s_en", "s_de", "s_es", "s_fr") == 0, "unknown")
        .when(F.col("s_en") >= F.greatest("s_de", "s_es", "s_fr"), "en")
        .when(F.col("s_de") >= F.greatest("s_es", "s_fr"), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
        .alias("pred_lang"),
        "true_lang",
        *[F.col(k) for k in keep if k != "doc_id"],
    )


@query(
    "text_fingerprint",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS id, text,
             list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS ts
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT id, md5(unnest(CASE WHEN len(ts) >= 3
        THEN list_transform(range(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
        ELSE CAST([] AS VARCHAR[]) END)) AS h
      FROM toks
    ),
    ranked AS (
      SELECT id, h, row_number() OVER (PARTITION BY id ORDER BY h) AS rn FROM sh
    ),
    sk AS (
      SELECT id, string_agg(h, ':' ORDER BY h) AS sketch
      FROM ranked WHERE rn <= 4 GROUP BY id
    ),
    roll AS (
      SELECT doc_id AS id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(text) + 1),
                                i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 1000000007
             ) AS roll_hash
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT d.doc_id, md5(d.text) AS content_hash,
           coalesce(sk.sketch, '') AS sketch,
           r.roll_hash
    FROM documents d
    LEFT JOIN sk ON d.doc_id = sk.id
    LEFT JOIN roll r ON d.doc_id = r.id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content digest, bottom-4 MinHash
    sketch of shingle digests, and a 31-base polynomial rolling hash
    over code points (mod 1e9+7) — all engine-portable.

    NULL-text contract (r08, class a): a NULL document has NO
    fingerprint — content_hash and roll_hash are NULL on both engines
    (the oracle LEFT-joins a roll CTE filtered to text IS NOT NULL;
    Spark's sequence(1, length(NULL)) is NULL already). An EMPTY
    string still fingerprints: roll_hash 0, md5('') — absent and
    empty are different facts at ingest."""
    from ..operators.dedup import shingle_pairs_df

    d = table(spark, sf_dir, "documents")
    sk = (
        shingle_pairs_df(d)
        .select("id", F.md5("shingle").alias("h"))
        .distinct()
        .groupBy("id")
        .agg(F.array_join(F.slice(F.array_sort(F.collect_list("h")), 1, 4), ":").alias("sketch"))
    )
    roll = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length("text")),
            lambda i: F.ascii(F.col("text").substr(i, F.lit(1))).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % 1000000007,
    )
    # Project BOTH text-derived fingerprints below the sketch join:
    # computed after the join they pull the full text column through
    # the join's shuffle whenever the sketch side can't broadcast
    # (it can't at corpus scale — one row per doc). Shuffling the
    # 32-char digest + one long instead is ~50 B/row (round-6
    # exchange-width audit, the one flagged plan in the registry).
    base = d.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        roll.alias("roll_hash"),
    )
    return (
        base.join(sk, base.doc_id == sk.id, "left")
        .select(
            "doc_id",
            "content_hash",
            F.coalesce("sketch", F.lit("")).alias("sketch"),
            "roll_hash",
        )
    )


@query(
    "text_tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[\p{L}]+')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.token ASC)
               AS rn
      FROM tf JOIN df USING (token)
    )
    SELECT doc_id, token, tf, df,
           round(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
    FROM ranked, n
    WHERE rn <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf,
    ln((N+1)/(df+1))+1, sklearn-style). Ranking is on the integer
    triple (tf desc, df asc, token) — never on the float score — so
    the cut is engine-exact; tfidf is emitted rounded. Plan: explode →
    two hash aggregations (doc,token) then (token) → token-keyed join
    → per-doc window. At 100 TB the df table is the only global
    structure and it's orders of magnitude smaller than the corpus;
    N comes from a broadcast 1-row aggregate, not a driver collect."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[\p{L}]+"), 0)
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tf.join(dfreq, "token")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )


@query(
    "text_repetition_stats",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(text, '[\p{L}]+') AS ws FROM documents
    ),
    ex AS (SELECT doc_id, unnest(ws) AS word FROM w),
    wc AS (SELECT doc_id, word, count(*) AS cnt FROM ex GROUP BY doc_id, word),
    agg AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
             count(*) AS n_distinct_words,
             CAST(max(cnt) AS BIGINT) AS top_cnt
      FROM wc GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 2
               THEN list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i+1])
               ELSE CAST([] AS VARCHAR[]) END AS bgs
      FROM w
    )
    SELECT a.doc_id, a.n_words, a.n_distinct_words,
           {dwr} AS dup_word_ratio,
           {tws} AS top_word_share,
           CASE WHEN len(b.bgs) >= 1
                THEN {dbr}
                ELSE NULL END AS dup_bigram_ratio
    FROM agg a JOIN bg b USING (doc_id)
    """.replace(
        "{dwr}", exact_ratio_sql("a.n_words - a.n_distinct_words", "a.n_words")
    ).replace(
        "{tws}", exact_ratio_sql("a.top_cnt", "a.n_words")
    ).replace(
        "{dbr}",
        exact_ratio_sql("len(b.bgs) - len(list_distinct(b.bgs))", "len(b.bgs)"),
    ),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    ratio, most-common-word share, duplicate-bigram ratio — the
    filters that catch boilerplate/spam that plain length or
    punctuation heuristics miss. Word counts go through one explode +
    groupBy(doc_id, word) (shuffle keyed by doc — even at corpus
    scale each group is one document's vocabulary); bigram dedup is a
    narrow in-row array op."""
    d = table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0).alias("ws")
    )
    wc = (
        w.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    agg = wc.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.count("*").alias("n_distinct_words"),
        F.max("cnt").cast("long").alias("top_cnt"),
    )
    bg = w.select("doc_id", D.gram_windows(F.col("ws"), 2).alias("bgs"))
    return (
        agg.join(bg, "doc_id")
        .select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            # Integer-exact half-up (round-5 sweep): 1 - d/n restated
            # as (n - d)/n so the rational stays integer/integer.
            exact_ratio_spark(
                "n_words - n_distinct_words", "n_words"
            ).alias("dup_word_ratio"),
            exact_ratio_spark("top_cnt", "n_words").alias("top_word_share"),
            F.when(
                F.size("bgs") >= 1,
                exact_ratio_spark(
                    "size(bgs) - size(array_distinct(bgs))", "size(bgs)"
                ),
            ).alias("dup_bigram_ratio"),
        )
    )


@query(
    "corpus_source_mix",
    oracle=r"""
    WITH t AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(regexp_extract_all(text, '[\p{L}]+'))) AS BIGINT)
               AS total_words
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, total_words,
           {ws} AS word_share
    FROM (SELECT source, n_docs, total_words,
                 sum(total_words) OVER () AS tw FROM t)
    """.replace("{ws}", exact_ratio_wide_sql("total_words", "tw")),
)
def corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture table: per-source document and word-token
    totals plus each source's share of the corpus — the input to
    mixture-weight sampling when assembling a training blend. Exact
    integer totals; the share divides two exact ints (window total
    over the tiny per-source aggregate, not the corpus)."""
    d = table(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0)))
        .cast("long")
        .alias("total_words"),
    )
    return t.withColumn(
        "tw", F.sum("total_words").over(Window.partitionBy())
    ).select(
        "source",
        "n_docs",
        "total_words",
        # Integer-exact half-up share (round-5 tie-class sweep); wide:
        # corpus word sums x 10^6 pass int64 near ~4.6e12 tokens,
        # inside the 100 TB target (advisor r05 class).
        exact_ratio_wide_spark("total_words", "tw").alias("word_share"),
    )


@query(
    "corpus_split_assign",
    oracle=r"""
    WITH s AS (
      SELECT doc_id, source,
             CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                       IN ('0','1') THEN 'holdout'
                  ELSE 'train' END AS split,
             CAST(len(regexp_extract_all(text, '[\p{L}]+')) AS BIGINT) AS n_words
      FROM documents
    )
    SELECT split, source, count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words
    FROM s GROUP BY split, source
    """,
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/holdout split (~1/8 holdout: salted
    md5(doc_id) leading hex in {0,1}) with per-(split, source) yield.
    Hash-based assignment — not rand() — is the reproducibility
    contract a training pipeline needs: the same document lands in
    the same split on any engine, run, partitioning, or day; the salt
    makes independent splits (different salts) uncorrelated. The
    assignment is embarrassingly parallel; only the tiny audit
    aggregate shuffles."""
    d = table(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        "source",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")).cast("binary")),
                1,
                1,
            ).isin("0", "1"),
            "holdout",
        )
        .otherwise("train")
        .alias("split"),
        F.size(F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0))
        .cast("long")
        .alias("n_words"),
    )
    return s.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
    )


# Grams appearing in at least this many distinct documents count as
# boilerplate (template/menu/footer text) rather than content. Tuned
# to the testdata's df distribution; on a real corpus this is the
# RefinedWeb-style "shared across many pages" cutoff.
BOILERPLATE_MIN_DF = 5


@query(
    "text_boilerplate_fraction",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(regexp_split_to_array(text, '[^\p{{L}}]+'), t -> t <> '') AS ts
      FROM documents
    ),
    sh0 AS (
      SELECT id, unnest(CASE WHEN len(ts) >= 3
        THEN list_transform(range(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
        ELSE CAST([] AS VARCHAR[]) END) AS shingle
      FROM toks
    ),
    sh AS (SELECT DISTINCT id, shingle FROM sh0),
    gdf AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    marked AS (
      SELECT sh.id, CASE WHEN gdf.df >= {BOILERPLATE_MIN_DF} THEN 1 ELSE 0 END AS common
      FROM sh JOIN gdf USING (shingle)
    )
    SELECT id AS doc_id,
           count(*) AS n_grams,
           CAST(sum(common) AS BIGINT) AS n_common_grams,
           {exact_ratio_sql('sum(common)', 'count(*)')}
             AS boilerplate_fraction
    FROM marked GROUP BY id
    """,
)
def text_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate share: the fraction of a document's
    distinct word-3-grams that recur in >= BOILERPLATE_MIN_DF other
    documents — the signal that separates template/chrome text from
    content (high fraction → drop or down-weight in a training blend).

    Scale shape: one shingle explode (persisted for its two consumers),
    a gram-keyed df aggregate, one equi-join back on the gram, and a
    per-doc rollup — every shuffle is keyed by gram or doc, never a
    doc×doc product. The df table is the same first-pass aggregate the
    decontamination pipeline uses."""
    from ..operators import dedup as D

    docs = table(spark, sf_dir, "documents")
    sh = D.shingle_pairs_df(docs).persist()
    gdf = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    marked = sh.join(gdf, "shingle").select(
        "id", (F.col("df") >= BOILERPLATE_MIN_DF).cast("int").alias("common")
    )
    return marked.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").alias("n_grams"),
        F.sum("common").cast("long").alias("n_common_grams"),
        # Integer-exact half-up ratio (round-5 tie-class sweep).
        exact_ratio_spark("sum(common)", "count(1)").alias(
            "boilerplate_fraction"
        ),
    )


@query(
    "ngram_topk_per_source",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS id, source,
             list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS ts
      FROM documents
    ),
    sh0 AS (
      SELECT id, source, unnest(CASE WHEN len(ts) >= 3
        THEN list_transform(range(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
        ELSE CAST([] AS VARCHAR[]) END) AS shingle
      FROM toks
    ),
    sh AS (SELECT DISTINCT id, source, shingle FROM sh0),
    cnt AS (
      SELECT source, shingle, count(*) AS df
      FROM sh GROUP BY source, shingle
    ),
    ranked AS (
      SELECT source, shingle, df,
             row_number() OVER (PARTITION BY source
                                ORDER BY df DESC, shingle ASC) AS rk
      FROM cnt
    )
    SELECT source, shingle, df, rk FROM ranked WHERE rk <= 5
    """,
)
def ngram_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word-3-grams per source by document frequency — the
    per-domain boilerplate fingerprint (what phrase does this crawl
    slice repeat?). Grouped top-k via row_number window over the
    (source, gram) aggregate: the window partitions by source AFTER
    the counts collapse, so the sort is over the per-source gram
    vocabulary, never the exploded corpus. Ties break on the gram
    string for cross-engine determinism."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        "source",
        F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0).alias("ts"),
    )
    sh = toks.select(
        "id",
        "source",
        F.explode(F.array_distinct(D.gram_windows(F.col("ts"), 3))).alias("shingle"),
    )
    cnt = sh.groupBy("source", "shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("source").orderBy(F.desc("df"), F.asc("shingle"))
    return cnt.select(
        "source", "shingle", "df", F.row_number().over(w).alias("rk")
    ).where(F.col("rk") <= 5)


@query(
    "corpus_token_histogram",
    oracle=r"""
    WITH t AS (
      SELECT CAST(len(regexp_extract_all(text, '[\p{L}]+')) AS BIGINT) AS n
      FROM documents
    )
    SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS log2_bucket,
           CAST(1::BIGINT << (length(bin(n)) - 1) AS BIGINT) AS bucket_min_tokens,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           min(n) AS min_tokens,
           max(n) AS max_tokens
    FROM t WHERE n > 0
    GROUP BY 1, 2
    """,
)
def corpus_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram in power-of-two buckets — the input to
    sequence-length planning (what fraction of docs straddle the
    packing budget, where truncation would bite, how much of the
    token mass sits in each length class). Integer-exact: the bucket
    id is the bit width of the count minus one (length(bin(n)) - 1 on
    both engines), and the bucket floor is an integer left-shift — no
    libm log2/pow anywhere, so a ulp-under-boundary rounding can never
    move a doc across a power-of-two bucket edge (advisor r03).

    Plan: one scan projecting a single int per doc, one tiny
    aggregate — the cheapest corpus-profiling query in the repo."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        F.size(F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0))
        .cast("long")
        .alias("n")
    ).where(F.col("n") > 0)
    bucket = (F.length(F.bin(F.col("n"))) - F.lit(1)).cast("long")
    return t.groupBy(
        bucket.alias("log2_bucket"),
        F.expr("CAST(shiftleft(1L, length(bin(n)) - 1) AS BIGINT)").alias(
            "bucket_min_tokens"
        ),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.min("n").alias("min_tokens"),
        F.max("n").alias("max_tokens"),
    )


@query(
    "doc_length_deciles",
    oracle=r"""
    WITH q AS (
      SELECT source,
             quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      FROM documents GROUP BY source
    )
    SELECT source, CAST(i AS INT) AS decile, round(qs[CAST(i AS INT)], 6) AS n_chars_q
    FROM q, unnest(range(1, 10)) AS t(i)
    """,
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source document-length deciles — the shard-size and
    truncation-planning profile (how skewed is each crawl slice?).
    Exact `percentile` (linear interpolation on the sorted column, the
    same definition as DuckDB's quantile_cont), not approx_percentile:
    cross-engine hash equality requires the deterministic aggregate.
    One shuffle by source; the per-group sort is the cost, bounded by
    the largest source. At 100 TB swap in approx_percentile and keep
    this as its calibration oracle on sampled slices."""
    d = table(spark, sf_dir, "documents")
    qs = [i / 10 for i in range(1, 10)]
    agg = d.groupBy("source").agg(
        F.percentile("n_chars", F.array(*[F.lit(q) for q in qs])).alias("qs")
    )
    return agg.select(
        "source",
        F.posexplode("qs"),
    ).select(
        "source",
        (F.col("pos") + 1).cast("int").alias("decile"),
        F.round("col", 6).alias("n_chars_q"),
    )


@query(
    "corpus_bigram_lm_counts",
    oracle=r"""
    WITH toks AS (
      SELECT list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS ts
      FROM documents
    ),
    bg AS (
      SELECT unnest(CASE WHEN len(ts) >= 2
        THEN list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])
        ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM toks
    ),
    p AS (
      SELECT split_part(gram, ' ', 1) AS w1, split_part(gram, ' ', 2) AS w2,
             count(*) AS pair_n
      FROM bg GROUP BY 1, 2
    ),
    t AS (
      SELECT w1, w2, pair_n,
             CAST(sum(pair_n) OVER (PARTITION BY w1) AS BIGINT) AS w1_n,
             row_number() OVER (ORDER BY pair_n DESC, w1, w2) AS rk
      FROM p
    )
    SELECT w1, w2, pair_n, w1_n,
           {cond_p} AS cond_p,
           CAST(rk AS INT) AS rk
    FROM t WHERE rk <= 100
    """.replace("{cond_p}", exact_ratio_sql("pair_n", "w1_n")),
)
def corpus_bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 word bigrams with left-context totals and conditional
    probability P(w2|w1) — the count table a bigram LM (or a
    contamination / memorization probe) starts from. The continuation
    denominator is the sum of pair counts per w1, derived from the
    bigram table itself (no second corpus pass). Top-k is
    TakeOrderedAndProject (pair_n desc, then lexicographic — fully
    deterministic), never a global sort; the w1 window runs on the
    collapsed bigram vocabulary, not the exploded corpus."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0).alias("ts")
    )
    bg = toks.select(F.explode(D.gram_windows(F.col("ts"), 2)).alias("gram"))
    sp = F.split("gram", " ")
    p = (
        bg.select(sp[0].alias("w1"), sp[1].alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_n"))
    )
    t = p.withColumn(
        "w1_n", F.sum("pair_n").over(Window.partitionBy("w1"))
    )
    top = t.orderBy(F.desc("pair_n"), F.asc("w1"), F.asc("w2")).limit(100)
    # rank assigned on the 100 surviving rows (tiny single partition),
    # not the whole vocabulary
    rk = Window.orderBy(F.desc("pair_n"), F.asc("w1"), F.asc("w2"))
    return top.select(
        "w1",
        "w2",
        "pair_n",
        "w1_n",
        exact_ratio_spark("pair_n", "w1_n").alias("cond_p"),
        F.row_number().over(rk).alias("rk"),
    )


@query(
    "text_bigram_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS ts
      FROM documents
    ),
    dg AS (
      SELECT doc_id, unnest(CASE WHEN len(ts) >= 2
        THEN list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])
        ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM toks
    ),
    cg AS (SELECT gram, count(*) AS n FROM dg GROUP BY gram),
    a AS (
      SELECT doc_id,
             count(*) AS n_bigrams,
             CAST(sum(CASE WHEN n < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
             CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM dg JOIN cg USING (gram)
      GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, n_rare, n_hapax,
           {novelty} AS novelty,
           {novelty} > 0.3 AS too_novel
    FROM a
    """.replace("{novelty}", exact_ratio_sql("n_rare", "n_bigrams")),
)
def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality gate without a float log-sum: per
    document, the fraction of its bigram instances that are RARE in
    the corpus LM (count < 3) plus the hapax count (bigrams unique to
    this doc). High novelty means the doc's word transitions are
    unsupported by the rest of the corpus — the cheap integer-exact
    stand-in for "high perplexity under a corpus n-gram LM" that
    production quality filters bootstrap from (the real LM filter
    swaps the <3 test for a log-prob threshold, same plan).

    Plan shape: the doc-gram explode feeds BOTH the LM counts (gram
    groupBy, map-side combine) and the per-doc join — corpus text is
    read once; the gram⋈count equi-join shuffles both sides on the
    same gram key, and the per-doc aggregate rides the doc_id
    shuffle. Docs with < 2 tokens have no bigrams and no row (their
    quality signal comes from the length gate instead)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0).alias("ts"),
    )
    dg = toks.select(
        "doc_id", F.explode(D.gram_windows(F.col("ts"), 2)).alias("gram")
    )
    cg = dg.groupBy("gram").agg(F.count("*").alias("n"))
    rare = F.sum(F.when(F.col("n") < 3, 1).otherwise(0))
    # novelty as the integer-exact half-up ratio; too_novel compares the
    # SAME emitted (exact, engine-identical) value on both engines.
    novelty = exact_ratio_spark("n_rare", "n_bigrams")
    return (
        dg.join(cg, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            rare.cast("long").alias("n_rare"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_rare",
            "n_hapax",
            novelty.alias("novelty"),
            (novelty > 0.3).alias("too_novel"),
        )
    )


@query(
    "corpus_ngram_diversity",
    oracle=r"""
    WITH toks AS (
      SELECT source,
             list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '') AS ts
      FROM documents
    ),
    g AS (
      SELECT source, CAST(1 AS BIGINT) AS gram_n, unnest(ts) AS gram FROM toks
      UNION ALL
      SELECT source, CAST(2 AS BIGINT), unnest(CASE WHEN len(ts) >= 2
        THEN list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])
        ELSE CAST([] AS VARCHAR[]) END)
      FROM toks
      UNION ALL
      SELECT source, CAST(3 AS BIGINT), unnest(CASE WHEN len(ts) >= 3
        THEN list_transform(range(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
        ELSE CAST([] AS VARCHAR[]) END)
      FROM toks
    ),
    per AS (SELECT gram_n, source, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3)
    SELECT source, gram_n,
           CAST(sum(cnt) AS BIGINT) AS total_grams,
           CAST(count(*) AS BIGINT) AS distinct_grams,
           {diversity} AS diversity
    FROM per GROUP BY 1, 2
    """.replace("{diversity}", exact_ratio_wide_sql("count(*)", "sum(cnt)")),
)
def corpus_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (the self-BLEU stand-in production data
    teams actually compute): per source and n in {1,2,3}, the ratio
    of distinct n-grams to total n-gram instances. Low diversity
    flags template-generated or crawler-looped sources BEFORE they
    skew a training mixture; the same ratio over model samples is the
    standard memorization/diversity report.

    Plan shape: one corpus tokenize feeds all three explode branches
    (union of narrow map-side projections — the corpus is still read
    once per branch at worst, never shuffled raw); the distinct is a
    two-level aggregate keyed (gram_n, source, gram) with map-side
    combine, then (source, gram_n) — shuffle volume tracks DISTINCT
    grams, not corpus tokens."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.regexp_extract_all("text", F.lit(r"[\p{L}]+"), 0).alias("ts"),
    )
    parts = []
    for n in (1, 2, 3):
        g = F.col("ts") if n == 1 else D.gram_windows(F.col("ts"), n)
        parts.append(
            toks.select(
                "source",
                F.lit(n).cast("long").alias("gram_n"),
                F.explode(g).alias("gram"),
            )
        )
    grams = parts[0].unionByName(parts[1]).unionByName(parts[2])
    per = grams.groupBy("gram_n", "source", "gram").agg(F.count("*").alias("cnt"))
    return per.groupBy("source", "gram_n").agg(
        F.sum("cnt").alias("total_grams"),
        F.count("*").alias("distinct_grams"),
        # Wide: per-source distinct-gram counts can pass the int64
        # ratio ceiling (~4.6e12) at the 100 TB target (advisor r05).
        exact_ratio_wide_spark("count(1)", "sum(cnt)").alias("diversity"),
    )
