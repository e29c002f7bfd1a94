"""Tokenizer training queries: BPE merge learning + segmentation.

The missing piece between the token-counting metrics
(queries/text_metrics.py) and the vocabulary-sizing curve
(queries/sketches.py::vocab_coverage_topk): actually LEARNING the
subword vocabulary from the corpus. Both queries run the iterative
pair-count → argmax → rewrite recurrence of operators/bpe.py over the
word-frequency table; the oracles replay the identical integer
recurrence through chained CTEs (the PageRank/k-means pattern), so
the driver's hash-compare pins every learned rule and every rewritten
symbol sequence exactly. See operators/bpe.py for the asymmetric
'·¦' boundary that makes substring replace equal textbook greedy
left-to-right merging in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import letter_tokens
from ..operators.bpe import BOUND, EOW, bpe_learn_merges, bpe_segment, word_symseq
from ..plans import table
from ._util import exact_ratio_spark, exact_ratio_sql
from .registry import query

_N_MERGES = 6
_SEG_TOP = 50

# ASCII-only [a-z] words: the marker symbols can never collide with
# content, and lower() agrees byte-for-byte across engines.
_WORDS_SQL = rf"""
    toks AS (
      SELECT lower(t) AS word
      FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{{L}}]+')) AS t
            FROM documents)
      WHERE regexp_matches(t, '^[A-Za-z]+$')
    ),
    words AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
              FROM toks GROUP BY word),
    seq0 AS (SELECT word, freq,
                    '{BOUND}' || regexp_replace(word, '(.)', '\1{BOUND}', 'g')
                              || '{EOW}{BOUND}' AS symseq
             FROM words)
"""

# '¦a·¦b·' -> '¦ab·': consumes the pair's inner and trailing '·' but
# keeps the trailing '¦' (= the next match's leading '¦'), so one
# non-overlapping replace pass IS textbook greedy left-to-right BPE.
# The LEFT JOIN ON TRUE + CASE keeps the sequence table intact when a
# round's best{i} is EMPTY (merge candidates ran dry): a bare comma
# cross join would wipe every row and desync from the Spark loop,
# which stops cleanly at the last non-empty round.
_MERGE_REPLACE = (
    "CASE WHEN left_sym IS NULL THEN symseq ELSE"
    " replace(symseq,"
    " '¦' || left_sym || '{b}' || right_sym || '·',"
    " '¦' || left_sym || right_sym || '·') END"
).format(b=BOUND)


def _iteration_sql(i: int) -> str:
    """One BPE round: pair counts over seq{i-1}, deterministic argmax,
    greedy left-to-right merge rewrite."""
    return f"""
    pc{i} AS (
      SELECT a AS left_sym, b AS right_sym,
             CAST(sum(freq) AS BIGINT) AS pair_count
      FROM (
        SELECT freq, syms[t.i] AS a, syms[t.i + 1] AS b
        FROM (SELECT freq,
                     list_filter(string_split(symseq, '{BOUND}'),
                                 x -> x <> '') AS syms
              FROM seq{i - 1}) s,
             UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
      )
      GROUP BY 1, 2
    ),
    best{i} AS (SELECT left_sym, right_sym, pair_count FROM pc{i}
                ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1),
    seq{i} AS (SELECT word, freq, {_MERGE_REPLACE} AS symseq
               FROM seq{i - 1} LEFT JOIN best{i} ON TRUE)
"""


_BPE_CTES = (
    "WITH "
    + _WORDS_SQL
    + ","
    + ",".join(_iteration_sql(i) for i in range(1, _N_MERGES + 1))
)


def _ascii_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(letter_tokens(F.col("text"))).alias("t"))
        .where(F.col("t").rlike("^[A-Za-z]+$"))
        .select(F.lower("t").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


@query(
    "tokenizer_bpe_merges",
    oracle=(
        _BPE_CTES
        + "SELECT * FROM ("
        + " UNION ALL ".join(
            f"SELECT CAST({i} AS BIGINT) AS merge_rank, left_sym, right_sym,"
            f" pair_count FROM best{i}"
            for i in range(1, _N_MERGES + 1)
        )
        + ")"
    ),
)
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the corpus's first 6 BPE merge rules — tokenizer training
    as an engine workload. Every round aggregates the VOCABULARY (one
    corpus tokenize pass happens once, up front), the winning pair
    re-enters the plan as a 1-row broadcast, and lineage truncates per
    round — so rounds cost O(vocab), not O(corpus), at any scale.
    Ties break on (count DESC, left, right): the learned rule sequence
    is engine-reproducible and the oracle replays it CTE by CTE."""
    return bpe_learn_merges(_ascii_words(spark, sf_dir), _N_MERGES)


@query(
    "tokenizer_bpe_segment",
    oracle=(
        _BPE_CTES
        + f""",
    top AS (SELECT word, freq FROM words
            ORDER BY freq DESC, word LIMIT {_SEG_TOP}),
    tseq0 AS (SELECT word, freq,
                     '{BOUND}' || regexp_replace(word, '(.)', '\\1{BOUND}', 'g')
                               || '{EOW}{BOUND}' AS symseq
              FROM top),
    """
        + ",".join(
            f"""
    tseq{i} AS (SELECT word, freq, {_MERGE_REPLACE} AS symseq
                FROM tseq{i - 1} LEFT JOIN best{i} ON TRUE)"""
            for i in range(1, _N_MERGES + 1)
        )
        + f"""
    SELECT word, freq,
           trim(replace(symseq, '{BOUND}', ' ')) AS segmented
    FROM tseq{_N_MERGES}
    """
    ),
)
def tokenizer_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment the 50 most frequent words with the learned merge
    table — the inference half of the trained tokenizer. The rule
    table is n_merges rows by construction, so folding it into
    chained substring replaces is a constant-size plan; applying it
    to the full corpus would be the same map-only rewrite."""
    words = _ascii_words(spark, sf_dir)
    merges = bpe_learn_merges(words, _N_MERGES)
    top = word_symseq(words.orderBy(F.desc("freq"), "word").limit(_SEG_TOP))
    seg = bpe_segment(top, merges)
    return seg.select(
        "word",
        "freq",
        F.trim(F.replace(F.col("symseq"), F.lit(BOUND), F.lit(" "))).alias(
            "segmented"
        ),
    )


@query(
    "corpus_bpe_token_counts",
    oracle=(
        _BPE_CTES
        + f""",
    segn AS (
      SELECT word,
             CAST(len(syms)
                  - CASE WHEN syms[len(syms)] = '{EOW}' THEN 1 ELSE 0 END
                  AS BIGINT) AS n_sub
      FROM (SELECT word,
                   list_filter(string_split(symseq, '{BOUND}'),
                               x -> x <> '') AS syms
            FROM seq{_N_MERGES})
    ),
    dw AS (
      SELECT doc_id, lower(t) AS word
      FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '[^\\p{{L}}]+')) AS t
            FROM documents)
      WHERE regexp_matches(t, '^[A-Za-z]+$')
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens,
           {exact_ratio_sql('sum(n_sub)', 'count(*)')} AS fertility
    FROM dw JOIN segn USING (word)
    GROUP BY doc_id
    """
    ),
)
def corpus_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained tokenizer corpus-wide: per document, the word
    count, the subword count under the learned merge table, and the
    fertility (subwords per word) — THE metric a tokenizer is judged
    by before a training run commits to it. Subword count per word =
    symbols after all merges; a STANDALONE end-of-word marker doesn't
    count, but one merged into its final subword ('a§') rides along —
    so every word contributes >= 1 subword even when fully merged.

    Plan shape at scale: segmentation lives on the VOCABULARY table
    (sub-linear), so the corpus-side cost is one tokenize pass plus an
    equi-join on the word key (vocab side fits broadcast for natural
    corpora; falls back to a co-partitioned shuffle join above the
    broadcast threshold — both sides hash evenly on word). The per-doc
    aggregate rides the doc_id shuffle."""
    words = _ascii_words(spark, sf_dir)
    merges = bpe_learn_merges(words, _N_MERGES)
    seg = bpe_segment(word_symseq(words), merges)
    syms = F.filter(F.split("symseq", BOUND), lambda t: t != F.lit(""))
    segn = seg.select(
        "word",
        (
            F.size(syms)
            - F.when(F.element_at(syms, -1) == EOW, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_sub"),
    )
    docs = table(spark, sf_dir, "documents")
    dw = (
        docs.select(
            "doc_id", F.explode(letter_tokens(F.col("text"))).alias("t")
        )
        .where(F.col("t").rlike("^[A-Za-z]+$"))
        .select("doc_id", F.lower("t").alias("word"))
    )
    return (
        dw.join(segn, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_bpe_tokens"),
            # Integer-exact half-up fertility (round-5 tie-class sweep).
            exact_ratio_spark("sum(n_sub)", "count(1)").alias("fertility"),
        )
    )
