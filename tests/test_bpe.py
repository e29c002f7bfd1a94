"""BPE merge-learning invariants: hand-computable rule sequences,
greedy left-to-right overlap semantics (the property the delimited
substring-replace encoding must preserve), and degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.operators.bpe import (
    BOUND,
    bpe_learn_merges,
    bpe_segment,
    word_symseq,
)


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


def test_learns_hand_computed_merges(spark):
    # freq-weighted pairs: (l,o)=7 from 'low'(5)+'lower'(2); (o,w)=7;
    # (w,§)=5; (w,e)=2; (e,r)=2+3=5 ... 'newer'(3): (n,e)3 (e,w)3 (w,e)3
    # → (w,e)=2+3=5. Top pair is a tie (l,o) vs (o,w) at 7 → lex: (l,o).
    words = _words(spark, [("low", 5), ("lower", 2), ("newer", 3)])
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_learn_merges(words, 2).orderBy("merge_rank").collect()
    ]
    assert got[0] == (1, "l", "o", 7)
    # After merging 'l o'->'lo', (lo,w)=7 is now the top pair.
    assert got[1] == (2, "lo", "w", 7)


def test_greedy_overlap_is_left_to_right(spark):
    # 'aaaa': pairs (a,a) x3. Greedy BPE merges left-to-right without
    # overlap: 'a a a a' -> 'aa aa' — the asymmetric-boundary replace
    # must not consume the '¦' the second match needs.
    words = _words(spark, [("aaaa", 1)])
    merges = bpe_learn_merges(words, 1)
    seg = bpe_segment(word_symseq(words), merges)
    sym = seg.select(
        F.trim(F.replace(F.col("symseq"), F.lit(BOUND), F.lit(" "))).alias("s")
    ).head()[0]
    assert sym == "aa aa §"


def test_odd_run_leaves_trailing_singleton(spark):
    # 'aaa' -> 'aa a', the canonical greedy tie case both engines must
    # resolve identically (non-overlapping left-to-right replace).
    words = _words(spark, [("aaa", 1)])
    merges = bpe_learn_merges(words, 1)
    seg = bpe_segment(word_symseq(words), merges)
    sym = seg.select(
        F.trim(F.replace(F.col("symseq"), F.lit(BOUND), F.lit(" "))).alias("s")
    ).head()[0]
    assert sym == "aa a §"


def test_empty_vocabulary_yields_no_rules(spark):
    words = _words(spark, []).where(F.lit(False))
    assert bpe_learn_merges(words, 3).count() == 0


def test_single_char_words_merge_with_eow(spark):
    # Only possible pair is (x, §).
    words = _words(spark, [("x", 4)])
    row = bpe_learn_merges(words, 1).head()
    assert (row.left_sym, row.right_sym, row.pair_count) == ("x", "§", 4)


# ---- property: Spark recurrence == pure-Python textbook BPE ----

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.text(alphabet="abc", min_size=1, max_size=6)
_vocab = st.dictionaries(_word, st.integers(min_value=1, max_value=9),
                         min_size=1, max_size=8)


def _ref_bpe(freqs: dict[str, int], n_merges: int):
    """Textbook greedy BPE in plain Python: count-desc then
    (left, right)-asc tie-break, greedy left-to-right merge."""
    seqs = {w: [*w, "§"] for w in freqs}
    rules = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        top = max(counts.values())
        pair = min(p for p, c in counts.items() if c == top)
        rules.append((rank, pair[0], pair[1], top))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return rules, seqs


@settings(max_examples=5, deadline=None)
@given(_vocab)
def test_matches_pure_python_reference(spark, vocab):
    words = _words(spark, list(vocab.items()))
    n = 3
    exp_rules, exp_seqs = _ref_bpe(vocab, n)
    got_rules = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_learn_merges(words, n).orderBy("merge_rank").collect()
    ]
    assert got_rules == exp_rules[: len(got_rules)]
    # Segmentation of every word must match the Python fold too.
    merges = bpe_learn_merges(words, n)
    seg = bpe_segment(word_symseq(words), merges)
    got_seg = {
        r.word: r.s
        for r in seg.select(
            "word",
            F.trim(F.replace(F.col("symseq"), F.lit(BOUND), F.lit(" "))).alias("s"),
        ).collect()
    }
    exp_seg = {w: " ".join(s) for w, s in exp_seqs.items()}
    assert got_seg == exp_seg


def test_n_merges_zero_returns_empty_frame(spark):
    words = _words(spark, [("ab", 2)])
    df = bpe_learn_merges(words, 0)
    assert df.columns == ["merge_rank", "left_sym", "right_sym", "pair_count"]
    assert df.count() == 0


def test_stops_cleanly_when_merges_run_dry(spark):
    # vocab {'a'}: round 1 merges (a, §) into the single symbol 'a§';
    # no pairs remain, so rounds 2..6 must stop instead of wiping the
    # sequence table or erroring.
    words = _words(spark, [("a", 2)])
    rules = bpe_learn_merges(words, 6).collect()
    assert len(rules) == 1
    assert (rules[0].left_sym, rules[0].right_sym) == ("a", "§")
    seg = bpe_segment(word_symseq(words), bpe_learn_merges(words, 6))
    assert seg.head().symseq == "·¦a§·¦"


def test_degenerate_corpus_still_matches_oracle(spark, tmp_path):
    """Cross-engine regression for the dry-merge case: a corpus whose
    vocabulary {'a'} exhausts merge candidates in round 1. The oracle
    CTE chain must keep the sequence table intact through the empty
    rounds (LEFT JOIN ON TRUE), and fertility must stay >= 1 even
    though the lone word fully merges with its end-of-word marker."""
    import pandas as pd

    from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY

    from .oracle_check import compare_query

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a a a", "a a"],
            "lang": ["en", "en"],
            "source": ["s0", "s0"],
            "n_chars": [5, 3],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    for name in (
        "tokenizer_bpe_merges",
        "tokenizer_bpe_segment",
        "corpus_bpe_token_counts",
    ):
        e = REGISTRY[name]
        compare_query(spark, e.fn, e.oracle, str(tmp_path), name=name)
    rows = REGISTRY["corpus_bpe_token_counts"].fn(spark, str(tmp_path)).collect()
    assert {r.doc_id: r.n_bpe_tokens for r in rows} == {0: 3, 1: 2}
    assert all(r.fertility == 1.0 for r in rows)
