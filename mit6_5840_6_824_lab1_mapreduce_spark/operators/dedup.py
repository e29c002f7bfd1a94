"""Deduplication operators for LLM-data pipelines, DataFrame-native.

Five families (all JVM-side expressions — no Python UDFs in any hot
path):

- exact:      hash-groupBy on content digest
- MinHash+LSH: shingle → k-min md5 signature → banded bucket join →
              exact-Jaccard verify (the 100 TB fuzzy-dedup workhorse:
              candidate generation is an equi-join on (band, hash),
              never an all-pairs product)
- SimHash:    32-bit parity-of-md5-digit fingerprint, banded by the
              pigeonhole principle for hamming-radius search
- n-gram Jaccard: exact similarity on character n-grams for bounded
              candidate groups
- embedding cosine: exact integer-quantized cosine (see similarity.py)

Determinism contract: every hash is md5-hex (identical in Spark and
DuckDB); MinHash takes the lexicographic min of hex strings; all
ratios are computed from exact integers then rounded — so results are
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import LETTER_SPLIT_RE

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS


def tokens(col: Column) -> Column:
    return F.filter(F.split(col, LETTER_SPLIT_RE), lambda t: t != F.lit(""))


def gram_windows(t: Column, n: int) -> Column:
    """Array of space-joined word n-grams over a PRE-MATERIALIZED
    token-array column (empty array if fewer than n tokens).

    Takes the array column, NOT raw text: higher-order-function
    lambdas re-evaluate their operand subtree per reference, so a
    helper that tokenized inline would pay ~n tokenizations per gram
    (measured 7x at bench scale). Every word-gram construction in the
    repo (shingles, bigram repetition, per-source gram top-k) goes
    through here so the window shape can never drift between the
    pipelines and their SQL oracles."""
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(n)]
    )
    return F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams_expr(text_col: str, n: int = 8) -> Column:
    """Array of character n-grams of a column (by name), via expr."""
    return F.expr(
        f"CASE WHEN length({text_col}) >= {n} THEN "
        f"transform(sequence(1, length({text_col}) - {n - 1}), "
        f"i -> substring({text_col}, i, {n})) "
        f"ELSE array() END"
    )


def shingle_pairs_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs — the input to MinHash and to exact
    Jaccard verification.

    Tokenization is materialized into a column *before* the shingle
    lambda: higher-order-function lambdas re-evaluate their operand
    subtree per reference, so inlining tokens(text) here costs ~3
    tokenizations per gram (measured 7× slowdown at bench scale)."""
    shingles = gram_windows(F.col("ts"), n)
    # Dedup happens per-doc INSIDE the row (array_distinct before the
    # explode) — a narrow map-side op, not a cluster-wide distinct
    # shuffle. A groupBy-distinct here cost more than the rest of the
    # MinHash pipeline combined at bench scale.
    return docs.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts")).select(
        "id", F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def minhash_signature_df(pairs: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """k-permutation MinHash via seeded md5: sig_i = min(md5('i|' || s)).

    Lexicographic min over hex digests is a valid min-hash family and
    is engine-portable. One shuffle (groupBy id), k aggregates.

    The explode+groupBy form is deliberate: a map-side alternative
    (array_min over k HOF transforms per row) avoids the shuffle but
    re-walks the shingle array k times in interpreted lambda
    evaluation (no codegen inside HOF bodies) and measured ~4x SLOWER
    at bench scale — the exploded aggregate keeps all k seeded md5s
    in one whole-stage-codegen pass with map-side partial mins, so
    the only shuffle it pays is one row per doc."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]
    return pairs.groupBy("id").agg(*aggs)


def lsh_bands_df(sig: DataFrame, bands: int = N_BANDS, rows: int = ROWS_PER_BAND) -> DataFrame:
    """(id, band_idx, band_hash): md5 of the concatenated band rows."""
    band_cols = [
        F.md5(F.concat(*[F.col(f"h{b * rows + r}") for r in range(rows)])).alias(
            f"b{b}"
        )
        for b in range(bands)
    ]
    wide = sig.select("id", *band_cols)
    stack = ", ".join(f"{b}, b{b}" for b in range(bands))
    return wide.select(
        "id", F.expr(f"stack({bands}, {stack}) as (band_idx, band_hash)")
    )


def oversized_buckets(
    bands_df: DataFrame, max_bucket_size: int, keys: tuple[str, str] = ("band_idx", "band_hash")
) -> DataFrame:
    """Diagnostic companion to the bucket-capped candidate joins:
    the buckets the cap would drop, with their sizes — run/log this
    alongside a capped dedup job to audit what was skipped."""
    return (
        bands_df.groupBy(*keys)
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket_size)
    )


def _cap_buckets(df: DataFrame, keys: list[str], max_bucket_size: int | None) -> DataFrame:
    """Drop rows in buckets larger than `max_bucket_size` before a
    bucket self-join. A degenerate bucket of m rows creates m²/2
    candidate pairs — one hot value (empty docs, boilerplate) can
    dominate the whole job. The count-join shuffles on the SAME key
    as the candidate join that follows, so it adds no new exchange
    pattern.

    RECALL CONTRACT: pairs whose only shared bucket is oversized are
    lost. At dedup thresholds this is the standard trade — a bucket
    that large is near-certainly a degenerate value, not real
    near-duplicates; audit with `oversized_buckets`."""
    if max_bucket_size is None:
        return df
    sizes = df.groupBy(*keys).agg(F.count("*").alias("_bsz"))
    return (
        df.join(sizes, keys)
        .where(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def lsh_candidate_pairs(
    bands_df: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct candidate pairs sharing ≥1 band bucket. Equi-join on
    (band_idx, band_hash) — shuffle by bucket, no cross product.
    `max_bucket_size` guards the join against hot buckets (see
    `_cap_buckets` for the recall contract)."""
    bands_df = _cap_buckets(bands_df, ["band_idx", "band_hash"], max_bucket_size)
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verified_pairs(
    pairs: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over distinct shingle sets for candidate pairs.
    jaccard = |A∩B| / (|A| + |B| - |A∩B|), exact ints → double → 6dp."""
    # Deferred import: queries._util lives under the queries package,
    # whose __init__ imports back into operators (circular at module
    # load when operators.dedup is the entry point).
    from ..queries._util import exact_ratio_spark

    cnt = shingles.groupBy("id").agg(F.count("*").alias("n"))
    sa = shingles.select(F.col("id").alias("id_a"), "shingle")
    sb = shingles.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(cnt.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(cnt.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            # Integer-exact half-up Jaccard (round-5 tie-class sweep):
            # round(double, 6) diverges cross-engine on decimal ties.
            exact_ratio_spark(
                "n_inter", "n_a + n_b - n_inter"
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """End-to-end fuzzy dedup: near-duplicate pairs above `threshold`
    Jaccard on word 3-gram shingles.

    Scale shape (the 100 TB contract):
    - signature generation streams the shingle explode straight into
      the 16-min aggregate (map-side partial mins, one shuffle of
      one row per doc) — the exploded table is NEVER persisted or
      re-read, so the SIGNATURE stage reads corpus text exactly once
      (verification below re-scans `docs`, pruned to candidate ids
      by the semi-join — cost tracks the near-dup rate, not corpus
      size);
    - the shingle explode for Jaccard verification runs ONLY for
      documents that appear in some candidate pair (semi-join on the
      candidate id set) — verify cost tracks the near-duplicate
      rate, not the corpus size;
    - candidates persist (tiny: pairs past LSH banding); nothing
      corpus-sized is ever cached."""
    sig = minhash_signature_df(shingle_pairs_df(docs, id_col, text_col))
    cands = lsh_candidate_pairs(
        lsh_bands_df(sig), max_bucket_size=max_bucket_size
    ).persist()
    cand_ids = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias(id_col)).distinct()
    )
    cand_docs = docs.join(cand_ids, id_col, "left_semi")
    # Distinct (id, shingle) pairs for candidate docs feed three
    # consumers (per-doc counts + both verify sides); Catalyst does
    # not reuse the exchange across them, so persist once.
    sh = shingle_pairs_df(cand_docs, id_col, text_col).persist()
    return jaccard_verified_pairs(cands, sh, threshold)


# ---------------------------------------------------------------- simhash


def simhash32(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash: bit b = sign of Σ_tokens count·(2·parity(md5 hex
    digit b) − 1). One md5 per distinct token; exact integer sums.

    Physical shape: 32 conditional-sum aggregates in ONE groupBy(id) —
    no per-bit row explosion, so shuffle volume is one row per
    (doc, distinct token), not 32×."""
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    tc = tok.groupBy("id", "tok").agg(F.count("*").alias("cnt"))
    # Digit parities via integer bit tests (r12 optimization round,
    # guide §1.2 "per-task work"): hex digit b of the md5 is odd iff
    # bit (7 - b%8)*4 of the 32-bit word conv'd from chars 8k+1..8k+8
    # is set — the same value the old form read with substring(hx,
    # b+1, 1) IN ('1','3','5','7','9','b','d','f'), but 4 conv()
    # slices + 32 shift-and-mask tests per row instead of 32 string
    # slices x 8 string equalities (the old aggregate ran ~0.9 s on
    # the AQE-coalesced single post-shuffle task at sf0.1).
    h = tc.withColumn("hx", F.md5(F.col("tok"))).select(
        "id",
        "cnt",
        *[
            F.conv(F.substring("hx", 1 + 8 * k, 8), 16, 10)
            .cast("long")
            .alias(f"w{k}")
            for k in range(4)
        ],
    )

    def _odd(b: int) -> Column:
        return (
            F.shiftrightunsigned(F.col(f"w{b // 8}"), (7 - b % 8) * 4)
            .bitwiseAND(F.lit(1))
            == 1
        )

    bit_sums = [
        F.sum(F.when(_odd(b), F.col("cnt")).otherwise(-F.col("cnt"))).alias(
            f"s{b}"
        )
        for b in range(32)
    ]
    per_doc = h.groupBy("id").agg(*bit_sums)
    fingerprint = None
    for b in range(32):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return per_doc.select("id", fingerprint.alias("simhash"))


def simhash_near_pairs(
    fps: DataFrame, max_hamming: int = 3, max_bucket_size: int | None = None
) -> DataFrame:
    """Hamming-radius pairs via pigeonhole banding: split 32 bits into
    (max_hamming//8 + ... ) segments — with 4 8-bit segments any pair at
    hamming ≤ 6 (< 8? no: ≤ 3 guarantees a shared segment of 4; for
    radius r, r+1 segments guarantee one exact match). We band into
    r+1 segments, equi-join on (segment_idx, segment_value), then
    verify with bit_count(xor). No cross product."""
    fps = fps.persist()  # one row per doc; both sides of the self-join read it
    segs = max_hamming + 1
    width = 32 // segs if 32 % segs == 0 else (32 // segs) + 1
    seg_cols = []
    for s in range(segs):
        lo = s * width
        w = min(width, 32 - lo)
        if w <= 0:
            break
        seg_cols.append(
            (
                F.shiftrightunsigned(F.col("simhash"), lo)
                % F.shiftleft(F.lit(1).cast("long"), w)
            ).alias(f"seg{s}")
        )
    wide = fps.select("id", "simhash", *seg_cols)
    n = len(seg_cols)
    stack = ", ".join(f"{s}, seg{s}" for s in range(n))
    banded = wide.select(
        "id", "simhash", F.expr(f"stack({n}, {stack}) as (seg_idx, seg_val)")
    )
    banded = _cap_buckets(banded, ["seg_idx", "seg_val"], max_bucket_size)
    a, b = banded.alias("a"), banded.alias("b")
    # Hamming verify BEFORE the pair dedup (r12 optimization round,
    # guide §2.3 "shuffle fewer bytes"): natural-language simhash
    # segments are highly non-uniform (measured sf0.1: 8-bit segment
    # buckets up to ~700 docs, ~2M pre-distinct candidate rows from
    # 5000 docs), and the old shape shipped every one of those rows —
    # with BOTH 64-bit fingerprints — through the distinct's exchange
    # only to throw almost all of them away at the hamming filter
    # afterwards. bit_count(xor) is a few cycles per row evaluated
    # map-side in the join stage; filtering there leaves the distinct
    # a near-dup-sized input. Same rows out: the filter is a
    # deterministic per-row predicate, so filter-then-distinct ==
    # distinct-then-filter.
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# Sentinel digest for NULL text (r08 nulls contract, class a): md5 of
# NULL is NULL, and an equi-join on a NULL key matches nothing — the
# join-back in dedup_exact_keep would silently drop every NULL-text
# document. Coalescing to a sentinel makes NULL-text docs ONE dedup
# group with a min-id keeper like any other duplicate class, on BOTH
# engines (oracles spell the same coalesce). The sentinel cannot
# collide with a real digest (md5 output is 32 hex chars).
NULL_TEXT_DIGEST = "<null-text>"


def content_digest(text_col: Column) -> Column:
    """The null-safe content digest shared by the exact-dedup family."""
    return F.coalesce(F.md5(text_col), F.lit(NULL_TEXT_DIGEST))


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: groups by content digest; keeper = min id."""
    return (
        docs.select(F.col(id_col).alias("id"), content_digest(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ------------------------------------------------------- incremental dedup


def incremental_dedup_verdicts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_mod: int = 5,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental ingest dedup: per NEW document, is it a near-dup
    of the already-indexed corpus, a near-dup of another document in
    the same incoming batch, or unique — and does it survive ingest?

    This is how fuzzy dedup actually runs in production: the corpus
    is not re-deduped from scratch per ingest; new documents' band
    buckets are probed against a STORED signature index plus the
    in-flight batch. Here the "index" side is recomputed from the
    documents table (there is no persisted index in the test
    fixture), but the plan shape is the production one: the probe
    join touches only buckets that contain a new document, so its
    cost tracks batch size, not corpus size; verification explodes
    shingles only for docs appearing in some candidate pair.

    Membership is deterministic: ``id % batch_mod == 0`` marks the
    new batch. Keep rule: a new doc survives iff it matches nothing
    in the index AND it is the lowest-id member of any within-batch
    near-dup group it belongs to (min-id keeper, same convention as
    exact dedup).
    """
    is_new = (F.col(id_col) % batch_mod) == 0
    sig = minhash_signature_df(shingle_pairs_df(docs, id_col, text_col))
    bands = _cap_buckets(
        lsh_bands_df(sig), ["band_idx", "band_hash"], max_bucket_size
    )
    probe = bands.where((F.col("id") % batch_mod) == 0).alias("a")
    cands = (
        probe.join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .persist()
    )
    cand_ids = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias(id_col)).distinct()
    )
    sh = shingle_pairs_df(
        docs.join(cand_ids, id_col, "left_semi"), id_col, text_col
    ).persist()
    ver = jaccard_verified_pairs(cands, sh, threshold)
    other_is_new = (F.col("id_b") % batch_mod) == 0
    agg = ver.groupBy(F.col("id_a").alias(id_col)).agg(
        F.count(F.when(~other_is_new, 1)).alias("n_index_dups"),
        F.count(F.when(other_is_new, 1)).alias("n_batch_dups"),
        F.min("id_b").alias("best_match_id"),
        F.min(F.when(other_is_new, F.col("id_b"))).alias("_best_batch"),
    )
    out = docs.where(is_new).select(id_col).join(agg, id_col, "left")
    n_index = F.coalesce(F.col("n_index_dups"), F.lit(0))
    n_batch = F.coalesce(F.col("n_batch_dups"), F.lit(0))
    return out.select(
        id_col,
        n_index.alias("n_index_dups"),
        n_batch.alias("n_batch_dups"),
        "best_match_id",
        F.when(n_index > 0, F.lit("dup_of_index"))
        .when(n_batch > 0, F.lit("dup_in_batch"))
        .otherwise(F.lit("unique"))
        .alias("verdict"),
        (
            (n_index == 0)
            & ((n_batch == 0) | (F.col(id_col) < F.col("_best_batch")))
        ).alias("keep"),
    )
