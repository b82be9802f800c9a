"""Text analysis operators for training-data curation.

Language ID (stopword voting), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (min-gram rolling hash). Pure Catalyst expressions —
JVM-side, codegen'd, and SQL-expressible for the oracle — except where
an interpreted higher-order-lambda chain measured as the hot spot and a
bit-identical vectorized Arrow kernel replaces it by default with the
SQL form retained for the oracle mirror (winnowing_fingerprints, r12 —
the minhash_signatures two-impl contract). No model files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for n-gram/stopword-voting language ID
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "que", "es", "en", "un", "por"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols.
# Plain-space class (no \s) so the pattern embeds identically in Spark SQL
# (backslash-escaping string literals) and DuckDB RE2.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "tokens", F.expr(f"regexp_extract_all({text_col}, '{TOKEN_REGEX}', 0)")
    )


def token_stats(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + char
    stats. One projection."""
    return with_tokens(df, text_col).select(
        key,
        F.length(text_col).alias("n_chars_measured"),
        F.size(F.split(F.col(text_col), " ")).alias("n_ws_tokens"),
        F.size("tokens").alias("n_re_tokens"),
        F.round(
            F.length(text_col) / F.greatest(F.size("tokens"), F.lit(1)), 4
        ).alias("chars_per_token"),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Column-preserving quality metrics (pipeline-composable): adds
    stopword_ratio, punct_ratio, length_factor, quality."""
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    d = df.withColumn("_words", F.split(F.lower(F.col(text_col)), " "))
    d = d.withColumn(
        "stopword_ratio",
        F.round(
            F.size(F.expr(f"filter(_words, w -> array_contains(array({en}), w))"))
            / F.greatest(F.size("_words"), F.lit(1)),
            4,
        ),
    )
    # punct count via translate (codegen'd per-char map lookup), NOT
    # regexp_replace: deleting every [a-zA-Z0-9 ] char and measuring what
    # remains counts exactly the chars the old [^a-zA-Z0-9 ] regex
    # counted (per-code-point set membership in both engines' paths),
    # but the regex pass was ~95 CPU-s per corpus scan at the 10× tier
    # — the dominant cost of every quality consumer (guide §1.2.2).
    alnum_space = (
        "abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
    )
    d = d.withColumn(
        "punct_ratio",
        F.round(
            F.length(F.translate(F.col(text_col), alnum_space, ""))
            / F.greatest(F.length(text_col), F.lit(1)),
            4,
        ),
    )
    d = d.withColumn(
        "length_factor",
        F.round(F.least(F.length(text_col) / F.lit(200.0), F.lit(1.0)), 4),
    )
    return d.withColumn(
        "quality",
        F.round(
            F.lit(0.4) * F.col("length_factor")
            + F.lit(0.4) * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
            + F.lit(0.2) * (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))),
            4,
        ),
    ).drop("_words")


def quality_score(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: penalize very short docs, extreme
    punctuation density, and stopword-free text (word-salad signal).
    Deterministic arithmetic, rounded."""
    return with_quality(df, text_col).select(
        key, "stopword_ratio", "punct_ratio", "length_factor", "quality"
    )


def with_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Column-preserving language ID: adds score_<lang> per language and
    lang_pred (argmax with fixed precedence order on ties)."""
    d = df.withColumn("_words", F.split(F.lower(F.col(text_col)), " "))
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        d = d.withColumn(
            f"score_{lang}",
            F.size(F.expr(f"filter(_words, w -> array_contains(array({lst}), w))")),
        )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), lang
        ).otherwise(pred)
    return d.withColumn("lang_pred", pred).drop("_words")


def language_id(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Stopword-voting language ID: score = |tokens ∩ stopwords(lang)|
    per language, argmax with fixed precedence order on ties."""
    langs = list(STOPWORDS)
    return with_language(df, text_col).select(
        key, *[F.col(f"score_{l}") for l in langs], "lang_pred"
    )


def clean_corpus(
    df: DataFrame, text_col: str = "text", key: str = "doc_id",
    min_quality: float = 0.5, lang: str = "en",
) -> DataFrame:
    """Composed training-data curation pipeline: quality gate → language
    gate → exact dedup (keep lowest key per content hash) → token stats.

    All gating metrics are projections fused into ONE scan by Catalyst;
    the single shuffle in the whole plan is the dedup window on
    content_hash. At 100 TB this is the shape that matters: a full
    curation pass at scan speed plus exactly one exchange."""
    from pyspark.sql import Window

    d = with_language(with_quality(df, text_col), text_col)
    d = d.filter((F.col("quality") >= min_quality) & (F.col("lang_pred") == lang))
    w = Window.partitionBy("content_hash").orderBy(key)
    d = (
        d.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return with_tokens(d, text_col).select(
        key,
        "quality",
        "lang_pred",
        "content_hash",
        F.size("tokens").alias("n_re_tokens"),
    )


# PII patterns chosen to parse AND match identically under Java regex
# (Spark) and RE2 (DuckDB/Trino): no backrefs, no lookaround, ASCII \b.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4": "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "phone": "\\+[0-9]{7,15}",
}
# emails first (they contain dots and digits that the ip/phone patterns
# could otherwise nibble), then ips, then international-format phones
PII_ORDER = ("email", "ipv4", "phone")


def with_pii_scrubbed(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Column-preserving PII redaction: adds ``n_email``/``n_ipv4``/
    ``n_phone`` (match counts on the PRE-scrub text) and ``scrubbed``
    (each category replaced by its placeholder, applied in PII_ORDER).
    Pure Catalyst regexp expressions — scan-speed at any scale, no UDF."""
    d = df
    for cat in PII_ORDER:
        d = d.withColumn(
            f"n_{cat}",
            F.size(F.regexp_extract_all(
                F.col(text_col), F.lit(PII_PATTERNS[cat]), F.lit(0)
            )),
        )
    scrub = F.col(text_col)
    for cat in PII_ORDER:
        scrub = F.regexp_replace(scrub, PII_PATTERNS[cat], f"<{cat.upper()}>")
    return d.withColumn("scrubbed", scrub)


def pii_scrub(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """PII scrub report: per-category counts + md5 of the fully scrubbed
    text (pins every replacement byte-for-byte under a value-hash gate)."""
    return with_pii_scrubbed(df, text_col).select(
        key, "n_email", "n_ipv4", "n_phone",
        F.md5("scrubbed").alias("scrubbed_md5"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-word and
    duplicate-n-gram fractions (n=2,3). High values flag boilerplate/spam
    docs that survive inter-document dedup. Pure per-row projection
    (split + array_distinct + higher-order transform) — no shuffle, no
    UDF; the whole filter runs at scan speed on 100 TB."""
    d = df.select(F.col(key), F.split(F.col(text_col), " ").alias("_w"))
    n = F.size("_w")
    cols = [
        n.alias("n_words"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("_w")) / F.greatest(n, F.lit(1)),
            4,
        ).alias("dup_word_fraction"),
    ]
    for g in (2, 3):
        # guard BEFORE sequence(): sequence(1, 0) steps DESCENDING in
        # Spark ([1,0]), it is not empty — short docs must yield array()
        grams = F.expr(
            f"CASE WHEN size(_w) >= {g} THEN"
            f" transform(sequence(1, size(_w) - {g - 1}),"
            f" i -> concat_ws(' ', slice(_w, i, {g})))"
            f" ELSE array() END"
        )
        n_g = F.size(grams)
        cols.append(
            F.when(
                n_g > 0,
                F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / n_g, 4),
            )
            .otherwise(F.lit(0.0))
            .alias(f"dup_{g}gram_fraction")
        )
    return d.select(key, *cols)


def line_dedup(
    df: DataFrame, text_col: str = "text", key: str = "doc_id",
    max_docs: int = 5, sep: str = "\n",
) -> DataFrame:
    """CCNet-style line-level corpus dedup: drop every line that occurs in
    more than ``max_docs`` distinct documents (boilerplate headers,
    footers, navigation chrome), keep the rest in original order.

    Shape at 100 TB: lines are counted by an md5 line-hash groupBy (keyed
    shuffle, bounded 32-byte keys regardless of line width), counts flow
    back through a hash join on the same key, and the per-document
    reassembly is one more keyed shuffle — three exchanges total, no
    broadcast of anything corpus-sized, no driver state. Returns one row
    per document: total/kept line counts and the md5 of the cleaned text
    (pins every surviving byte AND the line order under a value hash).
    """
    lines = df.select(
        F.col(key),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("line_hash", F.md5("line"))
    counts = lines.groupBy("line_hash").agg(
        F.countDistinct(key).alias("n_docs")
    )
    joined = lines.join(counts, "line_hash").withColumn(
        "keep", F.col("n_docs") <= max_docs
    )
    # collect_list drops nulls, so the CASE without ELSE keeps exactly the
    # surviving lines; array_sort on (pos, line) restores document order
    # (pos is unique per doc)
    return joined.groupBy(key).agg(
        F.count("*").cast("int").alias("n_lines"),
        F.sum(F.col("keep").cast("int")).cast("int").alias("n_kept"),
        F.md5(
            F.concat_ws(
                sep,
                F.expr(
                    "transform(array_sort(collect_list("
                    "CASE WHEN keep THEN struct(pos, line) END)), s -> s.line)"
                ),
            )
        ).alias("cleaned_md5"),
    )


def build_vocab(
    df: DataFrame, text_col: str = "text",
    vocab_size: int = 1000, min_count: int = 1,
) -> DataFrame:
    """Tokenizer-style vocabulary build: BPE-ish regex tokens → corpus
    counts → top-``vocab_size`` by (count desc, token asc) → contiguous
    ``token_id`` starting at 0.

    The corpus-wide count is a partial+final hash aggregate (one keyed
    shuffle over token strings); the top-V cut is TakeOrderedAndProject
    (no global sort of the vocabulary); the id-assignment window runs over
    at most ``vocab_size`` rows — bounded by a literal, not by data size,
    the same justification as the pack_sequences bucket-dimension window.
    """
    from pyspark.sql import Window

    toks = with_tokens(df, text_col).select(
        F.explode("tokens").alias("token")
    )
    counts = (
        toks.groupBy("token").agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    top = counts.orderBy(F.desc("n"), "token").limit(vocab_size)
    w = Window.orderBy(F.desc("n"), "token")
    return top.select(
        (F.row_number().over(w) - 1).cast("int").alias("token_id"),
        "token",
        F.col("n").cast("long").alias("n"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Rolling-hash document fingerprint: min gram hash (1-permutation
    minhash) + content hash — compact identity for shard-level dedup."""
    from .dedup import with_grams

    return with_grams(df, text_col).select(
        key,
        F.expr("array_min(gram_hashes)").alias("fingerprint"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )


def tfidf_top_terms(
    df: DataFrame, top_k: int = 3, text_col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Term importance, linear-IDF variant: per-document top-``top_k``
    tokens by ``tf * (N / df)``. The inverse document frequency is the
    LINEAR ratio N/df, not the classic log(N/df), a deliberate trade:
    division is correctly rounded under IEEE-754 so scores replicate
    bit-identically in the SQL oracle, while transcendental log differs
    across engines in the last ulp. NOTE the rankings are NOT equivalent
    when tf varies across a document's terms — linear IDF weights rarity
    more aggressively than log-IDF (a tf=1 term with N/df=100 outranks a
    tf=30 term with N/df=1.2, where log-IDF ranks them the other way);
    callers wanting classic TF-IDF ordering should apply log to the
    returned df column and re-rank.

    Shuffle shape: tf is a (doc, term) hash aggregate, df a (term)
    aggregate, one hash join on term, one per-doc window for the top-k —
    every exchange keyed, none global. N is computed INSIDE the plan (a
    broadcast single-row aggregate) — no eager count job at plan-build
    time."""
    from pyspark.sql import Window

    toks = with_tokens(df, text_col).select(
        F.col(key), F.explode("tokens").alias("term")
    )
    tf = toks.groupBy(key, "term").agg(F.count("*").alias("tf"))
    docfreq = (
        toks.select(key, "term").distinct()
        .groupBy("term").agg(F.count("*").alias("df"))
    )
    n_docs_row = df.agg(
        F.count_distinct(F.col(key)).cast("double").alias("_n_docs")
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs_row))
        .withColumn(
            "score",
            F.round(F.col("tf") * (F.col("_n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(key).orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= top_k)
        .select(key, "term", F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"), "score", "rk")
    )


def unigram_logprob_score(
    df: DataFrame, text_col: str = "text", key: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality scoring with a corpus-trained
    unigram LM: score(doc) = -(1/n) Σ ln p(token), add-one smoothed.
    High scores flag boilerplate-free but improbable (noisy) text; low
    scores flag repetitive/templated text — the standard perplexity
    filter in pretraining pipelines, here with the LM trained on the
    corpus itself in the same plan.

    Determinism: the per-doc sum Σ c_w · ln p(w) runs as a SEQUENTIAL
    fold over the doc's (token, count) pairs in sorted-token order
    (collect_list → array_sort → aggregate), never as a float SUM
    aggregate whose partial-merge order differs run to run. Counts and
    totals are exact BIGINTs; only the final fold is floating.

    Scale: vocabulary build is one map-side-combinable token count (the
    same shuffle class as word-count); the vocab joins back BROADCAST
    (a natural-language vocab is millions of rows at worst). Per-doc
    state is bounded by the doc's distinct tokens.
    """
    toks = with_tokens(df, text_col).select(
        key, F.explode("tokens").alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("c_corpus"))
    totals = vocab.agg(
        F.sum("c_corpus").alias("n_total"),
        F.count("*").alias("v_size"),
    )
    per_doc = toks.groupBy(key, "token").agg(F.count("*").alias("c_doc"))
    joined = (
        per_doc.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(totals))
    )
    # p(w) = (c_corpus + 1) / (n_total + v_size); fold in token order
    return (
        joined.groupBy(key)
        .agg(
            F.sum("c_doc").cast("long").alias("n_tokens"),
            F.expr(
                "aggregate("
                "  array_sort(collect_list(struct(token, c_doc, c_corpus,"
                "                                 n_total, v_size))),"
                "  cast(0.0 AS DOUBLE),"
                "  (acc, t) -> acc - t.c_doc * ln("
                "      (cast(t.c_corpus AS DOUBLE) + 1.0)"
                "      / (cast(t.n_total AS DOUBLE) + t.v_size))"
                ") "
            ).alias("_nll"),
        )
        .select(
            key,
            "n_tokens",
            F.expr(
                "round(CASE WHEN n_tokens = 0 THEN 0.0 "
                "ELSE _nll / n_tokens END, 6)"
            ).alias("avg_neg_logprob"),
        )
    )


KN_DISC_NUM, KN_DISC_DEN = 3, 4  # absolute discount D = 0.75, exact rational


def kneser_ney_bigram_score(
    df: DataFrame, text_col: str = "text", key: str = "doc_id",
    prescale_bits: int = 0,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney, ICASSP
    1995; the interpolated form of Chen & Goodman, CSL 1999 §2.7) — the
    smoothing KenLM uses for the CCNet-style perplexity filter that
    ``unigram_logprob_score`` approximates with add-one unigrams:

        p(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
                 + D·N1+(w1·)/c(w1) · N1+(·w2)/N1+(··),   D = 3/4

    where N1+(w1·)/N1+(·w2) count distinct right/left continuations and
    N1+(··) the distinct bigram types — the "how many contexts" counts
    that make KN's backoff estimate novel-continuation probability
    rather than raw frequency.

    ZERO float arithmetic anywhere: with D = 3/4 the probability is the
    exact integer rational

        num = max(4·c12 − 3, 0)·N1pp + 3·N1fw(w1)·N1bw(w2)
        den = 4·c1·N1pp            (num ≤ den, so cost ≥ 0)

    and the per-occurrence cost is ``ilog2_fp(den) − ilog2_fp(num)``
    (fixed-point log2 by mantissa squaring — see
    ``functions.fixedpoint``; monotone, bit-identical in Spark and
    DuckDB). Doc scores are then plain BIGINT SUMs — fully commutative,
    no ordered float fold (unigram_logprob_score needs a sequential
    fold because its float adds don't commute; integer costs do).

    Scale: bigram derivation is the zero-join ``arrays_zip`` shift
    (bigram_conditional); per-doc and corpus-type counts are ONE
    map-side-combinable shuffle each over the (w1, w2) key; the
    denominator/continuation frames aggregate the TYPE table (vocab²-
    bounded, ≪ corpus). The type-stat join back to per-doc counts is
    keyed on (w1, w2) — broadcastable for natural-language vocabularies,
    a co-partitioned hash join otherwise. ``prescale_bits`` right-shifts
    num and den before the log (a defined truncation, replayed by the
    oracle) for corpora where c12·N1pp would overflow int64; the
    decimal(38,0) intermediates raise loudly instead of wrapping.

    Returns (doc_id, n_bigrams, total_cost_fp, bits_per_bigram_milli):
    cost in 2^-16 log2 units; milli-bits/bigram by exact integer
    division; docs with <2 tokens score NULL.
    """
    from ..functions.fixedpoint import ilog2_fp_sql

    toks = with_tokens(df, text_col)
    doc_pairs = (
        toks.select(
            key,
            F.expr("slice(tokens, 1, greatest(size(tokens) - 1, 0))")
            .alias("_a"),
            F.expr("slice(tokens, 2, greatest(size(tokens) - 1, 0))")
            .alias("_b"),
        )
        .select(key, F.explode(F.arrays_zip("_a", "_b")).alias("bg"))
        .select(key, F.col("bg._a").alias("w1"), F.col("bg._b").alias("w2"))
        .groupBy(key, "w1", "w2")
        .agg(F.count("*").cast("long").alias("c_doc"))
    )
    pairs = doc_pairs.groupBy("w1", "w2").agg(
        F.sum("c_doc").cast("long").alias("c12")
    )
    left = pairs.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1fw"),
    )
    right = pairs.groupBy("w2").agg(F.count("*").cast("long").alias("n1bw"))
    tot = pairs.agg(F.count("*").cast("long").alias("n1pp"))
    dn, dd = KN_DISC_NUM, KN_DISC_DEN
    # guard BEFORE the scaling division: Spark's decimal `div` yields
    # BIGINT and silently WRAPS past int64 (verified), so the raw
    # decimal is the only place the overflow is still visible
    lim = ((1 << 62) - 1) << prescale_bits
    sc = 1 << prescale_bits
    stats = (
        pairs.join(left, "w1").join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_num_raw",
            F.expr(
                f"greatest({dd} * c12 - {dn}, 0)"
                f" * CAST(n1pp AS DECIMAL(38,0))"
                f" + {dn} * n1fw * CAST(n1bw AS DECIMAL(38,0))"
            ),
        )
        .withColumn(
            "_den_raw", F.expr(f"{dd} * c1 * CAST(n1pp AS DECIMAL(38,0))")
        )
        .withColumn(
            "_num",
            F.expr(
                f"CASE WHEN _den_raw <= CAST('{lim}' AS DECIMAL(38,0)) "
                f"THEN greatest(CAST(_num_raw div CAST({sc} AS "
                f"DECIMAL(38,0)) AS BIGINT), CAST(1 AS BIGINT)) "
                f"ELSE CAST(raise_error('kneser_ney: counts overflow "
                f"int64 — raise prescale_bits') AS BIGINT) END"
            ),
        )
        .withColumn(
            "_den",
            F.expr(
                f"greatest(CAST(_den_raw div CAST({sc} AS DECIMAL(38,0)) "
                f"AS BIGINT), CAST(1 AS BIGINT))"
            ),
        )
        .select(
            "w1", "w2",
            F.expr(
                f"({ilog2_fp_sql('_den')}) - ({ilog2_fp_sql('_num')})"
            ).alias("cost_fp"),
        )
    )
    per_doc = (
        doc_pairs.join(stats, ["w1", "w2"])
        .groupBy(key)
        .agg(
            F.sum("c_doc").cast("long").alias("n_bigrams"),
            F.sum(F.col("c_doc") * F.col("cost_fp")).cast("long")
            .alias("total_cost_fp"),
        )
    )
    spine = df.select(key)
    return (
        spine.join(per_doc, key, "left")
        .select(
            key,
            F.coalesce("n_bigrams", F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.coalesce("total_cost_fp", F.lit(0)).cast("long")
            .alias("total_cost_fp"),
            F.expr(
                "CASE WHEN n_bigrams IS NULL OR n_bigrams = 0 THEN NULL "
                f"ELSE (total_cost_fp * 1000) div (n_bigrams * 65536) END"
            ).cast("long").alias("bits_per_bigram_milli"),
        )
    )


# Okapi BM25 constants (Robertson et al.; Lucene's defaults). Injected as
# Python float literals into both the Spark plan and the SQL oracle.
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_base_udf(query_terms: list[str]):
    """Vectorized (dl, hits) per document — the Python twin of
    ``size(tokens)`` + ``filter(tokens, t -> t IN (...))`` over
    ``with_tokens``, BIT-IDENTICAL by construction: Python ``re`` and
    Java ``Pattern`` are both leftmost-first NFA engines so
    ``TOKEN_REGEX`` yields the same token sequence, the filter keeps
    order and multiplicity exactly like the Catalyst lambda, and the
    count is over the same matches. Replaces one corpus-wide
    interpreted JVM regex pass plus an interpreted higher-order filter
    (guide §4.2) — the dsir bucket-kernel precedent."""
    import re

    tok_re = re.compile(TOKEN_REGEX)
    terms = frozenset(query_terms)

    @F.pandas_udf("struct<dl: bigint, hits: array<string>>")
    def _base(texts: pd.Series) -> pd.DataFrame:
        dls, hits = [], []
        for t in texts:
            toks = tok_re.findall(t or "")
            dls.append(len(toks))
            hits.append([x for x in toks if x in terms])
        return pd.DataFrame({"dl": dls, "hits": hits})

    # guide §4.4: the struct fields are extracted in the next
    # projection and consumers explode ``hits`` — without the marker
    # the optimizer clones the kernel per extracted field / below
    # inferred generate-filters (the signature-kernel precedent)
    return _base.asNondeterministic()


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    key: str = "doc_id",
    cache=None,
    impl: str = "arrow",
) -> DataFrame:
    """Okapi BM25 retrieval: score every document against a fixed term
    query, return the top-``k``; the ranking half of a hybrid
    (lexical + vector) search stack.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    with Lucene's idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    All counts (tf, df, |d|, N, Σ|d|) are exact BIGINTs; the float score
    derives from identical integers on both engines, and the per-doc
    term sum folds sequentially in sorted-term order. Scale: the corpus
    is tokenized ONCE into a persisted (key, dl, hits) projection where
    ``hits`` is the token array pre-filtered to the query's terms — the
    stats agg and the tf explode both read it, instead of re-running the
    regex tokenizer per consumer (measured 4.9s → 2.6s at the 10× tier;
    the persisted frame is doc-count-sized rows of two ints + a few
    matched tokens, spilling to disk at scale, strictly cheaper than a
    second tokenize pass). Doc length stays a projection (never an
    explode→groupBy, the r5 fix); tf fanout is |matches|, not |tokens|;
    corpus stats broadcast; top-k is TakeOrderedAndProject, never a
    global sort materialization.
    """
    from ..functions.caching import owned_set, tie_release

    # SQL-escape embedded quotes AND backslashes — caller-supplied terms
    # must never be able to break out of the IN-list literal. Spark's
    # default lexer treats backslash as an escape inside single-quoted
    # literals (unlike DuckDB), so a term ending in '\' would otherwise
    # escape the closing quote and a crafted pair of terms could inject
    # expression text. Backslashes are doubled FIRST, then quotes are
    # backslash-escaped (same scheme as quality._lit).
    terms_sql = ", ".join(
        "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"
        for t in query_terms
    )
    ps, owned = owned_set(cache)
    if impl == "arrow":
        # r12 optimization round: one vectorized kernel pass computes
        # (dl, hits) per doc — the corpus-wide regexp_extract_all +
        # interpreted filter() lambda was the operator's dominant stage
        # CPU at the 10× tier. impl="sql" keeps the expression form the
        # DuckDB oracle replays (two-impl contract, parity-tested).
        base = ps.persist(
            df.select(
                F.col(key),
                _bm25_base_udf(query_terms)(text_col).alias("_b"),
            ).select(
                key,
                F.col("_b.dl").alias("dl"),
                F.col("_b.hits").alias("hits"),
            )
        )
    else:
        base = ps.persist(
            with_tokens(df, text_col).select(
                key,
                F.size("tokens").cast("long").alias("dl"),
                F.expr(f"filter(tokens, t -> t IN ({terms_sql}))").alias(
                    "hits"
                ),
            )
        )
    # ONE action populates the cache AND returns the corpus stats
    # (r13, VERDICT r12 #5 — collapse bm25's two serial
    # materializations): the old shape ran base.count() purely to
    # populate (guarding the broadcast-race double-compute), then a
    # second full cache pass for the (n_docs, sum_dl) aggregate inside
    # a crossJoin'd 1-row broadcast. The aggregate itself is the
    # populate action now, and the two exact BIGINTs ride into the
    # score expression as literals — same integers, same IEEE float
    # derivation, one fewer pass over the corpus-sized cache and one
    # fewer broadcast-exchange job at every scale.
    srow = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_docs, sum_dl = int(srow["n_docs"]), int(srow["sum_dl"] or 0)
    tf = (
        base.select(key, "dl", F.explode("hits").alias("token"))
        .groupBy(key, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.countDistinct(key).alias("df")
    )
    parts = tf.join(F.broadcast(dfreq), "token")
    term_score = (
        f"ln(1.0 + (cast({n_docs}L AS DOUBLE) - t.df + 0.5) / (t.df + 0.5))"
        f" * (t.tf * ({BM25_K1!r} + 1.0))"
        f" / (t.tf + {BM25_K1!r} * (1.0 - {BM25_B!r}"
        f" + {BM25_B!r} * t.dl / (cast({sum_dl}L AS DOUBLE) / {n_docs}L)))"
    )
    scored = parts.groupBy(key).agg(
        F.expr(
            # the two corpus stats became literals above; dropping them
            # from the sort struct keeps the identical fold order (token
            # is unique within a doc group, so it alone decides the
            # array_sort; the stats were per-group constants)
            "round(aggregate("
            "  array_sort(collect_list(struct(token, tf, df, dl))),"
            "  cast(0.0 AS DOUBLE),"
            f"  (acc, t) -> acc + {term_score}), 6)"
        ).alias("bm25"),
        F.count("*").cast("long").alias("n_terms_hit"),
    )
    return tie_release(
        scored.orderBy(F.desc("bm25"), F.col(key))
        .limit(k)
        .select(key, "n_terms_hit", "bm25"),
        ps, owned,
    )


# character classes for the entropy estimate: lowercase letters, digits
# collapsed to one class, space, and an "other" remainder class
ENTROPY_CHARS = "abcdefghijklmnopqrstuvwxyz"


def char_entropy_stats(
    df: DataFrame, text_col: str = "text", key: str = "doc_id",
) -> DataFrame:
    """Per-document information-density signals: character-distribution
    Shannon entropy (bits) over 29 classes (26 letters, digits, space,
    other) and type-token ratio — the compression-ratio-style quality
    screens (low entropy ⇒ repetitive/templated text; low TTR ⇒ word
    salad loops).

    All flat codegen projections, zero shuffle, scan-speed: per-class
    counts are ``length(x) - length(replace(x, c, ''))`` chains on the
    lowercased text; the entropy sum is a FIXED-ORDER chain of 29 terms
    (expression order, not a data-order float aggregation), so a SQL
    oracle replays it bit-for-bit."""
    lower = f"lower({text_col})"
    d = df.withColumn("_lc", F.expr(lower)).withColumn(
        "_n", F.expr("length(_lc)")
    )
    counts = []
    for ch in ENTROPY_CHARS:
        counts.append(
            f"(length(_lc) - length(replace(_lc, '{ch}', '')))"
        )
    counts.append(
        # digit count via translate (codegen'd char map), same integer
        # as the old regexp_replace('[0-9]') length delta at a fraction
        # of the cost (guide §1.2.2 — see with_quality's punct_ratio)
        "(length(_lc) - length(translate(_lc, '0123456789', '')))"
    )
    counts.append("(length(_lc) - length(replace(_lc, ' ', '')))")
    total_known = " + ".join(counts)
    counts.append(f"(length(_lc) - ({total_known}))")  # other
    # -sum p*log2(p); zero-count classes contribute 0 via the CASE
    terms = [
        f"CASE WHEN {c} = 0 OR _n = 0 THEN 0.0d ELSE "
        f"-(cast({c} AS DOUBLE) / _n) * log2(cast({c} AS DOUBLE) / _n) END"
        for c in counts
    ]
    entropy = " + ".join(terms)
    tokens = f"split({text_col}, ' ')"
    return d.select(
        key,
        F.col("_n").cast("long").alias("n_chars"),
        F.expr(f"round({entropy}, 6)").alias("char_entropy_bits"),
        F.expr(
            # cast to DOUBLE explicitly: `* 1.0` is DECIMAL math in
            # Spark SQL (pandas object dtype, decimal division)
            f"round(cast(size(array_distinct({tokens})) AS DOUBLE) "
            f"/ greatest(size({tokens}), 1), 6)"
        ).alias("type_token_ratio"),
    )


def bigram_conditional(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus bigrams with their conditional probability
    P(w2 | w1) — the first statistics pass of n-gram LM training /
    template detection over a pretraining corpus.

    Plan: bigrams form per-row with ZERO joins or windows over the
    corpus — ``arrays_zip`` of the token array against its own 1-shifted
    slice, exploded (documents with <2 tokens vanish via empty slices;
    the slice length is clamped to ≥0 because Spark's ``slice`` rejects
    the -1 an empty tokenization would produce). ONE map-side-combinable
    groupBy counts pairs; the prefix totals (denominators) come from a
    KEYED window over the vocabulary-sized pair-count frame (never over
    corpus rows). All counts are exact BIGINTs; P is the 1e-6-floored
    exact-integer ratio re-expressed as a double — ``round()`` on a
    quotient double lands on .5 boundaries where Spark and DuckDB
    systematically disagree, while floor-scaled integer division is
    identical everywhere. Ties order by (count desc, w1, w2).
    """
    pairs = (
        with_tokens(df, text_col)
        .select(
            F.expr(
                "slice(tokens, 1, greatest(size(tokens) - 1, 0))"
            ).alias("_a"),
            F.expr(
                "slice(tokens, 2, greatest(size(tokens) - 1, 0))"
            ).alias("_b"),
        )
        .select(F.explode(F.arrays_zip("_a", "_b")).alias("bg"))
        .select(
            F.col("bg._a").alias("w1"), F.col("bg._b").alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("pair_n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("w1")
    scored = pairs.withColumn(
        "w1_n", F.sum("pair_n").over(w).cast("long")
    ).withColumn(
        "p_cond",
        F.expr(
            "cast((pair_n * 1000000) div w1_n AS DOUBLE) / 1000000"
        ),
    )
    return scored.orderBy(F.desc("pair_n"), "w1", "w2").limit(k).select(
        "w1", "w2", "pair_n", "w1_n", "p_cond"
    )


WINNOW_K = 4   # token-gram length
WINNOW_W = 5   # winnowing window (hashes per window)


def winnowing_fingerprints(
    df: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W,
    text_col: str = "text", key: str = "doc_id", impl: str = "arrow",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03 — the MOSS scheme): hash every positional token k-gram,
    slide a w-hash window, keep each window's minimum — the selected
    set is a provably position-robust, locally-dense fingerprint
    (guarantee: any shared substring of w + k − 1 tokens contributes at
    least one COMMON selected fingerprint, so plagiarism/copy spans
    survive edits outside the span, which a global min — 1-perm
    minhash — does not give).

    Output: one row per selected fingerprint — (key, fp BIGINT 60-bit
    gram hash, pos INT 1-based gram position). Ties inside a window
    break to the LEFTMOST minimum (classic winnowing prefers
    rightmost, but with 60-bit hashes ties are collisions, and
    leftmost = list_position semantics shared by Spark and ANSI SQL —
    the deterministic cross-engine choice). Docs shorter than k tokens
    hash the whole text as one gram; hash sequences shorter than w
    select their global min (one window over everything).

    Plan/scale: one per-row projection + one explode. No shuffle, no
    state. Two BIT-IDENTICAL implementations (the minhash_signatures
    two-impl contract; equality pinned by a test):

    - ``arrow`` (default, r12): one vectorized pandas_udf — hashlib's C
      md5 per gram, numpy sliding-window min/argmin for the winnowing
      pass. The SQL form's per-window work is three interpreted
      ``slice`` allocations + two ``array_min`` scans + one
      ``array_position`` scan (Catalyst higher-order lambdas do not
      codegen); r12 stage metrics put it at 103 of the
      fingerprint_decontaminate stage's 110 CPU-seconds at the 10×
      tier. Python's ``str.split(' ')`` matches Spark's ``split`` with
      its default limit=-1 exactly (empties kept, '' → ['']), and
      ``int(md5hex[:15], 16)`` IS conv(substring(md5,1,15),16,10) —
      the bit-identity over the corpus + crafted edge docs is pinned in
      tests/test_pipeline_properties.py.
    - ``sql``: the pure-Catalyst form the DuckDB oracle mirrors —
      per-window min via slice+array_min, O(m·w) slice scans per doc
      (w is a small constant).
    """
    if impl == "arrow":
        from hashlib import md5 as _md5

        from numpy.lib.stride_tricks import sliding_window_view

        @F.pandas_udf("array<struct<fp: bigint, pos: int>>")
        def _winnow(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                words = t.split(" ")
                if len(words) < k:
                    grams = [t]
                else:
                    grams = [
                        " ".join(words[i:i + k])
                        for i in range(len(words) - k + 1)
                    ]
                gh = np.fromiter(
                    (
                        int(_md5(g.encode("utf-8")).hexdigest()[:15], 16)
                        for g in grams
                    ),
                    dtype=np.int64,
                    count=len(grams),
                )
                m = gh.size
                if m <= w:
                    am = int(gh.argmin())  # leftmost min, as array_position
                    out.append([(int(gh[am]), am + 1)])
                    continue
                sw = sliding_window_view(gh, w)
                mins = sw.min(axis=1)
                pos = np.arange(1, m - w + 2) + sw.argmin(axis=1)
                seen: set = set()
                sel = []
                for fp_, p_ in zip(mins.tolist(), pos.tolist()):
                    if (fp_, p_) not in seen:  # array_distinct semantics
                        seen.add((fp_, p_))
                        sel.append((fp_, p_))
                out.append(sel)
            return pd.Series(out)

        return (
            df.select(F.col(key), F.explode(_winnow(text_col)).alias("_s"))
            .select(
                key, F.col("_s.fp").alias("fp"), F.col("_s.pos").alias("pos")
            )
        )
    n = f"size(split({text_col}, ' '))"
    words = f"split({text_col}, ' ')"
    grams = (
        f"CASE WHEN {n} < {k} THEN array({text_col}) "
        f"ELSE transform(sequence(0, {n} - {k}), "
        f"i -> concat_ws(' ', slice({words}, i + 1, {k}))) END"
    )
    d = df.select(
        F.col(key),
        F.expr(
            f"transform({grams}, x -> "
            "cast(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT))"
        ).alias("_gh"),
    )
    m = "size(_gh)"
    wins = (
        f"CASE WHEN {m} <= {w} THEN array(struct("
        f"array_min(_gh) AS fp, "
        f"cast(array_position(_gh, array_min(_gh)) AS INT) AS pos)) "
        f"ELSE array_distinct(transform(sequence(1, {m} - {w} + 1), i -> "
        f"struct(array_min(slice(_gh, i, {w})) AS fp, "
        f"cast(i + array_position(slice(_gh, i, {w}), "
        f"array_min(slice(_gh, i, {w}))) - 1 AS INT) AS pos))) END"
    )
    return (
        d.select(key, F.explode(F.expr(wins)).alias("_s"))
        .select(key, F.col("_s.fp").alias("fp"), F.col("_s.pos").alias("pos"))
    )


# --- Gopher quality rules (r9) -----------------------------------------------------

# the published rule set's stop-word list (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", appendix A.1.1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality(
    df: DataFrame, text_col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021 §A.1.1) as a
    per-document metrics + verdict projection: word-count bounds, mean
    word length in [3, 10], symbol-to-word ratio ≤ 0.1, ≥ 80 % of words
    containing an alphabetic character, and ≥ 2 of the eight published
    stop words present. The symbol-to-word ratio follows the published
    rule's counting: symbol OCCURRENCES — each '#', each non-overlapping
    '...', and each unicode ellipsis '…' — over the raw text, divided by
    the word count (r9 advice: the earlier form counted affected WORDS,
    capped at one per word, and missed '…'; a doc with repeated in-word
    hashes or real ellipses now fails the rule as published). Emits
    every metric alongside the combined ``keep`` flag so downstream
    curation can re-threshold without recomputing (the same pattern as
    ``quality_score``).

    Determinism/scale: every metric is a Catalyst array lambda over the
    whitespace split — one projection, no shuffle, no UDF; the filter
    runs at scan speed on 100 TB. Ratios are exact-integer divisions
    rounded once; the keep comparisons run on the ROUNDED values so the
    SQL oracle replays them bit-for-bit."""
    d = df.select(
        F.col(key),
        F.col(text_col).alias("_t"),
        F.split(F.col(text_col), " ").alias("_w"),
    )
    n = F.size("_w")
    nd = F.greatest(n, F.lit(1)).cast("double")
    mean_len = F.round(
        F.expr(
            "aggregate(transform(_w, w -> cast(length(w) AS BIGINT)), "
            "0L, (a, x) -> a + x)"
        ) / nd,
        4,
    )
    # occurrence counts via replace-length deltas: exact integers, pure
    # codegen, and the identical arithmetic replays in DuckDB. '...' is
    # non-overlapping (replace semantics, = str.count); length() is
    # character-based in both engines so '…' counts as one.
    sym_count = F.expr(
        "cast(length(_t) - length(replace(_t, '#', '')) AS BIGINT)"
        " + (cast(length(_t) - length(replace(_t, '...', '')) AS BIGINT)"
        " div 3)"
        " + cast(length(_t) - length(replace(_t, '…', '')) AS BIGINT)"
    )
    sym_ratio = F.round(sym_count / nd, 4)
    alpha_ratio = F.round(
        F.size(F.expr("filter(_w, w -> w rlike '[A-Za-z]')")) / nd, 4
    )
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    stop_hits = F.size(F.expr(
        f"array_intersect(array_distinct(transform(_w, w -> lower(w))), "
        f"array({stops}))"
    ))
    out = d.select(
        key,
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("gopher_stopword_hits"),
    )
    return out.withColumn(
        "keep",
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN
        )
        & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA_RATIO)
        & (F.col("gopher_stopword_hits") >= GOPHER_MIN_STOPWORD_HITS),
    )
