"""Text analysis operators for training-data curation.

Language ID (stopword voting), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (min-gram rolling hash). All pure Catalyst expressions —
JVM-side, codegen'd, and SQL-expressible for the oracle. No model files,
no Python in the hot path.
"""

from __future__ import annotations

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
    d = d.withColumn(
        "punct_ratio",
        F.round(
            (
                F.length(text_col)
                - F.length(F.regexp_replace(text_col, "[^a-zA-Z0-9 ]", ""))
            )
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


def fingerprint(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Rolling-hash document fingerprint: min gram hash (1-permutation
    minhash) + content hash — compact identity for shard-level dedup."""
    from .dedup import with_grams

    return with_grams(df, text_col).select(
        key,
        F.expr("array_min(gram_hashes)").alias("fingerprint"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )
