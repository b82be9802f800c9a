"""Feature engineering: the hashing trick (Weinberger et al., ICML'09).

Fixed-dimension featurization of unbounded vocabularies — the standard
way to turn 100 TB of text into trainable sparse vectors without a
vocabulary build or a dictionary broadcast: each token hashes to a
dimension, with a second hash bit supplying a ±1 sign so collisions
cancel in expectation instead of biasing counts upward.

Hashing is the engine-wide md5-derived integer arithmetic, so the
featurizer is deterministic across runs/partitionings and a SQL oracle
replays every cell exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def feature_hashing(
    df: DataFrame, id_col: str, text_col: str = "text", dim: int = 64
) -> DataFrame:
    """Signed hashing-trick featurizer: sparse (id, dimension, value)
    rows with value = Σ_tokens sign(token) over tokens hashing to the
    dimension — exact integers, no vocabulary state.

    Plan: tokenize (pure Catalyst projection) → explode → ONE
    map-side-combinable groupBy on (id, dim). Output is sparse (zero
    cells absent); downstream dense assembly is a per-row
    ``map_from_entries`` away. No broadcast, no collect, no Python.
    """
    from .sampling import hash_mod_expr
    from .text import with_tokens

    toks = with_tokens(df, text_col).select(
        F.col(id_col), F.explode("tokens").alias("term")
    )
    return (
        toks.select(
            id_col,
            F.expr(hash_mod_expr("term", dim)).alias("dim"),
            (1 - 2 * F.expr(hash_mod_expr("concat(term, ':s')", 2)))
            .cast("long")
            .alias("sign"),
        )
        .groupBy(id_col, "dim")
        .agg(F.sum("sign").cast("long").alias("value"))
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    weights: list[int],
    text_col: str = "text",
    bias: int = 0,
    threshold: int = 0,
    scale: int = 1_000_000,
) -> DataFrame:
    """Model-based quality scoring: a linear classifier over hashing-trick
    features — the fastText-style filter every public curation recipe
    pairs with the heuristic rules (CCNet trains one against Wikipedia;
    the LLaMA recipe keeps pages it classifies as reference-like). The
    model is the (weights, bias) pair in FIXED-POINT integer units
    (1/``scale``), trained offline; scoring is
    score = bias + Σ_tokens sign(token) · w[h(token)] — exactly
    ``feature_hashing``'s signed cells dotted with w, fused so the
    per-(id, dim) materialization disappears.

    Plan: ``len(weights)`` must equal the hash dimension and is
    literal-bounded (a model you can broadcast is a model you can
    inline), so the weight vector is embedded as a plan-literal array —
    cheaper than a broadcast join: tokenize → explode → per-token
    ``element_at`` lookup (pure Catalyst) → ONE map-side-combinable
    groupBy(id). No join, no UDF, no collect; the single exchange
    carries (id, partial-sum) rows. All arithmetic is exact BIGINT;
    the only float op is the final display division, computed once on
    the rounded constant path both engines share.

    Returns (id, n_tokens, score_fp, score, keep): the exact
    fixed-point score, its float rendering, and the threshold verdict
    (score_fp >= threshold, both in fixed-point units). Token-less
    documents ARE classified (r11, advisor note: a plain explode
    silently dropped them, so a pipeline joining verdicts back lost
    empty docs instead of gating them): ``explode_outer`` keeps one
    NULL-term row per empty doc, which scores n_tokens=0,
    score_fp=bias — the model's prior, exactly what a linear
    classifier assigns a featureless input.
    """
    from .sampling import hash_mod_expr
    from .text import with_tokens

    dim = len(weights)
    warr = "array(" + ", ".join(f"{w}L" for w in weights) + ")"
    toks = with_tokens(df, text_col).select(
        F.col(id_col), F.explode_outer("tokens").alias("term")
    )
    signed = hash_mod_expr("concat(term, ':s')", 2)
    contrib = F.expr(
        f"cast(1 - 2 * ({signed}) AS BIGINT)"
        f" * element_at({warr}, cast(({hash_mod_expr('term', dim)}) + 1 AS INT))"
    )
    per_doc = toks.select(id_col, "term", contrib.alias("contrib")).groupBy(
        id_col
    ).agg(
        F.count("term").cast("long").alias("n_tokens"),
        (
            F.lit(bias).cast("long")
            + F.coalesce(F.sum("contrib"), F.lit(0).cast("long"))
        ).alias("score_fp"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "score_fp",
        F.round(F.col("score_fp") / F.lit(float(scale)), 6).alias("score"),
        (F.col("score_fp") >= F.lit(threshold)).alias("keep"),
    )
