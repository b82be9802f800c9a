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
