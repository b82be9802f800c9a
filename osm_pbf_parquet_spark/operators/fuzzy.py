"""Fuzzy string matching: blocked edit-distance similarity joins.

Entity-resolution style candidate generation + exact Levenshtein
verification, the string analog of the MinHash-LSH pipeline in
``dedup.py``: a cheap blocking key bounds the quadratic step to
within-block pairs, a lossless length-difference prefilter (edit
distance ≥ |len(a) − len(b)|) cuts candidates before the distance
kernel runs, and the distance itself is Spark's built-in ``levenshtein``
— JVM-side, whole-stage-codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocked_levenshtein_topk(
    df: DataFrame,
    key: str,
    name: str,
    block: str,
    k: int = 25,
    max_len_diff: int = 15,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Top-k most-similar within-block pairs by edit distance.

    Contract: candidate pairs are generated WITHIN ``block`` values only
    (the standard entity-resolution blocking trade-off — cross-block
    near-matches are out of scope by design, exactly like LSH banding);
    within a block, results are exact. The length prefilter is lossless
    for any pair whose distance ≤ ``max_len_diff`` because Levenshtein
    is bounded below by the length difference.

    Scale: one shuffle on the blocking key co-locates each block, the
    self-join is quadratic ONLY within a block (choose blocks with
    bounded cardinality — brand, type, sorted-token prefix…), and the
    global top-k lowers to TakeOrderedAndProject (per-partition heaps,
    no global sort). Ties break on (distance, key₁, key₂) so the result
    set is unique.

    BOUND: the bounded-block contract is the caller's to honor — a
    skewed blocking key silently goes quadratic. Pass
    ``max_block_rows`` to make that loud instead: the plan audits block
    cardinalities (one extra map-side-combinable count on the blocking
    key) and the job FAILS naming the offending block if any exceeds
    the cap, the same raise-don't-degrade treatment ``basket_pairs``'
    mega-basket guard uses. Candidate volume is then
    ≤ n_blocks·cap²/2 by construction. Default None preserves the
    documented contract for curated blocking keys.

    ``key`` may be any orderable type (numeric id, uuid string…) but
    must be unique — the ``key_1 < key_2`` pair dedup and the tiebreak
    rely on it; the column keeps its native type in the output.

    Returns (key_1, key_2, name_1, name_2, distance).
    """
    a = df.select(
        F.col(key).alias("key_1"),
        F.col(name).alias("name_1"),
        F.col(block).alias("__b"),
    )
    if max_block_rows is not None:
        sizes = a.groupBy("__b").agg(
            F.count("*").cast("long").alias("_bn")
        )
        a = (
            a.join(sizes, "__b")
            .where(
                F.assert_true(
                    F.col("_bn") <= F.lit(max_block_rows),
                    F.concat(
                        F.lit("blocked_levenshtein_topk: block "),
                        F.col("__b").cast("string"),
                        F.lit(" has "),
                        F.col("_bn").cast("string"),
                        F.lit(
                            f" rows > max_block_rows={max_block_rows}; "
                            "the within-block self-join would go "
                            "quadratic — choose a finer blocking key"
                        ),
                    ),
                ).isNull()
            )
            .drop("_bn")
        )
    b = df.select(
        F.col(key).alias("key_2"),
        F.col(name).alias("name_2"),
        F.col(block).alias("__b"),
    )
    pairs = (
        a.join(b, "__b")
        .filter(F.col("key_1") < F.col("key_2"))
        .filter(
            F.abs(F.length("name_1") - F.length("name_2")) <= max_len_diff
        )
        .select(
            "key_1", "key_2", "name_1", "name_2",
            F.levenshtein("name_1", "name_2").cast("int").alias("distance"),
        )
    )
    return pairs.orderBy("distance", "key_1", "key_2").limit(k)
