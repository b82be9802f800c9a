"""Skew-mitigation operators for 100 TB-scale aggregation.

Spark's map-side partial aggregation already neutralizes key skew for
algebraic aggregates (sum/count/min/max): every partition contributes one
partial row per key regardless of row skew. The aggregate that does NOT
partial-combine is ``count(DISTINCT x)`` — all distinct values of a hot
key land on one reducer. ``salted_distinct_count`` restores two-phase
behavior by partitioning the *value space* with a hash salt:

  stage 1: groupBy(key, pmod(hash(x), n_salts)).agg(count_distinct(x))
  stage 2: groupBy(key).agg(sum(partial))

Correct because the salt buckets are disjoint slices of x's value space —
the same x always lands in the same bucket, and distinct counts over a
disjoint partition add up exactly. The hot key's distinct work now spreads
over ``n_salts`` reducers.

For skewed *joins*, AQE's skew-join split (``spark.sql.adaptive.
skewJoin.enabled``, on by default in this engine's session) is the
built-in answer; no hand-rolled salting needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SALTS = 16


def salted_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    out_col: str | None = None,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Exact ``count(DISTINCT distinct_col)`` per group, skew-proof.

    Two shuffles instead of one, but the first is on
    (group, salt) — ``n_salts``× the parallelism on hot groups — and the
    second moves only ``n_salts`` partial rows per group.
    """
    out_col = out_col or f"n_distinct_{distinct_col}"
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*group_cols, F.col(distinct_col), salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))


def salted_collect_set(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Skew-proof ``collect_set``: per-(group, salt) partial sets, then a
    flatten-distinct merge. The hot group's set is built by ``n_salts``
    reducers instead of one; the merge moves sets, not rows."""
    out_col = out_col or f"{value_col}_set"
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*group_cols, F.col(value_col), salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.collect_set(value_col).alias("_pset"))
    )
    return partial.groupBy(*group_cols).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_pset")))
        ).alias(out_col)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    tiebreak_col: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Hand-rolled salted replicated join for the case AQE's skew split
    can't reach: a statically-planned shuffle join whose hot fact keys
    exceed one reducer even after split (or AQE disabled/unavailable —
    e.g. inside a statically-compiled stage of a larger pipeline).

    fact rows scatter across ``n_salts`` sub-keys via a DETERMINISTIC
    hash of a per-row tiebreak column (md5-derived — no rand(), so
    retried/recomputed tasks place rows identically, which
    non-deterministic salting violates under Spark's task-retry model);
    the dim side replicates ``n_salts``× (explode of a literal range —
    dim must tolerate the blow-up, i.e. be ≪ fact). Join keys become
    (key, salt): the hot key's rows now land on ``n_salts`` reducers.
    Semantically IDENTICAL to the plain join — every fact row still
    meets every matching dim row exactly once.

    Join strategy is hinted shuffle-hash: broadcasting the replicated
    dim would collapse the salting back into one stream per fact
    partition (fine, but then you didn't need salt); the hint keeps the
    demonstration honest and the plan shape stable."""
    from .sampling import hash_mod_expr

    salted_fact = fact.withColumn(
        "_salt",
        # coalesce: a NULL tiebreak must still salt (to bucket 0), not
        # NULL out the join key and silently drop the row
        F.expr(
            "coalesce("
            + hash_mod_expr(f"cast({tiebreak_col} AS string)", n_salts)
            + ", 0)"
        ),
    )
    replicated_dim = dim.select(
        "*",
        F.explode(F.expr(f"sequence(0, {n_salts - 1})")).alias("_salt"),
    )
    return (
        salted_fact.join(
            replicated_dim.hint("shuffle_hash"), [key, "_salt"]
        )
        .drop("_salt")
    )
