"""Count-min-sketch heavy hitters — approximate frequent-item counting
whose memory is O(d·w) regardless of corpus size.

At 100 TB exact token counts need a full-cardinality shuffle; a CMS
keeps d×w integer counters (here 3×1024) that merge associatively, so
the sketch build is ONE map-side-combinable aggregation over (row, hash)
pairs and the estimate for any item is min over d counters. Estimates
never undercount (est ≥ true) and overcount by at most εN with high
probability (ε ≈ e/w).

Hashing is md5-derived integer arithmetic (same idiom as the dedup
seeds), so the whole sketch — buckets, counters, estimates — is
bit-reproducible in ANSI SQL for the oracle: the gate checks REPLAY the
sketch, they don't trust it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 3
CMS_WIDTH = 1024


def _bucket_expr(term_col: str, j: str | int, width: int) -> str:
    """Deterministic row-j hash bucket: the engine-wide md5 hash
    (sampling.hash_mod_expr) keyed on 'term:j'."""
    from .sampling import hash_mod_expr

    return hash_mod_expr(
        f"concat({term_col}, ':', cast({j} AS string))", width
    )


def cms_heavy_hitters(
    df: DataFrame, text_col: str = "text", k: int = 10,
    depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
    cache=None,
) -> DataFrame:
    """Build a count-min sketch over the corpus tokens, then audit it
    against the exact top-``k``: one row per frequent token with its true
    count, the CMS estimate, and ``never_undercounts`` (est ≥ true —
    guaranteed by construction, pinned TRUE under the gate).

    Plan: token explode → ONE keyed groupBy into per-term counts (the
    only corpus-sized shuffle; persisted, but it's vocabulary-sized, not
    corpus-sized). The exact top-k cut AND the sketch both derive from
    that frame — the sketch counter for (j, bucket) is the SUM of term
    counts hashing there, identical to counting raw token rows but over
    distinct terms only (no corpus-sized cache, no second tokenize).
    The estimate join touches only k×depth rows."""
    from .text import with_tokens

    from ..functions.caching import owned_set, tie_release

    toks = with_tokens(df, text_col).select(
        F.explode("tokens").alias("term")
    )
    ps, owned = owned_set(cache)
    # vocabulary-sized; feeds both the top-k cut and the sketch build;
    # unpersisted via `cache` or when the result is dropped
    exact = ps.persist(toks.groupBy("term").agg(F.count("*").alias("true_n")))
    top = exact.orderBy(F.desc("true_n"), "term").limit(k)

    rows = exact.select(
        "term", "true_n",
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("j"),
    ).withColumn("bucket", F.expr(_bucket_expr("term", "j", width)))
    sketch = rows.groupBy("j", "bucket").agg(F.sum("true_n").alias("c"))

    probes = top.select(
        "term", "true_n",
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("j"),
    ).withColumn("bucket", F.expr(_bucket_expr("term", "j", width)))
    est = (
        probes.join(sketch, ["j", "bucket"])
        .groupBy("term", "true_n")
        .agg(F.min("c").alias("est_n"))
    )
    return tie_release(
        est.select(
            "term",
            F.col("true_n").cast("long"),
            F.col("est_n").cast("long"),
            (F.col("est_n") >= F.col("true_n")).alias("never_undercounts"),
        ),
        ps, owned,
    )
