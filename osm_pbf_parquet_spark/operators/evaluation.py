"""Model/label evaluation operators for training-data pipelines:
distributed ROC-AUC, Cohen's kappa (inter-annotator agreement),
calibration (reliability) bins, and per-group Welch's t-test for A/B
experiment readouts.

Reference context: the reference engine validates transcode output with
a differential checker (``osm-pbf-parquet/test/validate.py:57-217``);
these operators generalize that "score the produced labels against a
reference" capability into reusable, exactly-oracled evaluation
primitives a curation pipeline runs at corpus scale (did the lang-id
model agree with the annotators? is the quality classifier calibrated?
did the A/B arm move the metric?).

Determinism: every operator reduces the data to EXACT integer
sufficient statistics (BIGINT / decimal(38,0) sums of pre-scaled
values) before any floating-point division, so results are
IEEE-deterministic and order-independent — the DuckDB oracles match
value-hash-exactly, not within tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["roc_auc", "cohens_kappa", "calibration_bins", "welch_ttest"]


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    coarse_width: int = 1024,
) -> DataFrame:
    """Exact ROC-AUC by rank statistics, distributed with no global sort.

    ``score_col`` must be an INTEGER score (callers scale floats
    deterministically, e.g. ``floor((s+1)*500000)`` — the bounded score
    domain is what makes the prefix structure data-size independent);
    ``label_col`` is 0/1. Uses the pair-counting identity

        AUC = (C + T/2) / (npos * nneg)
            = (2C + T) / (2 * npos * nneg)

    with C the count of (pos, neg) pairs where score_pos > score_neg and
    T the tied pairs. Both come from per-distinct-score (pos, neg)
    counts plus a prefix sum of negatives over ascending score. Rows
    with a NULL score or label are EXCLUDED up front (a NULL score has
    no rank; without the filter the NULL bucket key would silently
    vanish at the offsets join and undercount n).

    Scale: one groupBy collapses the corpus to ≤ |score domain| rows.
    The prefix sum is TWO-LEVEL — a window over coarse buckets
    (score div coarse_width: domain-bounded row count, NOT data-bounded)
    plus a per-bucket local window of ≤ coarse_width rows — so no
    single-partition window ever sees more than ``coarse_width`` rows
    regardless of corpus size. Pair counts are computed AND summed in
    decimal (operands cast before the multiply): 2C ≤ n²/2 wraps int64
    past n ≈ 6·10⁹; decimal(38,0) carries to n ≈ 10¹⁸ rows.
    """
    w = int(coarse_width)
    df = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    s = (
        df.groupBy(F.col(score_col).cast("long").alias("_s"))
        .agg(
            F.sum(F.col(label_col).cast("long")).alias("_pos"),
            (F.count(F.lit(1)) - F.sum(F.col(label_col).cast("long"))).alias(
                "_neg"
            ),
        )
        # FLOOR division (pmod remainder is non-negative), not `div`'s
        # truncate-toward-zero: buckets stay monotone for negative scores
        .withColumn("_b", F.expr(f"(_s - pmod(_s, {w})) div {w}"))
    )
    bucket_tot = s.groupBy("_b").agg(F.sum("_neg").alias("_bneg"))
    # domain-sized window: one row per coarse bucket, never over data
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "_b", F.coalesce(F.sum("_bneg").over(wb), F.lit(0)).alias("_boff")
    )
    wl = Window.partitionBy("_b").orderBy("_s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_cum = (
        s.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_cumneg",
            F.coalesce(F.sum("_neg").over(wl), F.lit(0)) + F.col("_boff"),
        )
    )
    # cast operands to decimal BEFORE multiplying: pos·cumneg wraps int64
    # past n ≈ 6·10⁹ even though each factor fits (the per-term product,
    # not just the sum, must leave the int64 domain). decimal(19,0)
    # operands → decimal(38,0) products: exact to n ≈ 10¹⁸ rows.
    d19 = "decimal(19,0)"
    agg = with_cum.agg(
        F.sum(
            F.lit(2).cast(d19) * F.col("_pos").cast(d19)
            * F.col("_cumneg").cast(d19)
            + F.col("_pos").cast(d19) * F.col("_neg").cast(d19)
        ).alias("_c2t"),
        F.sum("_pos").cast("long").alias("npos"),
        F.sum("_neg").cast("long").alias("nneg"),
    )
    return agg.select(
        (F.col("npos") + F.col("nneg")).alias("n"),
        "npos",
        "nneg",
        # degenerate corpora (a single class) have no defined AUC: NULL,
        # not an IEEE Inf/NaN that would poison downstream aggregates
        F.when(
            (F.col("npos") > 0) & (F.col("nneg") > 0),
            F.round(
                F.col("_c2t").cast("double")
                / (
                    F.lit(2).cast("double")
                    * F.col("npos").cast("double")
                    * F.col("nneg").cast("double")
                ),
                9,
            ),
        ).alias("auc"),
    )


def cohens_kappa(df: DataFrame, a: str, b: str) -> DataFrame:
    """Cohen's kappa between two categorical label columns (e.g. a
    human-annotated language vs the lang-id model's prediction).

    With N the row count, D the diagonal (agreement) count and
    S = Σ_k row_k·col_k the chance-agreement cross term over categories,

        kappa = (p_o − p_e) / (1 − p_e) = (N·D − S) / (N² − S)

    — numerator and denominator exact BIGINTs (valid to N ≈ 3·10⁹, same
    bound as ``quality.chi_square_cells``; shard beyond), one final
    float division. Scale: two map-side-combinable groupBys over the
    data produce category-bounded marginal tables; the cross term is a
    join of those two tiny tables — never a shuffle of the corpus
    beyond the two aggs. Rows where either rater's label is NULL are
    EXCLUDED (an unlabeled item is not an agreement sample; keeping
    them would deflate p_o through never-true NULL equality).
    """
    df = df.where(F.col(a).isNotNull() & F.col(b).isNotNull())
    n_agree = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col(a) == F.col(b), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("agree"),
    )
    ra = df.groupBy(F.col(a).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_r")
    )
    cb = df.groupBy(F.col(b).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    cross = (
        ra.join(cb, "_k", "inner")  # absent categories contribute 0
        .agg(F.coalesce(F.sum(F.col("_r") * F.col("_c")), F.lit(0))
             .cast("long").alias("_s"))
    )
    joined = n_agree.crossJoin(F.broadcast(cross))  # 1×1 rows
    # degenerate input (either rater constant => N² == S) has no defined
    # kappa: NULL, not an ANSI DIVIDE_BY_ZERO abort
    den = (F.col("n") * F.col("n") - F.col("_s")).cast("double")
    return joined.select(
        "n",
        "agree",
        F.when(
            den != 0,
            F.round(
                (F.col("n") * F.col("agree") - F.col("_s")).cast("double")
                / den,
                9,
            ),
        ).alias("kappa"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier: bucket a
    pre-scaled integer score (``score_col`` in [0, scale]) into ``bins``
    equal-width bins and report per-bin count, empirical positive rate,
    and mean predicted score — the calibration curve's points.

    Exactness: the bin id is ``least(score·bins div scale, bins−1)`` —
    exact equal-width edges for ANY (scale, bins), including when
    ``bins`` does not divide ``scale`` (the naive ``score div
    (scale//bins)`` silently widens the top bin by the remainder). The
    score sum is integer arithmetic; the two divisions (pos/n,
    sum/(n·scale)) are single IEEE ops on exact inputs. Scale: ONE
    map-side-combinable groupBy with ``bins`` output rows; nothing else
    touches the data. NULL scores/labels are excluded (same policy as
    ``roc_auc`` — a NULL score has no bin). Requires scale·bins < 2⁶³
    so the bin product cannot wrap (raises otherwise).
    """
    if scale * bins >= 2**63:
        raise ValueError(
            f"scale*bins must stay below 2^63 for exact integer bin "
            f"edges; got scale={scale}, bins={bins}"
        )
    df = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    b = F.least(
        F.expr(f"cast({score_col} as bigint) * {bins} div {scale}"),
        F.lit(bins - 1),
    ).cast("int")
    out = df.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("positives"),
        # decimal sum: a BIGINT sum of scale-sized scores wraps past
        # ~9·10¹⁸/scale rows per bin; decimal(38,0) never will
        F.sum(F.col(score_col).cast("decimal(19,0)")).alias("_ssum"),
    )
    return out.select(
        "bin",
        "n",
        "positives",
        F.round(
            F.col("positives").cast("double") / F.col("n").cast("double"), 9
        ).alias("pos_rate"),
        F.round(
            F.col("_ssum").cast("double")
            / (F.col("n").cast("double") * F.lit(float(scale))),
            9,
        ).alias("mean_score"),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    arm_col: str,
    value_scaled_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group Welch's unequal-variance t-test between arms 0 and 1 of
    an experiment (arm assignment is the caller's deterministic hash —
    see ``sampling.hash_mod_expr``). ``value_scaled_col`` is the metric
    pre-scaled to BIGINT (v·scale); squares are formed on decimal(19,0)
    operands, so any int64-ranged input is exact — no overflow bound.

    ONE map-side-combinable groupBy produces exact per-arm sufficient
    statistics (n, Σv, Σv² — sums in decimal(38,0), overflow-raising
    rather than wrapping); means, variances, the t statistic and the
    Welch–Satterthwaite df are then scalar float ops on exact inputs,
    identical either engine. Degenerate groups degrade to NULLs, never
    errors: an empty arm → NULL mean, a singleton arm → NULL t/df, and
    two zero-variance arms → NULL t/df (0/0 is undefined).
    """
    dec = "decimal(38,0)"
    v = F.col(value_scaled_col).cast("long")
    # square on decimal operands: v*v in int64 wraps silently past |v| ~ 3e9
    vq = F.col(value_scaled_col).cast("decimal(19,0)")
    sq = vq * vq
    is1 = F.col(arm_col) == 1
    agg = df.groupBy(group_col).agg(
        F.sum(F.when(~is1, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1"),
        F.coalesce(F.sum(F.when(~is1, v).cast(dec)), F.lit(0).cast(dec))
        .alias("_s0"),
        F.coalesce(F.sum(F.when(is1, v).cast(dec)), F.lit(0).cast(dec))
        .alias("_s1"),
        F.coalesce(F.sum(F.when(~is1, sq).cast(dec)), F.lit(0).cast(dec))
        .alias("_q0"),
        F.coalesce(F.sum(F.when(is1, sq).cast(dec)), F.lit(0).cast(dec))
        .alias("_q1"),
    )
    sc = F.lit(float(scale))
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    # every division is WHEN-guarded: under Spark 4's default ANSI mode a
    # single empty/singleton/zero-variance arm would otherwise abort the
    # WHOLE query with DIVIDE_BY_ZERO (CaseWhen short-circuits, so the
    # guarded branch never evaluates); DuckDB yields NULL for the same
    # divisions, so guard-to-NULL is also what keeps oracle parity
    mean0 = F.when(F.col("n0") > 0, F.col("_s0").cast("double") / (n0d * sc))
    mean1 = F.when(F.col("n1") > 0, F.col("_s1").cast("double") / (n1d * sc))
    # sample variance in ORIGINAL units: (Σv² − (Σv)²/n) / (n−1) / scale²
    var0 = F.when(
        F.col("n0") > 1,
        (
            F.col("_q0").cast("double")
            - F.col("_s0").cast("double") * F.col("_s0").cast("double") / n0d
        ) / ((n0d - F.lit(1.0)) * sc * sc),
    )
    var1 = F.when(
        F.col("n1") > 1,
        (
            F.col("_q1").cast("double")
            - F.col("_s1").cast("double") * F.col("_s1").cast("double") / n1d
        ) / ((n1d - F.lit(1.0)) * sc * sc),
    )
    se0 = var0 / n0d  # NULL-propagating, n0 > 1 inside the guard
    se1 = var1 / n1d
    sesum = se0 + se1
    # zero-variance-both-arms has no defined t (0/0): NULL, not a crash.
    # A NULL sesum makes the condition NULL -> else-branch NULL, so the
    # ok-guard composes with the variance guards.
    ok = (F.col("n0") > 1) & (F.col("n1") > 1)
    t = F.when(ok & (sesum > 0), (mean0 - mean1) / F.sqrt(sesum))
    dof = F.when(
        ok & (sesum > 0),
        sesum * sesum
        / (
            se0 * se0 / (n0d - F.lit(1.0))
            + se1 * se1 / (n1d - F.lit(1.0))
        ),
    )
    return agg.select(
        group_col,
        "n0",
        "n1",
        F.round(mean0, 9).alias("mean0"),
        F.round(mean1, 9).alias("mean1"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_df"),
    )


# --- ranking quality ---------------------------------------------------------

NDCG_SCALE = 2**40
# 1/log2(p+1) discount at positions 1..k, pre-scaled to exact BIGINTs.
# Both the Spark plan and the SQL oracle consume the SAME literal table,
# so DCG is a pure integer dot product — no libm log in either engine.


def ndcg_discounts(k: int) -> list[int]:
    import math

    return [round(NDCG_SCALE / math.log2(p + 1)) for p in range(1, k + 1)]


def ndcg_at_k(
    scored: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query nDCG@k — the standard ranking-quality metric for the
    engine's retrieval operators (BM25, ANN, hybrid RRF).

    ``scored`` has one row per (query, candidate item) with the system's
    ``score_col`` and the ground-truth ``rel_col`` gain; both must be
    integral so ranking and DCG are exact. Two row_number windows over
    the SAME partition key (one shuffle): the system ranking
    (score DESC, item ASC) and the ideal ranking (relevance DESC,
    item ASC). DCG@k = Σ rel·D[pos] with D the pre-scaled integer
    discount table (``ndcg_discounts``), so per-query DCG/IDCG are
    exact BIGINTs and nDCG is reported as an integer permille
    (1000·DCG div IDCG) — bit-reproducible, value-hash oracle-able.

    Queries whose top-k ideal relevance is all zero return NULL
    ndcg_permille (0/0). Overflow bound: k·max_rel·2⁴⁰ < 2⁶³ → max_rel
    ≲ 8·10⁵ at k=10; pre-bucket coarser gains if above.

    Scale: windows partition by query id — query-parallel, no global
    sort, no join. Returns (query, dcg_scaled, idcg_scaled,
    ndcg_permille).
    """
    disc = ndcg_discounts(k)
    arr = "array(" + ", ".join(f"{d}L" for d in disc) + ")"
    sys_w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(item_col).asc()
    )
    ideal_w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(item_col).asc()
    )
    ranked = scored.select(
        query_col,
        F.col(rel_col).cast("long").alias("__rel"),
        F.row_number().over(sys_w).alias("__rn"),
        F.row_number().over(ideal_w).alias("__rr"),
    )
    gain = ranked.groupBy(query_col).agg(
        F.sum(
            F.when(
                F.col("__rn") <= k,
                F.col("__rel") * F.expr(f"element_at({arr}, __rn)"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("dcg_scaled"),
        F.sum(
            F.when(
                F.col("__rr") <= k,
                F.col("__rel") * F.expr(f"element_at({arr}, __rr)"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("idcg_scaled"),
    )
    return gain.select(
        query_col,
        "dcg_scaled",
        "idcg_scaled",
        F.when(
            F.col("idcg_scaled") > 0,
            F.expr("(1000 * dcg_scaled) div idcg_scaled"),
        )
        .cast("long")
        .alias("ndcg_permille"),
    )
