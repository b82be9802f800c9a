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

from pyspark.sql import DataFrame, Window
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


# --- HyperLogLog distinct counting -------------------------------------------

HLL_P = 8  # 2^8 = 256 registers
HLL_HASH_BITS = 60  # md5-derived hash width (sampling.hash_mod_expr idiom)
# Flajolet et al. 2007 bias constant for m >= 128, computed HERE in Python
# and injected as the same double literal into the Spark plan and the SQL
# oracle — decimal-literal arithmetic inside an engine (DuckDB treats
# `0.7213/(1+1.079/256)` as DECIMAL) rounds differently than double math.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)


def hll_distinct(
    df: DataFrame, key_col: str, p: int = HLL_P
) -> DataFrame:
    """HyperLogLog distinct-count: one row with the HLL estimate, the
    exact count, and the sketch's integer checksum.

    At 100 TB an exact COUNT(DISTINCT key) shuffles every distinct key;
    the HLL register build is ONE map-side-combinable aggregation into
    2^p integer registers (here 256) — constant memory, associative
    merge, the same plan shape Spark's own approx_count_distinct lowers
    to. This implementation is deterministic md5-derived arithmetic so
    the DuckDB oracle REPLAYS the sketch bit-for-bit (register checksum
    compared as an exact BIGINT, not a tolerance):

    - h   = 60-bit md5 hash of the key (engine-wide idiom)
    - bucket = h mod 2^p; w = h div 2^p  (a (60-p)-bit substream)
    - rank   = (60-p) - bit_length(w) + 1, i.e. leading zeros + 1;
      w = 0 → rank (60-p)+1
    - register[bucket] = max rank over the bucket's keys; untouched
      buckets hold 0
    - indicator sum  Z⁻¹ = Σ 2^(-register) is kept SCALED BY 2^53 so it
      is an exact integer — double addition order across 256 buckets
      would otherwise vary between engines
    - raw estimate   = alpha · m² / Z⁻¹, with the standard small-range
      linear-counting correction (V = empty registers).
    """
    regs = hll_rank_projection(df, key_col, p).groupBy("bucket").agg(
        F.max("rank").alias("r")
    )
    exact = df.agg(
        F.countDistinct(key_col).cast("long").alias("exact_distinct")
    )
    return hll_finish(regs, exact, p)


def hll_rank_projection(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """The sketch's map side: (bucket, rank) per row — a pure projection
    that runs UNCHANGED on a batch frame or a stream (the streaming gate
    feeds it to a complete-mode max aggregation; streaming/batch
    unification for sketches). Thin wrapper over the grouped projection
    with a constant group, so the parity-critical bucket/rank formula
    exists exactly once."""
    return hll_rank_projection_by(
        df.withColumn("_hll_g", F.lit(0)), "_hll_g", key_col, p
    ).drop("grp")


def hll_finish(regs: DataFrame, exact: DataFrame, p: int = HLL_P) -> DataFrame:
    """The sketch's reduce tail over the ≤2^p aggregated registers
    (bucket, r): spine fill, exact-integer indicator sum, estimate with
    the linear-counting small-range correction. Bounded frames only."""
    m = 1 << p
    spark = regs.sparkSession
    # fill untouched buckets with rank 0 via a register-spine broadcast
    spine = spark.range(m).select(F.col("id").alias("bucket"))
    full = spine.join(F.broadcast(regs), "bucket", "left").select(
        "bucket", F.coalesce("r", F.lit(0)).alias("r")
    )
    # scaled indicator: 2^(53-r) is an exact BIGINT for r in [0, 53];
    # rank max = 53 exactly at p=8, so the scale covers the full range
    agg = full.agg(
        F.sum(F.expr("cast(pow(2.0, 53 - r) AS BIGINT)")).alias("z_scaled"),
        F.sum(F.expr("CASE WHEN r = 0 THEN 1 ELSE 0 END")).alias("v_empty"),
    )
    est_raw = f"{HLL_ALPHA!r} * {m} * {m} * cast({1 << 53} AS DOUBLE) / z_scaled"
    return (
        agg.crossJoin(F.broadcast(exact))
        .select(
            F.col("z_scaled").cast("long"),
            F.col("v_empty").cast("long"),
            "exact_distinct",
            F.expr(
                # linear-counting small-range correction (HLL standard)
                f"round(CASE WHEN ({est_raw}) <= 2.5 * {m} AND v_empty > 0 "
                f"THEN {m} * ln(cast({m} AS DOUBLE) / v_empty) "
                f"ELSE ({est_raw}) END, 6)"
            ).alias("hll_estimate"),
        )
    )


def hll_distinct_by(
    df: DataFrame, group_col: str, key_col: str, p: int = HLL_P
) -> DataFrame:
    """Grouped HyperLogLog: one distinct-count estimate PER GROUP — the
    sketch shape a 100 TB rollup actually needs (distinct users per
    product, distinct domains per language) where per-group exact
    COUNT(DISTINCT) would shuffle every (group, key) pair.

    Same bit-exact register arithmetic as ``hll_distinct`` (the oracle
    replays z_scaled per group as an exact BIGINT), but the reduce tail
    avoids the register-spine join: untouched buckets all hold rank 0,
    so z_scaled = Σ_present 2^(53-r) + (m − present)·2^53 and
    v_empty = m − present follow from ONE groupBy over present buckets
    (every present bucket has rank ≥ 1 by construction). Cost: one
    map-side-combinable agg to (group, bucket) registers — ≤ m rows per
    group — then one group-sized agg. The exact count here is gate
    instrumentation; at scale you'd drop it."""
    m = 1 << p
    regs = (
        hll_rank_projection_by(df, group_col, key_col, p)
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("r"))
    )
    agg = regs.groupBy("grp").agg(
        (
            F.sum(F.expr("cast(pow(2.0, 53 - r) AS BIGINT)"))
            + (F.lit(m) - F.count("*")) * F.lit(1 << 53)
        ).alias("z_scaled"),
        (F.lit(m) - F.count("*")).alias("v_empty"),
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(key_col).cast("long").alias("exact_distinct")
    )
    est_raw = (
        f"{HLL_ALPHA!r} * {m} * {m} * cast({1 << 53} AS DOUBLE) / z_scaled"
    )
    return (
        agg.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("z_scaled").cast("long"),
            F.col("v_empty").cast("long"),
            "exact_distinct",
            F.expr(
                f"round(CASE WHEN ({est_raw}) <= 2.5 * {m} AND v_empty > 0 "
                f"THEN {m} * ln(cast({m} AS DOUBLE) / v_empty) "
                f"ELSE ({est_raw}) END, 6)"
            ).alias("hll_estimate"),
        )
        .orderBy(group_col)
    )


def hll_rank_projection_by(
    df: DataFrame, group_col: str, key_col: str, p: int = HLL_P
) -> DataFrame:
    """(grp, bucket, rank) per row — THE single definition of the
    parity-critical bucket/rank formula (``hll_rank_projection`` wraps
    it with a constant group; the DuckDB oracles replay it verbatim)."""
    from .sampling import hash_mod_expr

    m = 1 << p
    sub_bits = HLL_HASH_BITS - p
    h = hash_mod_expr(f"cast({key_col} AS string)", 1 << HLL_HASH_BITS)
    return df.select(
        F.col(group_col).alias("grp"),
        F.expr(f"({h}) % {m}").alias("bucket"),
        F.expr(f"({h}) div {m}").alias("w"),
    ).withColumn(
        "rank",
        F.expr(
            f"CASE WHEN w = 0 THEN {sub_bits + 1} "
            f"ELSE {sub_bits} - length(bin(w)) + 1 END"
        ),
    ).drop("w")


# --- equi-width histogram quantiles ------------------------------------------

HIST_BINS = 1024


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    bins: int = HIST_BINS,
) -> DataFrame:
    """Scalable approximate quantiles from a fixed-width histogram — the
    two-pass alternative to a full sort when percentiles of a 100 TB
    column are needed: pass 1 min/max, pass 2 one map-side-combinable
    count per bin, then linear interpolation inside the covering bin.
    Bin counts are exact BIGINTs and every float step (bin assignment,
    interpolation) is per-row/per-bin double math with no cross-row
    float accumulation, so a SQL oracle replays it exactly.

    Returns one row per requested quantile: (q, est). Estimator: the
    smallest bin whose cumulative count reaches q·N, then
    ``lo + (q·N − cum_before)/bin_count · width`` interpolated within
    it; q=0 is special-cased to the exact minimum (the covering-bin
    predicate ``q·N > cum_before`` can never match at zero). Quantiles
    outside [0, 1] raise. The bin spine (≤ ``bins`` rows) is the only
    windowed frame — dimension-sized, never over data."""
    bad = [q for q in quantiles if not (0.0 <= float(q) <= 1.0)]
    if bad:
        raise ValueError(f"quantiles must lie in [0, 1]; got {bad}")
    spark = df.sparkSession
    vals = df.select(F.col(value_col).cast("double").alias("x")).where(
        F.col("x").isNotNull()
    )
    rng = vals.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"),
        F.count("*").alias("n"),
    )
    binned = (
        vals.crossJoin(F.broadcast(rng))
        .select(
            F.expr(
                f"CASE WHEN hi = lo THEN 0 ELSE "
                f"least({bins} - 1, cast(floor((x - lo) / (hi - lo) "
                f"* {bins}) AS INT)) END"
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    filled = spine.join(F.broadcast(binned), "bin", "left").select(
        "bin", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = filled.select(
        "bin", "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
    ).withColumn("cum", F.col("cum_before") + F.col("cnt"))
    qs = spark.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    # covering bin: cum_before < qN <= cum (bin therefore non-empty);
    # q=0 anchors on the bin-0 spine row (always present) and emits lo
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(rng))
        .where(
            (
                (F.expr("q * n") > F.col("cum_before"))
                | ((F.col("q") == 0.0) & (F.col("bin") == 0))
            )
            & (F.expr("q * n") <= F.col("cum"))
        )
    )
    return hit.select(
        "q",
        F.expr(
            "round(CASE WHEN hi = lo THEN lo WHEN q = 0.0 THEN lo ELSE "
            f"lo + (cast(bin AS DOUBLE) + (q * n - cum_before) / cnt) "
            f"* ((hi - lo) / {bins}) END, 6)"
        ).alias("est"),
    )


# --- Poisson bootstrap --------------------------------------------------------

import math as _math

BOOT_B = 32  # resamples
# Poisson(1) CDF thresholds, Python-computed once and injected as the
# same double literals into the Spark plan and the SQL oracle
_POIS_CDF = []
_acc = 0.0
for _k in range(9):
    _acc += _math.exp(-1) / _math.factorial(_k)
    _POIS_CDF.append(_acc)


def _poisson_weight_case(u_expr: str) -> str:
    """Inverse-CDF Poisson(1) draw from a uniform expression: the CASE
    chain is exact literal comparisons — no RNG, no transcendentals at
    run time."""
    branches = " ".join(
        f"WHEN {u_expr} < {c!r} THEN {k}"
        for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 9 END"


def poisson_bootstrap_mean(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_resamples: int = BOOT_B,
    scale: int = 100,
) -> DataFrame:
    """Bootstrap distribution of a mean at corpus scale via the POISSON
    bootstrap: instead of materializing B multinomial resamples (which
    needs the global row count and a shuffle per replica), every row
    independently draws a Poisson(1) multiplicity per replica — for
    large n the replica is statistically indistinguishable from a
    classical bootstrap resample, and the whole computation is ONE
    explode(B) + ONE map-side-combinable aggregation over (replica).

    Determinism: the uniform driving each draw is the engine-wide
    md5-derived hash of (row key, replica) scaled to [0,1); the
    Poisson inverse-CDF is a literal CASE chain; values are summed as
    exact scale-integers. Output: one row per replica with its
    resample's n_eff and mean — the caller reads CI bounds off the
    replica distribution."""
    from .sampling import hash_mod_expr

    u = (
        "(cast("
        + hash_mod_expr(
            f"concat(cast({key_col} AS string), ':boot:', "
            "cast(b AS string))",
            1 << 60,
        )
        + f" AS DOUBLE) / {float(1 << 60)!r})"
    )
    w = _poisson_weight_case(u)
    rows = df.select(
        key_col,
        F.expr(
            f"cast(round({value_col} * {scale}.0d, 0) AS BIGINT)"
        ).alias("_v"),
        F.explode(F.expr(f"sequence(0, {n_resamples - 1})")).alias("b"),
    ).withColumn("_w", F.expr(w))
    return (
        rows.groupBy("b")
        .agg(
            F.sum("_w").cast("long").alias("n_eff"),
            F.sum(F.expr("_w * _v")).cast("long").alias("_sum"),
        )
        .select(
            F.col("b").cast("long").alias("replica"),
            "n_eff",
            F.expr(
                "round(CASE WHEN n_eff = 0 THEN 0.0 ELSE "
                f"cast(_sum AS DOUBLE) / n_eff / {scale}.0 END, 6)"
            ).alias("mean_value"),
        )
    )


def hll_set_algebra(
    df: DataFrame,
    key_col: str,
    a_pred,
    b_pred,
    p: int = HLL_P,
    cache=None,
) -> DataFrame:
    """Sketch SET ALGEBRA: |A|, |B|, |A∪B| from HLL registers and
    |A∩B| by inclusion-exclusion — the property that makes sketches
    composable at 100 TB: the union estimate needs NO second data pass,
    because the union sketch is the register-wise MAX of the two
    sides' registers (merge is associative, so pre-computed per-side
    sketches combine after the fact — cross-day overlap, cross-table
    audience intersection — without touching raw rows again).

    Plan: rows matching either predicate are tagged (a row matching
    both feeds both sketches), ONE map-side-combinable groupBy builds
    the (side, bucket) registers; the union registers are a second
    bounded agg OVER THE ≤2·2^p REGISTER ROWS, not the data. Exact
    counts (gate instrumentation) come from one conditional
    count-distinct pass. All register math is the engine-wide
    deterministic md5 arithmetic, so the oracle replays every register
    of all three sketches bit-for-bit.

    Returns one row:
    (z_a, v_a, exact_a, est_a, z_b, v_b, exact_b, est_b,
     z_union, v_union, exact_union, est_union,
     est_intersection, exact_intersection) — est_intersection is the
    fixed-order composition of the three ROUNDED estimates, so it is
    engine-stable (may be negative for small/noisy sketches, as
    inclusion-exclusion on estimates is unbiased, not clamped).
    """
    from ..functions.caching import owned_set, tie_release

    ps, owned = owned_set(cache)
    tagged = (
        df.select(
            F.col(key_col).alias("__k"),
            F.explode(
                F.array(
                    F.when(a_pred, F.lit("a")), F.when(b_pred, F.lit("b"))
                )
            ).alias("side"),
        )
        .filter(F.col("side").isNotNull())
    )
    regs = ps.persist(
        hll_rank_projection_by(tagged, "side", "__k", p)
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("r"))
    )
    regs_a = regs.filter(F.col("grp") == "a").select("bucket", "r")
    regs_b = regs.filter(F.col("grp") == "b").select("bucket", "r")
    regs_u = regs.groupBy("bucket").agg(F.max("r").alias("r"))
    exacts = ps.persist(
        df.agg(
            F.countDistinct(F.when(a_pred, F.col(key_col)))
            .cast("long").alias("ea"),
            F.countDistinct(F.when(b_pred, F.col(key_col)))
            .cast("long").alias("eb"),
            F.countDistinct(F.when(a_pred | b_pred, F.col(key_col)))
            .cast("long").alias("eu"),
        )
    )

    def fin(r, exact_col, tag):
        f = hll_finish(r, exacts.select(F.col(exact_col).alias("exact_distinct")), p)
        return f.select(
            F.col("z_scaled").alias(f"z_{tag}"),
            F.col("v_empty").alias(f"v_{tag}"),
            F.col("exact_distinct").alias(f"exact_{tag}"),
            F.col("hll_estimate").alias(f"est_{tag}"),
        )

    out = (
        fin(regs_a, "ea", "a")
        .crossJoin(F.broadcast(fin(regs_b, "eb", "b")))
        .crossJoin(F.broadcast(fin(regs_u, "eu", "union")))
        .select(
            "*",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 6
            ).alias("est_intersection"),
            (
                F.col("exact_a") + F.col("exact_b") - F.col("exact_union")
            ).cast("long").alias("exact_intersection"),
        )
    )
    return tie_release(out, ps, owned)


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[tuple[int, int]],
    bins: int = 1024,
    cache=None,
) -> DataFrame:
    """EXACT order statistics of a corpus-sized integer column without a
    global sort — the selection complement to ``histogram_quantiles``
    (which interpolates): distributed k-th element by bucket pruning.

    Pass 1 computes (min, max, n); every row gets a bin from a MONOTONE
    bucketing function — computed in doubles so a full-int64-range
    column cannot overflow the arithmetic (the bucketing needs only
    monotonicity and determinism, not exactness: the same function
    assigns the bin in both the counting and the selection branch, and
    the chosen ELEMENT is exact regardless of how rows distribute over
    bins). Pass 2 is ONE map-side-combinable bin-count aggregation; the
    cumulative scan runs over the ≤``bins``-row bin spine (bounded,
    never over data). Each quantile, given as an exact RATIONAL
    (q_num, q_den) — validated to 0 ≤ q_num/q_den ≤ 1 and de-duplicated
    — yields the integer-exact target rank k = (n−1)·q_num div q_den
    + 1, selects its covering bin, and only THAT bin's rows (~n/bins on
    non-degenerate distributions) are ranked by a window partitioned
    per quantile to pick the element at offset k − cum_before. Worst
    case (one mega-bin: near-constant column) the final rank is one
    partition's sort — recurse on the bin or fall back to
    ``histogram_quantiles`` if that shape is expected.

    The binned projection is persisted (PersistSet lifecycle, like the
    sibling sketches) so the count and selection branches scan one
    materialization instead of re-reading the source twice.

    Returns one row per quantile:
    (q_num, q_den, q, n, target_rank, value) — the VALUE is an actual
    element of the column (quantile_disc semantics), so the result is
    exact and ties are irrelevant to it.
    """
    from ..functions.caching import owned_set, tie_release

    qs = list(dict.fromkeys(qs))
    bad = [(a, b) for a, b in qs if b <= 0 or a < 0 or a > b]
    if bad:
        raise ValueError(f"quantiles must satisfy 0 <= q_num/q_den <= 1: {bad}")
    ps, owned = owned_set(cache)
    vals = df.select(F.col(value_col).cast("long").alias("x")).where(
        F.col("x").isNotNull()
    )
    rng = ps.persist(
        vals.agg(
            F.min("x").alias("lo"), F.max("x").alias("hi"),
            F.count("*").cast("long").alias("n"),
        )
    )
    # monotone, overflow-free: double conversion of int64 is monotone,
    # as are subtraction/scale by positive constants and floor; clamp
    # absorbs the rounding edge at x = hi
    binned = ps.persist(
        vals.crossJoin(F.broadcast(rng)).select(
            "x",
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("x").cast("double") - F.col("lo").cast("double"))
                        * bins
                        / (F.col("hi").cast("double") - F.col("lo").cast("double") + 1.0)
                    ),
                ),
            ).cast("long").alias("bin"),
        )
    )
    counts = binned.groupBy("bin").agg(F.count("*").cast("long").alias("c"))
    # bounded spine: ≤`bins` rows — the only ordered window in the plan
    wspine = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    spine = counts.select(
        "bin", "c", (F.sum("c").over(wspine) - F.col("c")).alias("cum_before"),
        F.sum("c").over(wspine).alias("cum"),
    )
    spark = df.sparkSession
    qframe = (
        spark.createDataFrame(qs, "q_num long, q_den long")
        .crossJoin(F.broadcast(rng))
        .select(
            "q_num", "q_den", "n",
            F.expr("(n - 1) * q_num div q_den + 1").alias("k"),
        )
    )
    cover = qframe.join(
        spine, (F.col("cum_before") < F.col("k")) & (F.col("k") <= F.col("cum"))
    ).select("q_num", "q_den", "n", "k", "bin", "cum_before")
    sel = binned.join(F.broadcast(cover), "bin")
    wq = Window.partitionBy("q_num", "q_den").orderBy("x")
    return tie_release(
        sel.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == F.col("k") - F.col("cum_before"))
        .select(
            "q_num", "q_den",
            F.expr("cast(q_num AS DOUBLE) / q_den").alias("q"),
            "n", F.col("k").alias("target_rank"), F.col("x").alias("value"),
        ),
        ps, owned,
    )


# --- Bloom filter (r8) ----------------------------------------------------------

BLOOM_BITS = 1 << 16   # 65,536 bits in 63-bit signed-safe words (1,041 rows) (8 KB broadcast)
BLOOM_K = 4            # hash functions per item


def bloom_build(
    items: DataFrame, item_col: str,
    bits: int = BLOOM_BITS, k: int = BLOOM_K, salt: str = "bloom-v1",
) -> DataFrame:
    """Build a Bloom filter over a (small-ish) item set as sparse
    (word_idx, word BIGINT) bitmap rows — the missing member of the
    sketch family next to CMS and HLL, and the canonical tool for the
    100 TB membership shape: the BIG side never shuffles, it probes a
    broadcast bitmap (bits/8 bytes total, 8 KB at the default size).

    Bit positions are the engine-wide deterministic md5 hash of
    (item ':' salt ':' j) for j in [0, k), so the filter — including
    its false-positive set — is bit-identical across runs, partition
    layouts, and the DuckDB oracle. Build plan: explode k positions
    per item → ONE map-side-combinable bit_or agg over ≤ bits/64
    groups. No driver state, unlike ``DataFrame.stat.bloomFilter``
    (driver-merged, murmur-seeded, not SQL-replayable)."""
    from .sampling import hash_mod_expr

    pos = hash_mod_expr(
        f"concat(cast({item_col} AS string), ':', '{salt}', ':', "
        f"cast(j AS string))",
        bits,
    )
    return (
        items.select(item_col, F.explode(F.expr(
            f"sequence(0, {k - 1})")).alias("j"))
        .select(
            # 63 usable bits per signed-BIGINT word: 1<<63 overflows a
            # signed shift in ANSI engines (DuckDB raises), so the top
            # bit is never used and the words stay portable
            F.expr(f"cast(({pos}) div 63 AS INT)").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(({pos}) % 63 AS INT))").alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(_bit)").alias("word"))
    )


def bloom_probe_contamination(
    probe_items: DataFrame, eval_items: DataFrame,
    item_col: str = "gram", key: str = "doc_id",
    bits: int = BLOOM_BITS, k: int = BLOOM_K, salt: str = "bloom-v1",
) -> DataFrame:
    """Contamination PREFILTER: count, per training document, how many
    of its n-grams are (maybe-)present in the Bloom filter built over
    the eval set's n-grams. Zero false negatives by construction, so
    ``n_maybe_hits = 0`` is a PROOF of cleanliness — the cheap first
    pass that lets the exact decontamination join run on the surviving
    sliver instead of the full corpus.

    ``probe_items``: (key, item) rows for the probe side (training
    doc grams), DISTINCT per (key, item) — every probe row counts once
    in ``n_grams``, so a duplicated pair would be double-counted.

    Plan (the no-gram-shuffle contract, now structural): the filter's
    ≤ bits/63 sparse words collapse into ONE map row (a tiny agg on the
    already-small filter side) that broadcasts via a 1-row crossJoin;
    each probe row then evaluates all k bit tests PER-ROW with a
    ``forall`` over sequence(0, k) — a pure Catalyst projection, no
    explode, no join keyed on the gram — and the only exchange in the
    whole plan is the final doc-keyed combinable agg. Nothing keyed on
    the item/gram column ever crosses the wire (asserted in
    tests/test_plan_audit.py). A gram is maybe-present iff ALL k bits
    are set (standard Bloom semantics: bit-misses prove absence)."""
    from .sampling import hash_mod_expr

    filt = bloom_build(eval_items, item_col, bits, k, salt)
    words = filt.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("_bloom_words")
    )
    pos = hash_mod_expr(
        f"concat(cast({item_col} AS string), ':', '{salt}', ':', "
        f"cast(j AS string))",
        bits,
    )
    maybe = F.expr(
        f"forall(sequence(0, {k - 1}), j -> "
        f"(coalesce(element_at(_bloom_words, cast(({pos}) div 63 AS INT)), "
        f"0L) & shiftleft(1L, cast(({pos}) % 63 AS INT))) != 0)"
    )
    checked = probe_items.crossJoin(F.broadcast(words)).select(
        key, maybe.cast("int").alias("_maybe")
    )
    return checked.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum("_maybe").cast("long").alias("n_maybe_hits"),
    )


def cms_sketch_counters(
    df: DataFrame, text_col: str = "text",
    depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
) -> DataFrame:
    """The raw mergeable count-min counters (j, bucket, c) — the
    streaming-native form of ``cms_heavy_hitters``'s sketch: token
    explode → depth rows per token → ONE map-side-combinable agg whose
    state is bounded by depth·width regardless of corpus size. The SAME
    definition runs stateful under Structured Streaming
    (sketch-on-arrival), and counter frames from disjoint corpus shards
    merge by addition — the property that makes a sketch a sketch.
    Counting raw token rows here equals summing per-term counts in the
    batch audit (same bucket arithmetic), which the shared gate oracle
    pins."""
    from .text import with_tokens

    toks = with_tokens(df, text_col).select(F.explode("tokens").alias("term"))
    rows = toks.select(
        "term", F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("j")
    )
    return (
        rows.withColumn("bucket", F.expr(_bucket_expr("term", "j", width)))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
