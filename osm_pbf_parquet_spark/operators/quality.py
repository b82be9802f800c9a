"""Data-quality, profiling, and robust-statistics operators.

The reference engine validates its own output with a differential
checker (``osm-pbf-parquet/test/validate.py:57-217`` compares counts,
nulls, and per-column values against a second implementation); this
module generalizes that idea into reusable pipeline operators: one-pass
column profiling, rule-based constraint validation with violation
counts, median/MAD robust outlier flagging, and a chi-square
independence table — the checks a training-data pipeline runs before
and after every transform at corpus scale.

All arithmetic is exact-integer (counts, cents, scaled devs) except
explicitly-rounded final ratios, so a SQL oracle replays results
bit-for-bit and task retries can never flip a verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _bt(ident: str) -> str:
    """Backtick-quote an identifier for use inside an expr string, so
    column/rule names with spaces, dots, or quotes parse correctly."""
    return "`" + ident.replace("`", "``") + "`"


def _lit(s: str) -> str:
    """Single-quoted SQL string literal with embedded quotes escaped."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def profile_table(df: DataFrame, specs: list[tuple[str, str]]) -> DataFrame:
    """One-pass column profile: rows, nulls, distincts, min/max.

    ``specs`` is ``[(column, kind)]`` with kind ∈ {"int", "money",
    "str", "ts"}; kind picks a canonical ORDERABLE representation for
    min/max (BIGINT for numerics — money as cents, timestamps as epoch
    µs — raw string for text) which is stringified only after the
    aggregate, so min/max are computed with numeric, not lexicographic,
    ordering.

    Scale: ONE aggregation pass. The multiple ``count(DISTINCT)``
    columns lower to a single Expand + hash-aggregate (input amplified
    ×(len(specs)+1) map-side, still one shuffle of partial aggregates,
    no raw-row shuffle). For hundreds of columns or approximate-is-fine
    profiling, swap ``approx_count_distinct`` in — exact is the default
    because the oracle demands it.

    Returns (col_name, n_rows, n_null, n_distinct, min_repr, max_repr)
    — one row per spec, counts BIGINT, reprs STRING.
    """

    def canon(col, kind: str):
        if kind == "money":
            return F.round(col * 100).cast("long")
        if kind == "ts":
            return F.unix_micros(col.cast("timestamp"))
        if kind == "int":
            return col.cast("long")
        return col.cast("string")

    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c, kind in specs:
        v = canon(df[c], kind)
        aggs += [
            F.sum(F.when(df[c].isNull(), 1).otherwise(0))
            .cast("long").alias(f"{c}__nn"),
            F.count_distinct(df[c]).cast("long").alias(f"{c}__nd"),
            F.min(v).cast("string").alias(f"{c}__mn"),
            F.max(v).cast("string").alias(f"{c}__mx"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"{_lit(c)}, __n, {_bt(c + '__nn')}, {_bt(c + '__nd')}, "
        f"{_bt(c + '__mn')}, {_bt(c + '__mx')}"
        for c, _ in specs
    )
    return row.select(
        F.expr(
            f"stack({len(specs)}, {stack_args}) as "
            "(col_name, n_rows, n_null, n_distinct, min_repr, max_repr)"
        )
    )


def dq_counts(
    df: DataFrame,
    rules: list[tuple[str, "F.Column"]],
    group_by: list[str] | None = None,
) -> DataFrame:
    """Rule-based constraint validation: violation counts in ONE pass.

    ``rules`` is ``[(rule_name, violation_predicate)]``; every predicate
    is evaluated as a conditional aggregate over the same scan, so N
    rules cost one table pass and one group-count-sized shuffle — never
    N passes. Cross-table rules (FK orphans, temporal consistency) are
    expressed by passing a pre-joined frame and writing the predicate
    over it (e.g. LEFT-join the parent and test ``parent_key IS NULL``).

    ``group_by`` segments the counts (e.g. a tumbling event-time window
    for a streaming DQ monitor — the conditional aggregates are
    map-side combinable, so the same call works under ``readStream``).

    Returns (group…, rule, n_violations, n_checked) — one row per
    (group, rule), counts BIGINT.
    """
    group_by = group_by or []
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"v_{name}")
        )
    row = df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)
    stack_args = ", ".join(
        f"{_lit(name)}, {_bt('v_' + name)}, __n" for name, _ in rules
    )
    return row.select(
        *group_by,
        F.expr(
            f"stack({len(rules)}, {stack_args}) as (rule, n_violations, n_checked)"
        ),
    )


def mad_outliers(
    df: DataFrame,
    group: list[str],
    cents: str,
    k: int = 8,
) -> DataFrame:
    """Robust per-group outlier counts via median/MAD, integer-exact.

    Flags x as an outlier when |x − median| > k·MAD, computed entirely
    in scaled integers: ``med_x2`` is twice the group median (so even
    counts stay integral), ``dev_x2 = |2x − med_x2|`` is twice each
    deviation, ``mad_x4`` twice ITS median (4× the MAD), and the flag
    test ``2·dev_x2 > k·mad_x4`` is the exact inequality — no float
    enters, so the oracle matches bit-for-bit and a re-run can never
    flip a count. ``cents`` must already be a BIGINT (money ×100 etc.).

    Scale: two partitioned window sorts (value rank, then deviation
    rank); the per-group medians are ATTACHED by a window SUM of the two
    middle positions over the plain group window — the same partitioning
    the rank sort just established, so the whole operator is ONE
    exchange by the group keys followed by partition-local sorts,
    window passes and the final hash aggregate (r12: was two exchanges
    + two sort-merge joins of the corpus frame against the 1-row-per-
    group stat tables, 8 sorts total — guide §2.4's share-one-exchange
    rule). No global sort, no collect. Groups sort independently; for
    the FEW-huge-groups shape (a handful of groups holding the whole
    corpus) prefer the range-bucketed quantile pattern in
    ``sketches.histogram_quantiles`` — this operator targets
    many-moderate-groups (the window sort for one group is one task's
    work).

    Returns (group…, n, med_x2, mad_x4, n_outliers).
    """
    wn = Window.partitionBy(*group)
    w1 = Window.partitionBy(*group).orderBy("__x")
    w2 = Window.partitionBy(*group).orderBy("__dev2")
    lo = F.expr("(__n + 1) div 2")
    hi = F.expr("__n div 2 + 1")
    base = df.select(*group, F.col(cents).cast("long").alias("__x"))
    ranked = base.select(
        *group, "__x",
        F.row_number().over(w1).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    # twice-median attached in place: sum the lo/hi middle values over
    # the group window (×2 when they coincide) — identical arithmetic
    # to selecting the two middle rows and summing them per group
    med_term = (
        F.when((F.col("__rn") == lo) | (F.col("__rn") == hi),
               F.col("__x") * F.when(lo == hi, 2).otherwise(1))
        .otherwise(0)
    )
    dev = ranked.select(
        *group, "__n",
        F.sum(med_term).over(wn).cast("long").alias("med_x2"),
        F.col("__x"),
    ).select(
        *group, "__n", "med_x2",
        F.abs(F.col("__x") * 2 - F.col("med_x2")).alias("__dev2"),
    )
    ranked2 = dev.select(
        *group, "__n", "med_x2", "__dev2",
        F.row_number().over(w2).alias("__rn2"),
    )
    mad_term = (
        F.when((F.col("__rn2") == lo) | (F.col("__rn2") == hi),
               F.col("__dev2") * F.when(lo == hi, 2).otherwise(1))
        .otherwise(0)
    )
    staged = ranked2.select(
        *group, "__n", "med_x2", "__dev2",
        F.sum(mad_term).over(wn).cast("long").alias("mad_x4"),
    )
    return (
        staged.groupBy(*group)
        .agg(
            F.max("__n").cast("long").alias("n"),
            F.max("med_x2").alias("med_x2"),
            F.max("mad_x4").alias("mad_x4"),
            F.sum(
                F.when(F.col("__dev2") * 2 > F.lit(k) * F.col("mad_x4"), 1)
                .otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


def chi_square_cells(df: DataFrame, a: str, b: str,
                     round_to: int | None = None) -> DataFrame:
    """Chi-square independence table for two categorical columns.

    Per-cell contribution to the χ² statistic, computed from exact
    integer counts: with O the observed cell count, Rᵃ/Cᵇ the marginal
    totals and N the grand total, the cell term (O − RC/N)²/(RC/N)
    rearranges to (O·N − R·C)² / (N·R·C) — the NUMERATOR is an exact
    BIGINT (valid to N ≈ 3·10⁹ per chunk before O·N overflows; shard
    the contingency build beyond that). The DENOMINATOR is the product
    of the three marginals each cast to double BEFORE multiplying:
    N·R·C reaches N³ in the worst case, which wraps int64 around
    N ≈ 2·10⁶ — far below the numerator's bound — so it must never be
    formed in integer arithmetic. Each marginal ≤ N < 2⁵³ is exactly
    representable as a double and the two IEEE multiplications are
    deterministic left-to-right in both engines, so cross-engine parity
    holds per row with no order-dependent sums and no rounding (pass
    ``round_to`` to truncate for display). The full statistic is the
    (small, bounded) sum of ``contrib``.

    Scale: one groupBy over the raw rows builds the contingency cells;
    marginals are windowed sums OVER THE CELLS (bounded: |A|·|B| rows),
    not the raw data. No collect, no cross join.
    """
    cells = df.groupBy(a, b).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    wa = Window.partitionBy(a)
    wb = Window.partitionBy(b)
    wn = Window.partitionBy()
    with_m = cells.select(
        a, b, "observed",
        F.sum("observed").over(wa).cast("long").alias("row_total"),
        F.sum("observed").over(wb).cast("long").alias("col_total"),
        F.sum("observed").over(wn).cast("long").alias("grand_total"),
    )
    num = F.col("observed") * F.col("grand_total") - F.col("row_total") * F.col("col_total")
    # marginals cast to double BEFORE the product: N·R·C in BIGINT wraps
    # silently (non-ANSI) around N ~ 2e6 — see docstring
    den = (
        F.col("grand_total").cast("double")
        * F.col("row_total").cast("double")
        * F.col("col_total").cast("double")
    )
    contrib = (num.cast("double") * num.cast("double")) / den
    if round_to is not None:
        contrib = F.round(contrib, round_to)
    return with_m.select(
        a, b, "observed", "row_total", "col_total", contrib.alias("contrib"),
    )


def group_regression(
    df: DataFrame,
    group: list[str],
    x: str,
    y: str,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line from EXACT integer
    moments — slope/intercept per group in one aggregation pass.

    The five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are exact: x
    and y must be integral (epoch days, cents); the first-order sums
    stay BIGINT while the per-row products and second-order sums are
    computed ENTIRELY in decimal(38,0) — operands cast before the
    multiply, so even single rows with |x·y| beyond int64 (epoch-µs ×
    cents) cannot wrap, and 10⁹-row groups of cent-scaled values need
    only ~10²⁸ ≪ 10³⁸. The normal-equation combination n·Σxy − Σx·Σy
    and n·Σx² − (Σx)² happens in the same exact decimal domain; only
    the FINAL slope/intercept divisions are floating point — a fixed
    three-flop composition of identically-rounded inputs, so results
    are bit-reproducible and SQL-replayable (DuckDB mirrors with
    HUGEINT sums).

    Rows where either coordinate is NULL are excluded entirely (n
    counts complete pairs only — mixing samples between n and the sums
    would silently bias the fit).

    Scale: one map-side-combinable groupBy — no window, no join, no
    second pass. Degenerate groups (n=1, or zero x-variance) return
    NULL slope/intercept rather than a division error.

    Returns (group…, n, slope, intercept).
    """
    d = "decimal(38,0)"
    base = df.select(
        *group,
        F.col(x).cast("long").alias("__x"),
        F.col(y).cast("long").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    agg = base.groupBy(*group).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("sx"),
        F.sum("__y").cast("long").alias("sy"),
        F.sum(F.col("__x").cast(d) * F.col("__y").cast(d)).alias("sxy"),
        F.sum(F.col("__x").cast(d) * F.col("__x").cast(d)).alias("sxx"),
    )
    cov = F.col("n").cast(d) * F.col("sxy") - (
        F.col("sx").cast(d) * F.col("sy").cast(d)
    )
    var = F.col("n").cast(d) * F.col("sxx") - (
        F.col("sx").cast(d) * F.col("sx").cast(d)
    )
    slope = F.when(
        var != F.lit(0).cast(d),
        cov.cast("double") / var.cast("double"),
    )
    return agg.select(
        *group, "n",
        slope.alias("slope"),
        F.when(
            slope.isNotNull(),
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
        ).alias("intercept"),
    )


def autocorr_lags(
    df: DataFrame,
    group: list[str],
    order: list[str],
    v: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-group lag-k autocorrelation (Pearson ACF at lags 1..max_lag)
    from EXACT integer moments — the seasonality/persistence diagnostic
    a time-series pipeline runs per entity.

    ``v`` must be integral (cents, counts). For each lag k the pairs
    (x_t, x_{t-k}) are formed with ONE window pass (all ``max_lag`` lag
    columns share a single window spec → one shuffle on the group key),
    then unpivoted and reduced to the six sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) per (group, lag). Products are computed
    in decimal(38,0) with operands cast BEFORE the multiply (the
    ``group_regression`` discipline), so the combination n·Σxy − Σx·Σy
    is exact; only the final r = cov/√(varx·vary) is floating point — a
    fixed flop composition of identically-rounded inputs, so the result
    is bit-reproducible and SQL-replayable. Exactness bound: with
    |v| ≤ V and n rows in a group, |n·Σxy| ≤ n²·V²; decimal(38,0)
    requires n²·V² < 10³⁸ — e.g. V=10⁵ → n ≤ ~3·10¹⁴ rows per group;
    chunk longer series by time window before calling.

    Degenerate series (zero variance on either side, or fewer than 2
    pairs) return NULL acf rather than a division error. NULL ``v``
    rows are excluded pairwise.

    Scale: window shuffle is on the group key (entity-parallel); the
    moment reduction is map-side combinable. No collect, no cross join.

    Returns (group…, lag, n_pairs, acf).
    """
    from pyspark.sql import Window

    d = "decimal(38,0)"
    w = Window.partitionBy(*group).orderBy(*order)
    base = df.select(
        *group, *order, F.col(v).cast("long").alias("__x")
    )
    lagged = base.select(
        *group,
        "__x",
        *[F.lag("__x", k).over(w).alias(f"__y{k}") for k in range(1, max_lag + 1)],
    )
    stack = ", ".join(f"{k}, __y{k}" for k in range(1, max_lag + 1))
    pairs = lagged.select(
        *group,
        "__x",
        F.expr(f"stack({max_lag}, {stack}) AS (lag, __y)"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    agg = pairs.groupBy(*group, "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("__x").cast("long").alias("sx"),
        F.sum("__y").cast("long").alias("sy"),
        F.sum(F.col("__x").cast(d) * F.col("__y").cast(d)).alias("sxy"),
        F.sum(F.col("__x").cast(d) * F.col("__x").cast(d)).alias("sxx"),
        F.sum(F.col("__y").cast(d) * F.col("__y").cast(d)).alias("syy"),
    )
    n = F.col("n_pairs").cast(d)
    cov = n * F.col("sxy") - F.col("sx").cast(d) * F.col("sy").cast(d)
    varx = n * F.col("sxx") - F.col("sx").cast(d) * F.col("sx").cast(d)
    vary = n * F.col("syy") - F.col("sy").cast(d) * F.col("sy").cast(d)
    zero = F.lit(0).cast(d)
    acf = F.when(
        (F.col("n_pairs") > 1) & (varx > zero) & (vary > zero),
        cov.cast("double")
        / F.sqrt(varx.cast("double") * vary.cast("double")),
    )
    return agg.select(
        *group,
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        acf.alias("acf"),
    )
