"""Order-sensitive analytics: Pareto skyline and SCD-2 interval builds.

Both are classic warehouse operators the reference's users run on its
parquet output via external engines (reference ``README.md:44-77``
delegates querying to DuckDB/Athena); here they're native Spark window
plans.

Scale posture: each operator is ONE window over ONE keyed (or global)
sort — the same O(n log n) sort-based strategy a dedicated engine would
pick. No self-joins, no cross products: the naive skyline is an
all-pairs dominance test (O(n²)); the running-minimum formulation below
is the textbook sort-based skyline (Börzsönyi et al., "The Skyline
Operator", ICDE 2001) and shuffles each row at most once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_min_min(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Distinct Pareto-frontier points minimizing ``(x, y)`` jointly.

    A point is dominated iff another point is <= in both coordinates and
    strictly < in at least one. After collapsing exact duplicates, order
    by (x asc, y asc); a point survives iff its y is strictly below the
    running minimum y of ALL preceding points in that order:

    - a preceding point has smaller x, or equal x with smaller y —
      either way it dominates iff its y <= ours;
    - conversely any dominator sorts before us, so the running min
      catches every one.

    The running minimum is computed DISTRIBUTED, not as one global
    window (``Window.orderBy`` with no partition key moves every row to
    a single task): deterministic range buckets on x (quantile
    boundaries as plan literals — ``sampling.range_bucket_column``, the
    same two-phase scheme as ``pack_sequences``), a per-bucket window
    for the local running min, and a bucket-count-sized prefix-min of
    per-bucket minima broadcast back as the carry-in. The only wide ops
    on data are the distinct and the bucket shuffle.
    """
    from .sampling import range_bucket_column

    spark = df.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 8)
    pts = df.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).dropDuplicates(["x", "y"])
    ranged = pts.withColumn("_b", range_bucket_column(pts, "x", nparts))
    bmins = ranged.groupBy("_b").agg(F.min("y").alias("_bymin"))
    # bucket-count-sized frame (one row per bucket), never over data
    prec = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    carry = bmins.select(
        "_b", F.min("_bymin").over(prec).alias("_premin")
    )
    local = (
        Window.partitionBy("_b")
        .orderBy("x", "y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        ranged.join(F.broadcast(carry), "_b")
        .withColumn("_locmin", F.min("y").over(local))
        # least() skips NULLs (first row of a bucket / first bucket)
        .withColumn("_gmin", F.least("_locmin", "_premin"))
    )
    return (
        out.where(F.col("_gmin").isNull() | (F.col("y") < F.col("_gmin")))
        .select(F.col("x").alias(x_col), F.col("y").alias(y_col))
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: compress a change log to
    validity intervals per key.

    Rows where ``attr`` differs from the key's previous value open a new
    interval ``[valid_from, valid_to)``; ``valid_to`` is the next
    change's timestamp (NULL for the current interval). ``tiebreak_col``
    makes the event order total when timestamps collide, so the output
    is deterministic and oracle-comparable.

    Plan: one keyed window (lag to find change points), then a second
    window over the surviving change rows (lead for the interval close).
    Both windows share the (key) partitioning — one shuffle total.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .where(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            F.col(key_col),
            F.col(attr_col),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.row_number().over(w2).alias("version_no"),
        )
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_col: str,
) -> DataFrame:
    """MERGE (upsert) semantics as a declarative plan: rows from
    ``updates`` replace same-key rows in ``target``; unmatched update
    rows insert; unmatched target rows survive — the maintenance
    primitive behind lakehouse MERGE INTO, expressed engine-side.

    Plan: union with a priority column + one keyed window keeping the
    highest-priority row per key — ONE shuffle on the merge key, same
    cost class as the join-based MERGE a table format would run, with
    no broadcast requirement on either side (both may be huge). If
    several rows share a key WITHIN one side — duplicate update rows,
    or a malformed target that was never key-unique — both sides must
    pre-dedupe (standard MERGE raises there, we document instead); as
    a safety net the window tiebreaks on a stable full-row hash, so
    even then the survivor is deterministic across runs and task
    retries rather than partition-order-dependent."""
    cols = target.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            "merge_upsert requires identical target/update schemas; got "
            f"{sorted(cols)} vs {sorted(updates.columns)}"
        )
    tagged = target.select(*cols).withColumn(
        "_prio", F.lit(0)
    ).unionByName(updates.select(*cols).withColumn("_prio", F.lit(1)))
    w = Window.partitionBy(key_col).orderBy(
        F.desc("_prio"), F.xxhash64(*cols)
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            *cols,
            F.when(F.col("_prio") == 1, F.lit("update"))
            .otherwise(F.lit("target"))
            .alias("src"),
        )
    )


def funnel_depths(
    df: DataFrame,
    steps: list[str],
    key_col: str,
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """Ordered-funnel analysis: for each key, how far through the step
    sequence did it progress, requiring each step STRICTLY AFTER the
    previous one (the product-analytics funnel semantic: view → click →
    purchase counts a purchase only if it follows the user's first
    qualifying click, which follows their first view).

    Plan: one keyed min-aggregation per step, each filtered by the
    previous step's timestamp via a keyed equi-join — ``len(steps)``
    map-side-combinable aggs + joins on the SAME key (co-partitioned
    shuffles, no window over raw events, per-key state is one timestamp
    per step). Emits (key, depth, t_1..t_n) with NULLs past the
    reached depth."""
    if not steps:
        raise ValueError("funnel_depths needs at least one step")
    reached = None
    out_cols = []
    for i, step in enumerate(steps):
        cur = df.where(F.col(type_col) == step).select(
            key_col, F.col(ts_col).alias("_ts")
        )
        if reached is None:
            agg = cur.groupBy(key_col).agg(
                F.min("_ts").alias(f"t_{i + 1}")
            )
            reached = agg
        else:
            agg = (
                cur.join(
                    reached.select(key_col, F.col(f"t_{i}").alias("_prev")),
                    key_col,
                )
                .where(F.col("_ts") > F.col("_prev"))
                .groupBy(key_col)
                .agg(F.min("_ts").alias(f"t_{i + 1}"))
            )
            reached = reached.join(agg, key_col, "left")
        out_cols.append(f"t_{i + 1}")
    depth = F.lit(0)
    for i in range(len(steps)):
        depth = F.when(F.col(f"t_{i + 1}").isNotNull(), i + 1).otherwise(
            depth
        )
    # later steps are NULL whenever an earlier one is (inner join chain),
    # so the CASE cascade written back-to-front yields the max depth
    return reached.select(
        key_col,
        depth.cast("int").alias("depth"),
        *[F.col(c) for c in out_cols],
    )


def dataset_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two keyed datasets: emits (key, status) for
    every key that is ``only_a``, ``only_b``, or ``changed`` (identical
    rows are omitted — the output is the delta, bounded by the true
    change volume, not the table size). The companion to the bucketed
    ``table_checksum``: the checksum says WHETHER replicas diverged,
    the diff says WHERE.

    Plan: md5 content hash of the compare columns as a projection on
    each side, then ONE full outer join on the key — same shuffle class
    as the merge that would repair the difference. No broadcast
    requirement; both sides may be huge."""
    def hashed(df: DataFrame, tag: str) -> DataFrame:
        # hash each column SEPARATELY before combining: per-column md5 is
        # fixed-width hex, so no separator-injection ambiguity
        # (('a|b','c') vs ('a','b|c')), and NULL maps to a marker no hex
        # digest can collide with
        parts = ", ".join(
            f"coalesce(md5(cast({c} AS string)), '@null')"
            for c in compare_cols
        )
        return df.select(
            *key_cols, F.expr(f"md5(concat({parts}))").alias(f"_h_{tag}")
        )

    joined = hashed(a, "a").join(hashed(b, "b"), key_cols, "full_outer")
    status = (
        F.when(F.col("_h_b").isNull(), F.lit("only_a"))
        .when(F.col("_h_a").isNull(), F.lit("only_b"))
        .when(F.col("_h_a") != F.col("_h_b"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: P(next state | state) — the behavioral-LM statistic
    (next-event prediction, funnel modeling, session synthesis) over an
    interaction log.

    Plan: ONE keyed window (lead over ``order_cols`` within ``key_col``
    — state per key is a cursor, never a global sort), then one
    map-side-combinable groupBy onto the state-pair grid (|states|²
    rows, dimension-sized). Counts are exact BIGINTs; the probability
    is the 1e-6-floored integer ratio re-expressed as a double (round()
    on quotient doubles hits .5 boundaries where Spark and DuckDB
    systematically disagree). Orders deterministically by
    (state, next_state)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    trans = (
        df.withColumn("_next", F.lead(state_col).over(w))
        .where(F.col("_next").isNotNull())
        .groupBy(
            F.col(state_col).alias("state"),
            F.col("_next").alias("next_state"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = Window.partitionBy("state")
    return (
        trans.withColumn("state_n", F.sum("n").over(totals).cast("long"))
        .withColumn(
            "p",
            F.expr("cast((n * 1000000) div state_n AS DOUBLE) / 1000000"),
        )
        .orderBy("state", "next_state")
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window_last: int = 16,
) -> DataFrame:
    """Per-key exponential smoothing (α = 1/2) over the trailing
    ``window_last`` observations, integer-exact.

    EWMA is inherently recursive (S_k = x_k/2 + S_{k-1}/2, S_1 = x_1),
    which engines can't express as one associative aggregate — but
    scaling by 2^k linearizes it exactly: U_k = S_k·2^k satisfies
    U_k = 2·x_1 + Σ_{i=2..k} 2^(i-1)·x_i, a plain weighted sum. Keeping
    U as a BIGINT over a bounded trailing window (the weights total
    exactly 2^W, so 2^W·max|x| must fit int64 — W=16 leaves 10^13
    headroom for cent-scaled values) makes the
    smoothed state exact, order-independent, and SQL-replayable; the
    single final division U/2^k is one IEEE-deterministic float op.
    The trailing-window cut is also what bounds memory at 100 TB: state
    per key is W rows, never the full history.

    Plan: one keyed window (row_number DESC) cuts the trailing W rows,
    a second renumbers them ascending, one groupBy sums the weighted
    values — two partitioned window sorts + one map-side-combinable
    agg, no global sort, no collect. ``value_col`` must be integral
    (cents, counts); ties in ``order_cols`` must be broken by a unique
    column for a deterministic trailing cut.

    Returns (key, n_used, ewma_u, ewma) where ewma_u = EWMA·2^n_used
    exactly and ewma = the double quotient.
    """
    wd = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    recent = (
        df.select(key_col, *order_cols, F.col(value_col).cast("long").alias("__x"))
        .withColumn("__rd", F.row_number().over(wd))
        .filter(F.col("__rd") <= window_last)
    )
    wa = Window.partitionBy(key_col).orderBy(*order_cols)
    seq = recent.withColumn("__i", F.row_number().over(wa))
    weighted = seq.select(
        key_col,
        F.expr(
            "CASE WHEN __i = 1 THEN __x * 2L "
            "ELSE __x * shiftleft(1L, __i - 1) END"
        ).alias("__w"),
    )
    return (
        weighted.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_used"),
             F.sum("__w").cast("long").alias("ewma_u"))
        .select(
            key_col, "n_used", "ewma_u",
            F.expr(
                "cast(ewma_u AS DOUBLE) / cast(shiftleft(1L, n_used) AS DOUBLE)"
            ).alias("ewma"),
        )
    )


def scd2_snapshot(intervals: DataFrame, at, ts_col_from: str = "valid_from",
                  ts_col_to: str = "valid_to") -> DataFrame:
    """Point-in-time reconstruction (time travel) over an SCD-2 interval
    table: the rows valid AT ``at`` — i.e. ``valid_from <= at`` and
    (``valid_to`` IS NULL or ``at < valid_to``). Composes with
    ``scd2_intervals``: snapshot(intervals(log), t) equals the latest
    change per key at or before t.

    Scale: a pure filter — no shuffle, no window; on a parquet-backed
    interval table both bounds push down to row-group pruning (cluster
    the write by valid_from for the zone-map win).
    """
    return intervals.where(
        (F.col(ts_col_from) <= F.lit(at))
        & (F.col(ts_col_to).isNull() | (F.lit(at) < F.col(ts_col_to)))
    )


_RING_M = 1 << 60  # ring positions are 15-hex md5 prefixes: [0, 2^60)


def _ring_expr(n_shards: int, vnodes: int) -> str:
    """The consistent-hash ring as a pure-Catalyst array literal-free
    expression: ``n_shards·vnodes`` (position, shard) structs with
    positions md5-derived — replayable verbatim in SQL."""
    return (
        f"transform(sequence(0, {n_shards * vnodes} - 1), i -> struct("
        "cast(conv(substring(md5(concat('ring-v1:', "
        f"cast(i DIV {vnodes} AS string), ':', cast(i % {vnodes} AS string)"
        ")), 1, 15), 16, 10) AS BIGINT) AS pos, "
        f"cast(i DIV {vnodes} AS int) AS sid))"
    )


def consistent_shard_plan(
    df: DataFrame,
    key: str,
    shards_before: int,
    shards_after: int,
    vnodes: int = 8,
) -> DataFrame:
    """Consistent-hashing shard rebalance plan (Karger et al., STOC
    1997): assign every key to its shard on an md5-derived vnode ring
    at BOTH cluster sizes and emit the migration matrix — the readout
    that tells a 100 TB store how much data a resize actually moves.
    The defining guarantee (test-pinned, and the whole reason this
    beats ``hash(key) % S``, which reshuffles ~(S−1)/S of everything):
    growing the ring only moves keys ONTO the new shards — a key's
    shard either stays or is one of ``shards_after − shards_before``
    new ids, and the expected moved fraction is the new vnodes' share
    of the ring.

    Assignment = the shard of the vnode at minimal clockwise distance
    ``(vpos − kpos) mod 2⁶⁰`` (ties break to the lowest shard id via
    the struct min). Everything is exact BIGINT md5 arithmetic.

    Scale shape: both rings attach as ONE broadcast row (S·V structs);
    per-key assignment is a scan-speed projection; the only exchange is
    the final matrix aggregation, bounded by S_before·S_after distinct
    pairs. Returns (shard_before, shard_after, n_keys)."""
    if shards_after < shards_before:
        raise ValueError("consistent_shard_plan grows the ring: "
                         "shards_after >= shards_before")
    spark = df.sparkSession
    rings = spark.range(1).select(
        F.expr(_ring_expr(shards_before, vnodes)).alias("_ring_b"),
        F.expr(_ring_expr(shards_after, vnodes)).alias("_ring_a"),
    )
    kpos = (
        f"cast(conv(substring(md5(concat('key-v1:', cast({key} AS string)"
        ")), 1, 15), 16, 10) AS BIGINT)"
    )
    assign = (
        "array_min(transform({ring}, x -> struct("
        f"pmod(x.pos - _kpos, {_RING_M}) AS d, x.sid AS sid))).sid"
    )
    return (
        df.select(F.col(key))
        .crossJoin(F.broadcast(rings))
        .withColumn("_kpos", F.expr(kpos))
        .withColumn("shard_before", F.expr(assign.format(ring="_ring_b")))
        .withColumn("shard_after", F.expr(assign.format(ring="_ring_a")))
        .groupBy("shard_before", "shard_after")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )
