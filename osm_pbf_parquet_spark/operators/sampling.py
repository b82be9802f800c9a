"""Sampling / splitting operators for training-data pipelines.

A large-scale curation pipeline needs reproducible selection: the same
corpus must yield the same train/val/test membership on any cluster, any
partition count, any run. Every operator here is therefore driven by
md5-hash arithmetic over the row key plus a caller-supplied salt — no
RNG, no ``rand()``, no partition-order dependence — which also makes each
one expressible in ANSI SQL for the DuckDB oracle.

Scale posture (100 TB):

- ``hash_split`` / ``weighted_mixture`` are pure projections/filters —
  no shuffle; the filter sits directly above the scan so Parquet column
  pruning still applies (only the key column feeds the hash).
- ``stratified_cap`` shuffles once on the group key (the same shape as
  any per-group top-k); group-count skew is the pathological case and is
  exactly what AQE skew-join/agg splitting handles.
- ``uniform_sample_n`` compiles to TakeOrderedAndProject — a per-partition
  top-N heap merged on the driver, never a full global sort.
- ``length_buckets`` is a map-side-combinable aggregation over a
  projection (histogram: ~60 groups max for int64 lengths).

No analog in the reference (a batch transcoder); these extend the engine
toward its training-data north star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_mod_expr(keyed_sql: str, buckets: int) -> str:
    """THE engine-wide deterministic hash: top 60 bits of md5 of a string
    expression, mod ``buckets``. Single definition so every consumer
    (splits, sketches) stays bit-identical with the DuckDB oracle form
    ``CAST(('0x' || substring(md5(...), 1, 15)) AS BIGINT) % buckets``."""
    return (
        f"pmod(cast(conv(substring(md5({keyed_sql}), 1, 15), 16, 10) AS BIGINT), "
        f"{buckets})"
    )


def hash_bucket_expr(key_col: str, salt: str, buckets: int = HASH_BUCKETS) -> str:
    """Deterministic bucket in [0, buckets) of md5(key ':' salt-literal)."""
    return hash_mod_expr(
        f"concat(cast({key_col} AS string), ':', '{salt}')", buckets
    )


def _normalize_weights(weights) -> list[tuple[str, float]]:
    items = list(weights.items()) if isinstance(weights, dict) else list(weights)
    total = float(sum(w for _, w in items))
    if total <= 0 or any(w < 0 for _, w in items):
        raise ValueError("split weights must be non-negative and sum > 0")
    return [(name, w / total) for name, w in items]


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    weights=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row to a named split by hash bucket. Weights are
    normalized; boundaries are cumulative bucket thresholds, so membership
    is stable under re-runs AND under adding later splits (a row's bucket
    never changes — the reproducibility contract training pipelines need).
    Pure projection: no shuffle, no action."""
    norm = _normalize_weights(weights)
    df = df.withColumn("bucket", F.expr(hash_bucket_expr(key, salt)))
    cum = 0.0
    branches = []
    for name, frac in norm[:-1]:
        cum += frac
        branches.append(f"WHEN bucket < {int(round(cum * HASH_BUCKETS))} THEN '{name}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{norm[-1][0]}' END"
    return df.withColumn("split", F.expr(case))


def stratified_cap(
    df: DataFrame,
    group_col: str = "source",
    n_per_group: int = 20,
    key: str = "doc_id",
    salt: str = "cap-v1",
) -> DataFrame:
    """Cap each group at ``n_per_group`` rows, chosen uniformly (hash
    order, not input order — input order encodes crawl/storage bias).
    One shuffle on the group key; the per-group heap is bounded so a
    billion-row group costs memory O(n_per_group) after partial top-k."""
    keyed = f"concat(cast({key} AS string), ':', '{salt}')"
    df = df.withColumn("_h", F.expr(f"md5({keyed})"))
    w = Window.partitionBy(group_col).orderBy("_h", key)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= n_per_group)
        .drop("_h")
    )


def weighted_mixture(
    df: DataFrame,
    group_col: str = "lang",
    weights: dict[str, float] | None = None,
    key: str = "doc_id",
    salt: str = "mix-v1",
    default_weight: float = 0.0,
) -> DataFrame:
    """Downsample each group to its mixture fraction (keep-probability per
    group), the standard way to rebalance domain/language mixtures before
    training. Row kept iff bucket < weight[group] × buckets. Deterministic
    per row — re-runs keep the SAME rows. Pure filter: no shuffle."""
    weights = weights or {}
    for g, frac in weights.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"mixture weight for {g!r} must be in [0,1]")
    branches = " ".join(
        f"WHEN {group_col} = '{g}' THEN {int(round(frac * HASH_BUCKETS))}"
        for g, frac in weights.items()
    )
    thresh = f"CASE {branches} ELSE {int(round(default_weight * HASH_BUCKETS))} END"
    df = df.withColumn("bucket", F.expr(hash_bucket_expr(key, salt)))
    return df.filter(F.expr(f"bucket < {thresh}"))


def length_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Power-of-two token-length histogram (bucket b holds docs with
    2^b ≤ tokens < 2^(b+1)) — the distribution curation jobs use to plan
    sequence packing and truncation budgets. Bucket index via the length
    of the binary representation (integer-exact in every engine, unlike
    floor(log2(x)) whose libm rounding can differ at powers of two)."""
    tokens = f"size(split({text_col}, ' '))"
    return (
        df.select(
            F.expr(f"cast(length(bin({tokens})) AS INT) - 1").alias("len_bucket"),
            F.expr(f"cast({tokens} AS BIGINT)").alias("_n"),
        )
        .groupBy("len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n").alias("total_tokens"),
            F.min("_n").alias("min_tokens"),
            F.max("_n").alias("max_tokens"),
        )
    )


def range_bucket_column(df: DataFrame, col: str, nparts: int):
    """Deterministic range-bucket id for distributed global-order
    operators: boundaries come from one tiny ``approxQuantile`` action
    (deterministic Greenwald-Khanna sketch) and are embedded as plan
    LITERALS, so the bucket is a PURE FUNCTION of the row — unlike
    ``spark_partition_id`` after ``repartitionByRange``, which depends on
    which physical exchange a branch happens to execute (two branches of
    the same query could sample different split points). No caching, no
    cross-branch coupling; equal key values always share a bucket."""
    dtype = dict(df.dtypes).get(col)
    # df.dtypes spells decimals as "decimal(p,s)", so prefix-match them
    if dtype is None or (
        dtype not in ("tinyint", "smallint", "int", "bigint", "float", "double")
        and not dtype.startswith("decimal")
    ):
        raise ValueError(
            f"range_bucket_column needs a numeric column; {col!r} is {dtype}"
        )
    probs = [i / nparts for i in range(1, nparts)]
    bounds = df.stat.approxQuantile(col, probs, 0.001)
    # strictly increasing boundaries (duplicates collapse into one bucket)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    if not uniq:
        return F.lit(0)
    # bucket = |{b : value > b}| (equal values share the lower bucket).
    # Evaluated as a BALANCED CASE tree — binary search, O(log B)
    # comparisons per row — instead of a linear aggregate() fold over the
    # boundary array, which is O(B) per row and dominates at thousands of
    # buckets. NULL takes every `otherwise` branch → bucket 0; NaN (> any
    # double in Spark's ordering) takes every `when` branch → bucket B —
    # both identical to the linear fold's behavior.
    value = F.col(col).cast("double")

    def _search(lo: int, hi: int):
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return (
            F.when(value > F.lit(uniq[mid]), _search(mid + 1, hi))
            .otherwise(_search(lo, mid))
        )

    return _search(0, len(uniq)).cast("int")


def pack_sequences(
    df: DataFrame, budget: int, text_col: str = "text", key: str = "doc_id",
) -> DataFrame:
    """Sequence packing with document spanning (GPT-style pretraining
    batches): documents are laid end-to-end in ``key`` order into
    fixed-size context windows of ``budget`` tokens; a document may span
    a window boundary. Because spanning is allowed, the assignment is a
    PURE PREFIX SUM — no sequential bin-reset state — and the prefix sum
    is computed DISTRIBUTED: deterministic range buckets (quantile
    boundaries embedded as literals), per-bucket running sum (window BY
    bucket — parallel), then broadcast per-bucket totals as prefix
    offsets. No single-partition window anywhere; the only wide ops on
    the data are the bucket shuffles. Same two-phase global-rank scheme
    as ``plans.analytic_queries.q_ntile_quartiles_scalable``.

    Emits each document's (start_window, start_offset, end_window) plus
    its token count — the index a packing loader needs to materialize
    batches."""
    spark = df.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 8)
    tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = df.select(F.col(key), tokens.alias("n_tokens"))
    ranged = base.withColumn(
        "_pid", range_bucket_column(base, key, nparts)
    )
    counts = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_pt"))
    # dimension-sized window: one row per partition, never over data
    preceding = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_pt").over(preceding), F.lit(0)).alias("_off")
    )
    local = Window.partitionBy("_pid").orderBy(key).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_end", F.sum("n_tokens").over(local) + F.col("_off"))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tokens"))
    )
    return out.select(
        key,
        "n_tokens",
        # integer div throughout: double division drifts past 2^53 tokens
        F.expr(f"cum_start div {budget}").alias("start_window"),
        F.expr(f"cum_start % {budget}").alias("start_offset"),
        # inclusive last window this doc touches (empty docs stay put)
        F.expr(f"greatest(cum_end - 1, cum_start) div {budget}").alias(
            "end_window"
        ),
    )


def uniform_sample_n(
    df: DataFrame, n: int, key: str = "doc_id", salt: str = "sample-v1"
) -> DataFrame:
    """Exact-size uniform sample without replacement: global top-n by hash
    order. Catalyst compiles orderBy+limit to TakeOrderedAndProject (per-
    partition heaps, driver merge of n×partitions rows) — no full sort,
    no second pass, unlike reservoir schemes that need driver state."""
    keyed = f"concat(cast({key} AS string), ':', '{salt}')"
    return (
        df.withColumn("_h", F.expr(f"md5({keyed})"))
        .orderBy("_h", key)
        .limit(n)
        .drop("_h")
    )


def chunk_documents(
    df: DataFrame, size: int = 64, stride: int = 48,
    text_col: str = "text", key: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard context-window prep for LLM training (size=window tokens,
    stride<size gives overlapping windows; the trailing chunk may be
    shorter). One row in → ceil(n/stride) rows out.

    Pure per-row Catalyst work: split → sequence of starts → slice per
    start → posexplode. No shuffle, no UDF — chunking runs at scan speed
    and composes with any downstream packing/sampling operator. Chunk
    identity is (key, chunk_id); ``chunk_md5`` pins the exact token bytes
    of every window under a value hash.

    Once a window reaches the document end, later stride starts would
    emit windows fully CONTAINED in it (pure duplicate training data);
    such starts are filtered out — kept starts are a prefix of the
    stride progression, so chunk_id stays ``(start-1)/stride``."""
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    d = df.select(F.col(key), F.split(F.col(text_col), " ").alias("_w"))
    # keep start s unless the PREVIOUS window (s - stride) already
    # covered the last token — the containment condition is monotone, so
    # this drops exactly the redundant suffix. Explode the bare integer
    # starts, slice flat AFTERWARDS: an inline slice-in-transform under
    # explode gets cloned into an inferred filter and evaluated twice
    # below the exchange (see dedup.grams_exploded), and flat projections
    # stay in whole-stage codegen
    starts = (
        f"filter(sequence(1, greatest(size(_w), 1), {stride}), "
        f"s -> s = 1 OR s - {stride} + {size} - 1 < size(_w))"
    )
    d = d.select(
        F.col(key), "_w", F.explode(F.expr(starts)).alias("start")
    ).withColumn("_toks", F.expr(f"slice(_w, start, {size})"))
    return d.select(
        key,
        # derive from start, not explode position: identical because kept
        # starts are a progression prefix, and SQL-expressible
        F.expr(f"cast((start - 1) div {stride} AS INT)").alias("chunk_id"),
        F.col("start").cast("int"),
        F.size("_toks").cast("int").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("_toks"))).alias("chunk_md5"),
    )


def duck_hash_mod(keyed_sql: str, buckets: int) -> str:
    """DuckDB form of ``hash_mod_expr`` — the single definition the SQL
    oracles compose so Spark and oracle hashing can never drift apart."""
    return (
        f"CAST(('0x' || substring(md5({keyed_sql}), 1, 15)) AS BIGINT)"
        f" % {buckets}"
    )


def grouped_split_audit(
    df: DataFrame,
    group_col: str = "source",
    key: str = "doc_id",
    weights=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    salt: str = "grouped-split-v1",
) -> DataFrame:
    """Leakage-safe dataset split: assignment hashes the GROUP (e.g.
    source/domain/author), not the row, so every document of a group
    lands in the same split — near-duplicates within a source can never
    straddle train/test, the group-level analog of ``hash_split``'s
    row-level contract.

    Output is the audit a pipeline records: one row per split with its
    group and document counts, plus ``max_splits_per_group`` — the
    across-splits leakage check (1 by construction; the audit COMPUTES
    it rather than trusting it). Pure projections + two bounded
    aggregations; nothing wide beyond the split-cardinality groupBys."""
    assigned = hash_split(df, key=group_col, weights=weights, salt=salt)
    per_split = assigned.groupBy("split").agg(
        F.countDistinct(group_col).alias("n_groups"),
        F.count(key).alias("n_docs"),
    )
    leak = (
        assigned.groupBy(group_col)
        .agg(F.countDistinct("split").alias("ns"))
        .agg(F.max("ns").alias("max_splits_per_group"))
    )
    return per_split.crossJoin(F.broadcast(leak)).select(
        "split",
        F.col("n_groups").cast("long"),
        F.col("n_docs").cast("long"),
        F.col("max_splits_per_group").cast("long"),
    )


def epoch_shard_plan(
    df: DataFrame,
    n_shards: int,
    epoch: int,
    key: str = "doc_id",
    salt: str = "epoch-v1",
) -> DataFrame:
    """Deterministic per-epoch global shuffle + shard assignment — the
    final layout step a distributed trainer consumes: every document
    gets, for a given ``epoch``, a shard in [0, n_shards) and a
    position within that shard, such that (a) the order is a fresh
    pseudo-random permutation each epoch, (b) the SAME plan re-run on
    any cluster/partitioning reproduces it exactly (hash arithmetic,
    no rand()), and (c) shards are balanced in expectation. Training
    loaders then read shard s in position order — no global sort ever
    materializes one sequence.

    Plan/scale: shard and order both derive from ONE md5 hash of
    (key, epoch) — a pure projection — and position is a row_number
    window PARTITIONED BY shard: the only wide op is the shard
    exchange, each window sorts 1/n_shards of the corpus, and the
    output is exactly the partitioning the downstream writer wants
    (write partitionBy(shard) reuses it). No driver state, no Python.
    """
    keyed = (
        f"concat(cast({key} AS string), ':', '{salt}', ':', "
        f"cast({epoch} AS string))"
    )
    # shard from the top 60 bits, order from the full hex, of ONE md5
    d = df.select(
        F.col(key),
        F.expr(hash_mod_expr(keyed, n_shards)).cast("int").alias("shard"),
        F.expr(f"md5({keyed})").alias("_h"),
    )
    w = Window.partitionBy("shard").orderBy("_h", key)
    return d.select(
        key,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("position"),
    )


def token_budget_fill(
    df: DataFrame,
    budgets: DataFrame,
    group_col: str = "lang",
    budget_col: str = "token_budget",
    text_col: str = "text",
    key: str = "doc_id",
    salt: str = "budget-v1",
) -> DataFrame:
    """Fill each domain's TOKEN budget (not doc count) with a
    deterministic uniform draw — the executor that turns
    ``temperature_weights``-style per-domain budgets into the actual
    document subset: docs are ranked per domain in hash order and kept
    while the RUNNING token total stays within budget (the first doc
    that crosses the line is kept iff it starts strictly inside it, so
    every budget is filled to at least its boundary and each kept set
    is a prefix — re-runs and budget increases only APPEND documents,
    never swap them).

    ``budgets``: one row per group — (group_col, budget_col BIGINT).
    Output: kept docs only, with their token count, running total, and
    domain budget.

    Plan/scale: token counting is a projection; ONE shuffle on the
    group key for the per-domain running-sum window (domain-count
    skew is the same per-group-window shape as stratified_cap); the
    budget table is |domains| rows, broadcast. No Python, no collect.
    """
    keyed = f"concat(cast({key} AS string), ':', '{salt}')"
    tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    d = df.select(
        F.col(key),
        F.col(group_col),
        tokens.alias("n_tokens"),
        F.expr(f"md5({keyed})").alias("_h"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_h", key)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = d.withColumn("tokens_through", F.sum("n_tokens").over(w))
    return (
        run.join(F.broadcast(budgets), group_col)
        .filter(
            F.col("tokens_through") - F.col("n_tokens") < F.col(budget_col)
        )
        .select(
            key,
            group_col,
            "n_tokens",
            F.col("tokens_through").cast("long"),
            F.col(budget_col).cast("long").alias("token_budget"),
        )
    )


def unimax_allocation(
    df: DataFrame,
    budget: int,
    max_epochs: int = 2,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a total token ``budget`` across sources as
    EQUALLY as possible subject to a per-source repeat cap of
    ``max_epochs`` epochs — the budget-SETTER whose output feeds
    ``token_budget_fill`` (the budget executor) and replaces ad-hoc
    temperature weights for the long tail.

    The paper's greedy waterfill has a closed form this plan replays
    exactly: sort sources ascending by cap c = n_tokens·max_epochs;
    flags ``c_i·(S−i+1) ≤ B − Σ_{j<i} c_j`` form a PREFIX (once a
    source is uncapped, every larger one is too — if c_i overflows its
    fair share, c_{i+1} ≥ c_i overflows the strictly smaller remainder),
    so the breakpoint t is first-false − 1: sources 1..t take their
    cap, the rest split the remainder integrally — base = rem DIV U
    with the MOD distributed one token each to the smallest-cap
    uncapped sources (deterministic (cap, source) order). All-BIGINT
    arithmetic, no division by live token counts, so the whole plan is
    replayable in SQL. If the budget exceeds Σ caps, every source is
    capped and the surplus is deliberately unallocated (the paper's
    semantics: never exceed max_epochs repeats).

    Scale shape: the corpus pays ONE map-side-combinable aggregation
    (token counts by source); every window after that runs on the
    S-row per-source frame — dimension-sized, so the unpartitioned
    windows are bounded by the source cardinality (the vocab_build
    justification), and nothing is collected.

    Returns (group_col, n_tokens, cap_tokens, alloc_tokens)."""
    counts = (
        df.select(
            F.col(group_col),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("_nt"),
        )
        .groupBy(group_col)
        .agg(F.sum("_nt").alias("n_tokens"))
        .withColumn("cap", (F.col("n_tokens") * max_epochs).cast("long"))
    )
    w = Window.orderBy("cap", group_col)  # S rows: dimension-sized
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    caps = (
        counts.withColumn("i", F.row_number().over(w))
        .withColumn(
            "pre",
            F.coalesce(
                F.sum("cap").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("S", F.count(F.lit(1)).over(wall))
    )
    b = F.lit(int(budget)).cast("long")
    flagged = caps.withColumn(
        "_false_i",
        F.min(
            F.when(
                F.col("cap") * (F.col("S") - F.col("i") + 1) > b - F.col("pre"),
                F.col("i"),
            )
        ).over(wall),
    ).withColumn(
        "t", F.coalesce(F.col("_false_i") - 1, F.col("S"))
    )
    pfx = flagged.withColumn(
        "prefix_t",
        F.coalesce(
            F.max(
                F.when(F.col("i") <= F.col("t"), F.col("pre") + F.col("cap"))
            ).over(wall),
            F.lit(0),
        ).cast("long"),
    )
    alloc = F.when(F.col("i") <= F.col("t"), F.col("cap")).otherwise(
        F.expr("(_B - prefix_t) DIV (S - t)")
        + F.when(
            F.col("i") - F.col("t") <= F.expr("(_B - prefix_t) % (S - t)"),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    return (
        pfx.withColumn("_B", b)
        .select(
            group_col,
            "n_tokens",
            F.col("cap").alias("cap_tokens"),
            alloc.cast("long").alias("alloc_tokens"),
        )
    )
