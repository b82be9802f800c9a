"""Round-5 advanced queries vs DuckDB oracles at sf0.01, plus semantic
checks (skyline dominance, HLL error bound, SCD2 interval algebra) no
oracle covers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators import ordered
from osm_pbf_parquet_spark.plans.advanced_queries import ADVANCED_QUERIES
from osm_pbf_parquet_spark.plans.relational import t

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(ADVANCED_QUERIES))
def test_advanced_oracle_parity(spark, name):
    fn, oracle = ADVANCED_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


def test_skyline_no_point_dominated(spark):
    """Semantic check the oracle can't express: no skyline point is
    dominated by ANY input point (all-pairs audit at test scale)."""
    orders = t(spark, SF_DIR, "orders").limit(2000)
    sky = ordered.skyline_min_min(
        orders, "o_totalprice", "o_orderdate"
    ).collect()
    pts = orders.select("o_totalprice", "o_orderdate").collect()
    assert sky
    for s in sky:
        for p in pts:
            dominated = (
                p["o_totalprice"] <= s["o_totalprice"]
                and p["o_orderdate"] <= s["o_orderdate"]
                and (
                    p["o_totalprice"] < s["o_totalprice"]
                    or p["o_orderdate"] < s["o_orderdate"]
                )
            )
            assert not dominated, (s, p)


def test_hll_estimate_within_theoretical_error(spark):
    """HLL with m=256 has relative standard error 1.04/sqrt(256) = 6.5%;
    demand the estimate lands within 4 sigma of the exact count."""
    from osm_pbf_parquet_spark.operators.sketches import hll_distinct

    row = hll_distinct(t(spark, SF_DIR, "events"), "user_id").collect()[0]
    exact = row["exact_distinct"]
    est = row["hll_estimate"]
    assert exact > 0
    assert abs(est - exact) / exact < 4 * 1.04 / (256 ** 0.5), row


def test_scd2_intervals_partition_timeline(spark):
    """Per user: intervals are disjoint, ordered, cover from the first
    event, and exactly one open (NULL valid_to) interval exists."""
    e = t(spark, SF_DIR, "events")
    out = ordered.scd2_intervals(
        e, "user_id", "event_type", "ts_us", "event_id"
    )
    rows = out.orderBy("user_id", "version_no").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        opens = [r for r in ivs if r["valid_to"] is None]
        assert len(opens) == 1, user
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], (a, b)
            assert a["event_type"] != b["event_type"], (a, b)


def test_negative_sampling_no_self_pairs_and_k_bound(spark):
    from osm_pbf_parquet_spark.operators.similarity import negative_sampling
    from osm_pbf_parquet_spark.plans.pipeline_queries import t_adaptive as pt

    out = negative_sampling(
        pt(spark, SF_DIR, "embeddings"), k=4, query_limit=50
    ).collect()
    assert out
    per_anchor: dict = {}
    for r in out:
        assert r["neg_id"] != r["anchor_id"]
        assert -1.0 <= r["cosine"] <= 1.0
        per_anchor.setdefault(r["anchor_id"], set()).add(r["draw"])
    assert all(len(d) <= 4 for d in per_anchor.values())


def test_funnel_strict_ordering_property(spark):
    """Funnel timestamps must be strictly increasing to the reached
    depth and NULL past it — the semantic the oracle can't state."""
    from osm_pbf_parquet_spark.plans.advanced_queries import q_funnel_depths

    rows = q_funnel_depths(spark, SF_DIR).collect()
    assert rows
    depths = set()
    for r in rows:
        ts = [r["t_1"], r["t_2"], r["t_3"]]
        d = r["depth"]
        depths.add(d)
        assert all(t is not None for t in ts[:d])
        assert all(t is None for t in ts[d:])
        assert all(a < b for a, b in zip(ts[:d], ts[1:d]))
    assert {1, 2, 3} & depths  # the fixture reaches multiple depths


def test_compact_parquet_dataset_reduces_files_preserves_content(spark, tmp_path):
    """Compaction: fewer files, identical rows (order-independent
    content checksum), hive partitioning preserved."""
    from osm_pbf_parquet_spark.sinks.parquet_sink import (
        compact_parquet_dataset,
    )

    src = str(tmp_path / "fragmented")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # simulate ingest fragmentation: 64 tiny files per lang partition
    docs.repartition(64).write.partitionBy("lang").parquet(src)

    dst = str(tmp_path / "compacted")
    stats = compact_parquet_dataset(
        spark, src, dst, target_file_mb=64, partition_col="lang"
    )
    assert stats["files_out"] < stats["files_in"]
    assert stats["rows"] == docs.count()

    def checksum(path):
        return (
            spark.read.parquet(path)
            .select(
                F.expr(
                    "cast(conv(substring(md5(concat_ws('|', doc_id, text, "
                    "lang, source)), 1, 15), 16, 10) AS BIGINT)"
                ).alias("h")
            )
            .agg(F.expr("bit_xor(h)").alias("x"), F.count("*").alias("n"))
            .collect()[0]
        )

    a, b = checksum(src), checksum(dst)
    assert (a["x"], a["n"]) == (b["x"], b["n"])
    import glob
    assert glob.glob(f"{dst}/lang=*")  # hive layout preserved


def test_skyline_exact_vs_bruteforce_random(spark):
    """Completeness AND soundness on adversarial random data (heavy
    duplicate x values stress the range-bucket boundaries): the
    distributed skyline must equal the brute-force frontier exactly."""
    import random

    from osm_pbf_parquet_spark.operators.ordered import skyline_min_min

    rng = random.Random(20260814)
    for trial in range(3):
        pts = [
            (float(rng.randint(0, 40)), float(rng.randint(0, 40)))
            for _ in range(500)
        ]
        df = spark.createDataFrame(pts, "x double, y double")
        got = {(r["x"], r["y"]) for r in skyline_min_min(df, "x", "y").collect()}
        uniq = set(pts)
        expected = {
            p for p in uniq
            if not any(
                q[0] <= p[0] and q[1] <= p[1] and q != p
                and (q[0] < p[0] or q[1] < p[1])
                for q in uniq
            )
        }
        assert got == expected, (trial, got ^ expected)


def test_merge_upsert_matches_dict_semantics(spark):
    """merge_upsert against the obvious dict-merge reference on random
    key overlap patterns."""
    import random

    from osm_pbf_parquet_spark.operators.ordered import merge_upsert

    rng = random.Random(7)
    target = [(k, rng.randint(0, 99)) for k in range(50)]
    updates = [
        (k, rng.randint(100, 199))
        for k in rng.sample(range(80), 30)  # mix of replaces + inserts
    ]
    tdf = spark.createDataFrame(target, "k long, v long")
    udf_ = spark.createDataFrame(updates, "k long, v long")
    got = {
        r["k"]: (r["v"], r["src"])
        for r in merge_upsert(tdf, udf_, "k").collect()
    }
    expected = {k: (v, "target") for k, v in target}
    expected.update({k: (v, "update") for k, v in updates})
    assert got == expected


def test_poisson_bootstrap_brackets_true_mean(spark):
    """Statistical sanity: the 32-replica bootstrap distribution must
    bracket the true mean, and its spread must be on the order of the
    standard error (sigma/sqrt(n)) — a constant-factor window, not a
    tolerance tuned to pass."""
    import statistics

    from osm_pbf_parquet_spark.plans.advanced_queries import (
        q_poisson_bootstrap,
    )

    rows = q_poisson_bootstrap(spark, SF_DIR).collect()
    assert len(rows) == 32
    means = [r["mean_value"] for r in rows]
    vals = [
        r["value"]
        for r in t(spark, SF_DIR, "events").select("value").collect()
    ]
    true_mean = statistics.fmean(vals)
    se = statistics.pstdev(vals) / (len(vals) ** 0.5)
    assert min(means) <= true_mean <= max(means)
    boot_sd = statistics.pstdev(means)
    assert 0.3 * se < boot_sd < 3.0 * se, (boot_sd, se)


def test_gram_matrix_supports_pca_eigensolve(spark):
    """The d×d Gram matrix collected from the distributed partials must
    drive a correct PCA: its top eigenvector (driver-side eigensolve —
    trivially cheap at d=64 regardless of corpus size) aligns with the
    one numpy computes from the raw data."""
    import numpy as np

    from osm_pbf_parquet_spark.operators.similarity import gram_matrix
    from osm_pbf_parquet_spark.plans.pipeline_queries import t_adaptive as pt

    df = pt(spark, SF_DIR, "embeddings")
    rows = gram_matrix(df).collect()
    d = max(r["i"] for r in rows) + 1
    G = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        G[r["i"], r["j"]] = r["g"]
    assert np.allclose(G, G.T)
    top_engine = np.linalg.eigh(G)[1][:, -1]

    X = np.array(
        [r["embedding"] for r in df.select("embedding").collect()],
        dtype=np.float64,
    )
    Xs = X * 1_000_000
    Xi = np.sign(Xs) * np.floor(np.abs(Xs) + 0.5)
    top_ref = np.linalg.eigh(Xi.T @ Xi)[1][:, -1]
    assert abs(float(np.dot(top_engine, top_ref))) > 0.9999


def test_hll_empty_input_estimates_zero(spark):
    from osm_pbf_parquet_spark.operators.sketches import hll_distinct

    empty = spark.createDataFrame([], "k long")
    row = hll_distinct(empty, "k").collect()[0]
    assert row["exact_distinct"] == 0
    assert row["v_empty"] == 256
    # all registers zero → linear counting: 256·ln(256/256) = 0 exactly
    assert row["hll_estimate"] == 0.0


def test_histogram_quantiles_degenerate_constant_column(spark):
    from osm_pbf_parquet_spark.operators.sketches import histogram_quantiles

    const = spark.createDataFrame([(42.0,)] * 100, "x double")
    rows = histogram_quantiles(const, "x", [0.25, 0.5, 0.99]).collect()
    assert len(rows) == 3
    assert all(r["est"] == 42.0 for r in rows)


def test_skyline_empty_and_single_point(spark):
    from osm_pbf_parquet_spark.operators.ordered import skyline_min_min

    empty = spark.createDataFrame([], "x double, y double")
    assert skyline_min_min(empty, "x", "y").count() == 0
    one = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    assert skyline_min_min(one, "x", "y").collect() == [(1.0, 2.0)]


def test_salted_join_null_tiebreak_keeps_row(spark):
    """The review-found bug class: a NULL tiebreak column must not drop
    the row from the salted join."""
    from osm_pbf_parquet_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, None), (1, 10), (2, 20)], "k long, tb long"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    out = salted_join(fact, dim, "k", "tb").collect()
    assert len(out) == 3  # all three fact rows survive


# --- round-6 ADVICE-fix guards -----------------------------------------------


def test_histogram_quantiles_q0_returns_min_and_validates(spark):
    """q=0 must return the exact minimum (the covering-bin predicate
    alone can never match it) and out-of-range quantiles must raise."""
    from osm_pbf_parquet_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in (3, 7, 11, 42)], "x double"
    )
    rows = {
        r["q"]: r["est"]
        for r in histogram_quantiles(df, "x", [0.0, 1.0]).collect()
    }
    assert rows[0.0] == 3.0
    assert rows[1.0] == 42.0
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        histogram_quantiles(df, "x", [0.5, 1.5])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        histogram_quantiles(df, "x", [-0.1])


def test_gram_matrix_merged_overflow_raises(spark):
    """Cross-partition merge overflow must raise, not wrap: two
    partitions whose partials each fit int64 but whose SUM does not."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from osm_pbf_parquet_spark.operators.similarity import gram_matrix

    # d=1, scale=1e9: 3.03e9^2 = 9.18e18 < 2^63-1 = 9.22e18 per row,
    # but two rows in separate partitions merge to 1.84e19 > int64
    df = spark.createDataFrame(
        [([3.03],), ([3.03],)], "embedding array<double>"
    ).repartition(2)
    with pytest.raises(SparkRuntimeException, match="exceeds int64"):
        gram_matrix(df, scale=1_000_000_000).collect()


def test_gram_matrix_decimal_merge_is_exact(spark):
    """The decimal(38,0) merge path returns the same int64 values as
    plain summation when no overflow occurs."""
    from osm_pbf_parquet_spark.operators.similarity import gram_matrix

    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "embedding array<double>"
    ).repartition(2)
    got = {
        (r["i"], r["j"]): r["g"] for r in gram_matrix(df).collect()
    }
    s = 1_000_000
    assert got[(0, 0)] == (1 * 1 + 3 * 3) * s * s
    assert got[(0, 1)] == got[(1, 0)] == (1 * 2 + 3 * 4) * s * s
    assert got[(1, 1)] == (2 * 2 + 4 * 4) * s * s


def test_bm25_arrow_sql_impl_parity(spark):
    """The r12 vectorized (dl, hits) kernel must reproduce the SQL
    tokenize+filter chain EXACTLY — corpus plus edge shapes (empty
    text, punctuation-only, repeated query terms, terms with quotes,
    multibyte text) where tokenizer or filter drift would show."""
    from osm_pbf_parquet_spark.operators.text import bm25_topk

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    edge = spark.createDataFrame(
        [(900001, ""), (900002, "!!! ??? ..."),
         (900003, "data data data spark"),
         (900004, "héllo data wörld"), (900005, "it's data")],
        "doc_id long, text string",
    )
    base = docs.unionByName(edge)
    terms = ["data", "spark", "it's"]
    arrow = sorted(
        tuple(r) for r in bm25_topk(base, terms, k=50, impl="arrow").collect()
    )
    sql = sorted(
        tuple(r) for r in bm25_topk(base, terms, k=50, impl="sql").collect()
    )
    assert arrow == sql


def test_bm25_terms_with_quotes_are_escaped(spark):
    """A query term containing a single quote must not break (or
    inject into) the generated SQL."""
    from osm_pbf_parquet_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "it's a test"), (2, "plain words here")],
        "doc_id long, text string",
    )
    out = bm25_topk(df, ["it's", "plain"], k=5).collect()
    assert {r["doc_id"] for r in out} <= {1, 2}
    assert len(out) >= 1  # at least the 'plain' doc scores


def test_bm25_terms_with_backslashes_are_escaped(spark):
    """Spark's default lexer treats backslash as an escape inside
    string literals: a term ending in '\\' used to escape the closing
    quote (PARSE_SYNTAX_ERROR), and a crafted pair could inject
    expression text. Both must now parse and match literally."""
    from osm_pbf_parquet_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "path\\to file"), (2, "plain words here")],
        "doc_id long, text string",
    )
    # trailing backslash, lone backslash, and a quote+backslash combo
    for terms in (["a\\"], ["\\"], ["it'\\s", "plain"]):
        out = bm25_topk(df, terms, k=5).collect()
        assert {r["doc_id"] for r in out} <= {1, 2}
    # a term that IS a backslash-containing token must still match
    # (tokenizer permitting) without altering other terms' results
    out = bm25_topk(df, ["plain", "x\\y"], k=5).collect()
    assert any(r["doc_id"] == 2 for r in out)


def test_merge_upsert_duplicate_keys_deterministic(spark):
    """Duplicate keys WITHIN a side pick a hash-stable survivor: the
    same result across repeated runs and different partitionings."""
    from osm_pbf_parquet_spark.operators.ordered import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "z")], "k long, v string")
    runs = [
        sorted(
            merge_upsert(
                target.repartition(n), updates, "k"
            ).collect()
        )
        for n in (1, 3, 7)
    ]
    assert runs[0] == runs[1] == runs[2]
    assert len(runs[0]) == 2  # one survivor per key


def test_funnel_depths_ten_steps(spark):
    """VERDICT #8: pin the join-chain behavior at 10 steps — plan
    builds, executes, and strict-ordering semantics hold."""
    from osm_pbf_parquet_spark.operators.ordered import funnel_depths

    steps = [f"s{i}" for i in range(10)]
    rows = []
    # user A completes all 10 in order; user B stalls at step 4 (s3
    # arrives BEFORE s2 — strictly-after violated); user C does 2
    for i, s in enumerate(steps):
        rows.append(("A", s, 100 + i))
    for i, s in enumerate(steps[:3]):
        rows.append(("B", s, 200 + i))
    rows.append(("B", "s3", 150))  # too early: before B's s2 at 202
    rows.append(("C", "s0", 300))
    rows.append(("C", "s1", 301))
    df = spark.createDataFrame(rows, "user string, etype string, ts long")
    got = {
        r["user"]: r["depth"]
        for r in funnel_depths(df, steps, "user", "etype", "ts").collect()
    }
    assert got == {"A": 10, "B": 3, "C": 2}


# --- r8: Bloom contamination prefilter -------------------------------------------


def test_bloom_prefilter_has_zero_false_negatives(spark):
    """Bloom contract: a training doc sharing >= 1 distinct 5-gram with
    the eval split can NEVER report fewer maybe-hits than its true
    overlap count (bits prove absence, not presence) — so
    n_maybe_hits = 0 is a proof of cleanliness the exact decontaminate
    join can trust."""
    from pyspark.sql import functions as F

    from osm_pbf_parquet_spark.plans.advanced_queries import (
        ADVANCED_QUERIES,
        _grams5_expr,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["n_grams"], r["n_maybe_hits"])
        for r in ADVANCED_QUERIES["bloom_decontaminate"][0](spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    grams = _grams5_expr()
    ev = {
        r["gram"]
        for r in docs.filter(F.col("doc_id") % 20 == 0)
        .select(F.explode(F.expr(grams)).alias("gram"))
        .collect()
    }
    truth = {
        r["doc_id"]: [g for g in r["gs"] if g in ev]
        for r in docs.filter(F.col("doc_id") % 20 != 0)
        .select("doc_id", F.expr(grams).alias("gs"))
        .collect()
    }
    assert set(got) == set(truth)
    any_true_overlap = False
    for doc_id, true_hits in truth.items():
        n_grams, n_maybe = got[doc_id]
        assert n_maybe >= len(true_hits), (doc_id, n_maybe, len(true_hits))
        assert n_maybe <= n_grams
        any_true_overlap = any_true_overlap or bool(true_hits)
    assert any_true_overlap  # the fixture actually exercises overlap


def test_consistent_shards_move_only_to_new_shards(spark):
    """The consistent-hashing guarantee that justifies the operator:
    growing the ring 8 -> 10 moves keys ONLY onto shards 8/9 (a key's
    nearest vnode either stays its nearest or is beaten by a NEW
    vnode — existing vnodes' relative order never changes), the moved
    fraction is far below mod-S resharding's ~90%, and shrinking
    back is the exact inverse membership."""
    df = t(spark, "/root/testdata/sf0.01", "orders")
    rows = ordered.consistent_shard_plan(
        df, "o_orderkey", 8, 10
    ).collect()
    total = sum(r["n_keys"] for r in rows)
    moved = [r for r in rows if r["shard_before"] != r["shard_after"]]
    assert all(r["shard_after"] in (8, 9) for r in moved)
    moved_frac = sum(r["n_keys"] for r in moved) / total
    assert 0 < moved_frac < 0.5  # vs ~0.9 for hash(key) % S
    # identity resize: nothing moves
    same = ordered.consistent_shard_plan(df, "o_orderkey", 8, 8).collect()
    assert all(r["shard_before"] == r["shard_after"] for r in same)
    with pytest.raises(ValueError, match="grows"):
        ordered.consistent_shard_plan(df, "o_orderkey", 8, 4)
