"""Sampling/splitting operators: DuckDB oracle parity at sf0.01 plus
semantic invariants (determinism, cap bounds, mixture monotonicity) the
value-hash comparison alone doesn't articulate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators import sampling
from osm_pbf_parquet_spark.plans.relational import t
from osm_pbf_parquet_spark.plans.sampling_queries import SAMPLING_QUERIES

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(SAMPLING_QUERIES))
def test_sampling_oracle_parity(spark, name):
    fn, oracle = SAMPLING_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


def test_hash_split_fractions_and_determinism(spark):
    docs = t(spark, SF_DIR, "documents")
    out = sampling.hash_split(docs).select("doc_id", "split")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    # 500 docs: binomial(500, .8) within ±5 sigma of 400
    assert abs(counts.get("train", 0) - 0.8 * total) < 5 * (total * 0.16) ** 0.5
    # identical assignment on re-run (no RNG anywhere)
    again = sampling.hash_split(docs).select("doc_id", "split")
    assert out.exceptAll(again).count() == 0


def test_hash_split_membership_stable_under_resplit(spark):
    """Renaming/adding later splits must not move earlier rows: a row's
    bucket is salt-keyed, so train membership under (.8/.1/.1) is a
    superset-consistent refinement of (.8/.2)."""
    docs = t(spark, SF_DIR, "documents")
    two = sampling.hash_split(docs, weights=(("train", 0.8), ("rest", 0.2)))
    three = sampling.hash_split(docs)
    a = {r["doc_id"] for r in two.filter("split = 'train'").collect()}
    b = {r["doc_id"] for r in three.filter("split = 'train'").collect()}
    assert a == b


def test_stratified_cap_bounds(spark):
    docs = t(spark, SF_DIR, "documents")
    out = sampling.stratified_cap(docs, group_col="lang", n_per_group=10)
    per = out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert per and all(r["n"] <= 10 for r in per)
    # groups smaller than the cap keep every row
    small = docs.groupBy("lang").agg(F.count("*").alias("total")).collect()
    totals = {r["lang"]: r["total"] for r in small}
    kept = {r["lang"]: r["n"] for r in per}
    for lang, n_total in totals.items():
        assert kept[lang] == min(n_total, 10)


def test_weighted_mixture_monotone_in_weight(spark):
    """Raising a group's weight only ADDS rows (nested samples) — the
    property that lets mixture ratios be tuned without reshuffling data."""
    docs = t(spark, SF_DIR, "documents")
    lo = sampling.weighted_mixture(docs, weights={"en": 0.3})
    hi = sampling.weighted_mixture(docs, weights={"en": 0.7})
    lo_ids = {r["doc_id"] for r in lo.select("doc_id").collect()}
    hi_ids = {r["doc_id"] for r in hi.select("doc_id").collect()}
    assert lo_ids <= hi_ids
    assert len(lo_ids) < len(hi_ids)
    # unlisted groups drop entirely at default weight 0
    assert lo.filter(F.col("lang") != "en").count() == 0


def test_uniform_sample_exact_n_and_stable(spark):
    docs = t(spark, SF_DIR, "documents")
    s1 = sampling.uniform_sample_n(docs, n=25).select("doc_id")
    s2 = sampling.uniform_sample_n(docs, n=25).select("doc_id")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert len(ids1) == 25 and ids1 == ids2
    # n=25 sample is a prefix of the n=50 sample (same hash order)
    ids50 = {r["doc_id"]
             for r in sampling.uniform_sample_n(docs, n=50).select("doc_id").collect()}
    assert set(ids1) <= ids50


def test_length_buckets_cover_all_docs(spark):
    docs = t(spark, SF_DIR, "documents")
    out = sampling.length_buckets(docs).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        # bucket b holds token counts in [2^b, 2^(b+1))
        assert 2 ** r["len_bucket"] <= r["min_tokens"]
        assert r["max_tokens"] < 2 ** (r["len_bucket"] + 1)


def test_sampling_plans_shuffle_free(spark):
    """hash_split and weighted_mixture must stay pure projections/filters
    (no Exchange in the physical plan); uniform_sample_n must compile to
    TakeOrderedAndProject, not a global Sort."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (sampling.hash_split(docs),
               sampling.weighted_mixture(docs, weights={"en": 0.5})):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    plan = (sampling.uniform_sample_n(docs, n=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan, plan


def test_pack_sequences_semantics(spark):
    """Windows tile the token stream exactly: consecutive docs in key
    order are laid end-to-end; offsets advance by token count; a doc
    whose span crosses a 2048 boundary reports end_window > start_window."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = {r["doc_id"]: r for r in
           sampling.pack_sequences(docs, budget=2048).collect()}
    ids = sorted(out)
    cum = 0
    crossings = 0
    for i in ids:
        r = out[i]
        assert r["start_window"] == cum // 2048
        assert r["start_offset"] == cum % 2048
        end = max(cum + r["n_tokens"] - 1, cum)
        assert r["end_window"] == end // 2048
        crossings += int(r["end_window"] > r["start_window"])
        cum += r["n_tokens"]
    assert crossings > 0  # non-vacuous: some docs span windows


def test_pack_sequences_no_global_window(spark):
    """The prefix sum must be distributed: deterministic-bucket shuffle +
    per-bucket windows only — no unpartitioned window over the data."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = sampling.pack_sequences(docs, budget=2048)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "hashpartitioning(_pid" in plan
    # formatted explain lists the distribution on the Arguments line;
    # exactly one SinglePartition exchange is allowed — the tiny
    # per-partition-counts offsets branch. A global data window adds more.
    assert plan.count("SinglePartition") == 1


# --- r8: epoch shard plan + token budget fill -----------------------------------


def test_epoch_shard_plan_is_per_epoch_permutation(spark):
    df = t(spark, "/root/testdata/sf0.001", "documents")
    n = df.count()
    e3 = sampling.epoch_shard_plan(df, n_shards=4, epoch=3)
    rows = e3.collect()
    # every doc appears once; positions are exactly 0..size-1 per shard
    assert len(rows) == n
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    assert set(by_shard) <= set(range(4))
    for shard, pos in by_shard.items():
        assert sorted(pos) == list(range(len(pos)))
    # a different epoch is a different permutation (same doc set)
    e4 = {(r["doc_id"], r["shard"], r["position"])
          for r in sampling.epoch_shard_plan(df, n_shards=4, epoch=4).collect()}
    assert e4 != {(r["doc_id"], r["shard"], r["position"]) for r in rows}
    # determinism under repartitioning
    again = {
        (r["doc_id"], r["shard"], r["position"])
        for r in sampling.epoch_shard_plan(
            df.repartition(7), n_shards=4, epoch=3
        ).collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["position"]) for r in rows}


def test_token_budget_fill_prefix_and_boundary(spark):
    """Kept sets are hash-order prefixes; every budget is filled to at
    least its boundary (the crossing doc is kept iff it STARTS inside);
    raising a budget only appends."""
    df = t(spark, "/root/testdata/sf0.001", "documents")
    budgets = spark.createDataFrame(
        [("en", 2000), ("fr", 500), ("de", 1), ("es", 0), ("zh", 10**9)],
        ["lang", "token_budget"],
    )
    out = sampling.token_budget_fill(df, budgets).collect()
    per_lang: dict[str, list] = {}
    for r in out:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in per_lang.items():
        rows.sort(key=lambda r: r["tokens_through"])
        budget = rows[0]["token_budget"]
        # every kept doc starts strictly inside the budget
        assert all(r["tokens_through"] - r["n_tokens"] < budget for r in rows)
        # contiguity: running totals chain exactly (prefix, no gaps)
        acc = 0
        for r in rows:
            acc += r["n_tokens"]
            assert r["tokens_through"] == acc
        # filled to the boundary: the prefix either covers the budget or
        # is the whole language
        n_lang = df.filter(F.col("lang") == lang).count()
        assert rows[-1]["tokens_through"] >= budget or len(rows) == n_lang
    assert "es" not in per_lang  # zero budget keeps nothing
    # monotonicity: doubling one budget strictly extends that prefix
    bigger = spark.createDataFrame(
        [("en", 4000), ("fr", 500), ("de", 1), ("es", 0), ("zh", 10**9)],
        ["lang", "token_budget"],
    )
    out2 = {r["doc_id"] for r in sampling.token_budget_fill(df, bigger).collect()
            if r["lang"] == "en"}
    out1 = {r["doc_id"] for r in out if r["lang"] == "en"}
    assert out1 <= out2 and len(out2) > len(out1)


def test_unimax_allocation_waterfill_properties(spark):
    """Pins the closed-form waterfill against the paper's greedy on
    hand-checkable shapes: exact budget exhaustion when under Σcaps,
    never exceeding a source's cap, caps-only when the budget exceeds
    Σcaps (surplus deliberately unallocated), and the pure-equal-split
    degenerate when even the smallest source is uncapped."""

    def docs(counts):
        # one doc per source with exactly n whitespace tokens
        return spark.createDataFrame(
            [(s, "x " * (n - 1) + "x") for s, n in counts],
            ["source", "text"],
        )

    def alloc(counts, budget, epochs=2):
        return {
            r["source"]: (r["n_tokens"], r["cap_tokens"], r["alloc_tokens"])
            for r in sampling.unimax_allocation(
                docs(counts), budget, max_epochs=epochs
            ).collect()
        }

    # mixed: a=10 caps at 20, b/c waterfill 80 -> 40 each
    out = alloc([("a", 10), ("b", 100), ("c", 100)], 100)
    assert out == {"a": (10, 20, 20), "b": (100, 200, 40),
                   "c": (100, 200, 40)}
    # remainder: 101 - 20 = 81 over two -> 40/41, +1 to the smaller
    # (cap, source) order: b and c tie on cap, b sorts first
    out = alloc([("a", 10), ("b", 100), ("c", 100)], 101)
    assert (out["b"][2], out["c"][2]) == (41, 40)
    # budget above sum of caps: everyone capped, surplus unallocated
    out = alloc([("a", 10), ("b", 20)], 10_000)
    assert out["a"][2] == 20 and out["b"][2] == 40
    # budget below every fair share: pure equal split, t=0
    out = alloc([("a", 50), ("b", 60), ("c", 70)], 30)
    assert sorted(v[2] for v in out.values()) == [10, 10, 10]
    # allocation never exceeds any cap and sums to min(budget, sum caps)
    for budget in (1, 37, 100, 359, 10_000):
        out = alloc([("a", 13), ("b", 57), ("c", 101), ("d", 7)], budget)
        assert all(v[2] <= v[1] for v in out.values())
        assert sum(v[2] for v in out.values()) == min(
            budget, sum(v[1] for v in out.values())
        )
