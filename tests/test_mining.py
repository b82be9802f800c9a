"""Round-6 mining queries vs DuckDB oracles at sf0.01, plus semantic
checks (PageRank mass conservation/ordering, Apriori containment,
grouped-HLL error bound, bigram probability algebra) no oracle covers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_parquet_spark.plans.mining_queries import MINING_QUERIES
from osm_pbf_parquet_spark.plans.relational import t

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(MINING_QUERIES))
def test_mining_oracle_parity(spark, name):
    fn, oracle = MINING_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


def test_pagerank_favors_high_indegree(spark):
    """Semantic: on a star graph (everyone links to one hub), the hub
    must out-rank every spoke, and ranks must be positive."""
    from osm_pbf_parquet_spark.operators.graph import pagerank_power

    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 20)], "src long, dst long"
    )
    rows = pagerank_power(edges, k=25).collect()
    assert rows[0]["node"] == 0  # the hub wins
    assert all(r["rank_scaled"] > 0 for r in rows)
    spokes = {r["rank_scaled"] for r in rows if r["node"] != 0}
    assert len(spokes) == 1  # symmetric spokes tie exactly (integer math)


def test_pagerank_deterministic_across_partitionings(spark):
    """Integer arithmetic ⇒ bit-identical results however the edges are
    partitioned (the property float PageRank lacks)."""
    from osm_pbf_parquet_spark.operators.graph import pagerank_power

    edges = [(i, (i * 7) % 23) for i in range(200) if i != (i * 7) % 23]
    runs = []
    for n in (1, 5, 32):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(n)
        runs.append(sorted(tuple(r) for r in pagerank_power(df).collect()))
    assert runs[0] == runs[1] == runs[2]


def test_frequent_pairs_apriori_containment(spark):
    """Every reported pair's items must individually meet the item
    support floor (the Apriori invariant the pruning relies on)."""
    from osm_pbf_parquet_spark.operators.itemsets import frequent_item_pairs

    li = t(spark, SF_DIR, "lineitem")
    pairs = frequent_item_pairs(li, "l_orderkey", "l_partkey",
                                min_item=3, min_pair=2, k=15).collect()
    assert pairs, "expected some co-occurring pairs at sf0.01"
    item_support = {
        r["l_partkey"]: r["n"]
        for r in li.select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_partkey").agg(F.count("*").alias("n")).collect()
    }
    for p in pairs:
        assert item_support[p["item_1"]] >= 3
        assert item_support[p["item_2"]] >= 3
        assert p["pair_support"] >= 2


def test_grouped_hll_within_error_bound(spark):
    """Each group's HLL estimate must sit within 5 standard errors of
    its exact count (m=256 ⇒ rse 6.5%)."""
    from osm_pbf_parquet_spark.operators.sketches import hll_distinct_by

    rows = hll_distinct_by(
        t(spark, SF_DIR, "events"), "event_type", "user_id"
    ).collect()
    assert len(rows) >= 2
    for r in rows:
        rel = abs(r["hll_estimate"] - r["exact_distinct"]) / max(
            r["exact_distinct"], 1
        )
        assert rel < 5 * 0.065, (r["event_type"], rel)


def test_bigram_probabilities_form_distribution(spark):
    """For every prefix w1 appearing in the output, P(w2|w1) must equal
    pair_n/w1_n exactly and the full per-prefix distribution (recomputed
    without the top-k cut) must sum to 1."""
    from osm_pbf_parquet_spark.operators.text import bigram_conditional

    docs = t(spark, SF_DIR, "documents").limit(500)
    out = bigram_conditional(docs, k=10).collect()
    assert out
    for r in out:
        assert r["p_cond"] == (r["pair_n"] * 1_000_000 // r["w1_n"]) / 1e6
    # "no top-k cut" needs k >= the distinct-bigram population (bounded
    # by the ~28k corpus tokens), NOT a huge sentinel: k=10**9 planned as
    # TakeOrderedAndProject(limit=1e9) whose bounded priority queue
    # pre-allocates per the limit — ~8 s of pure allocation per run
    full = bigram_conditional(docs, k=10**6)
    sums = (full.groupBy("w1")
            .agg(F.sum(F.col("pair_n") / F.col("w1_n")).alias("s"))
            .collect())
    for s in sums:
        assert abs(s["s"] - 1.0) < 1e-9


def test_markov_rows_cover_all_observed_transitions(spark):
    """Transition matrix totals must reconcile: sum of n = total events
    minus one per user (every non-final event transitions somewhere)."""
    from osm_pbf_parquet_spark.operators.ordered import markov_transitions

    ev = t(spark, SF_DIR, "events")
    out = markov_transitions(ev, "user_id", "event_type",
                             ["ts_us", "event_id"])
    total_n = out.agg(F.sum("n")).collect()[0][0]
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_n == n_events - n_users


def test_bigram_handles_empty_and_single_token_docs(spark):
    """Review-found crash class: an empty tokenization made slice() see
    length -1. Empty/1-token docs must contribute nothing, not throw."""
    from osm_pbf_parquet_spark.operators.text import bigram_conditional

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "two words")],
        "doc_id long, text string",
    )
    rows = bigram_conditional(df, k=10).collect()
    assert [(r["w1"], r["w2"], r["pair_n"]) for r in rows] == [
        ("two", "words", 1)
    ]


# --- property tests vs pure-Python references ---------------------------------


def _py_pagerank(edges, iters=3, S=10**12):
    """Driver-side integer PageRank reference (same arithmetic)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    dedup = sorted(set(edges))
    for s, _ in dedup:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: S // n for v in nodes}
    for _ in range(iters):
        inflow = {}
        for s, d in dedup:
            inflow[d] = inflow.get(d, 0) + (rank[s] * 85) // (100 * deg[s])
        base = (S * 15) // (100 * n)
        rank = {v: base + inflow.get(v, 0) for v in nodes}
    return rank


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_pagerank_matches_python_reference(spark, seed):
    import random

    rng = random.Random(seed)
    edges = list({
        (rng.randrange(30), rng.randrange(30)) for _ in range(80)
    })
    edges = [(s, d) for s, d in edges if s != d]
    from osm_pbf_parquet_spark.operators.graph import pagerank_power

    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    got = {r["node"]: r["rank_scaled"]
           for r in pagerank_power(df, k=10**6).collect()}
    ref = _py_pagerank(edges)
    assert got == ref


@pytest.mark.parametrize("seed", [3, 11])
def test_frequent_pairs_match_itertools_reference(spark, seed):
    import itertools
    import random
    from collections import Counter

    rng = random.Random(seed)
    rows = [(b, rng.randrange(12)) for b in range(40) for _ in range(4)]
    from osm_pbf_parquet_spark.operators.itemsets import frequent_item_pairs

    df = spark.createDataFrame(rows, "basket long, item long")
    got = [
        (r["item_1"], r["item_2"], r["pair_support"])
        for r in frequent_item_pairs(
            df, "basket", "item", min_item=3, min_pair=2, k=10**6
        ).collect()
    ]
    # reference: distinct items per basket, freq filter, pair counter
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    isup = Counter(i for items in baskets.values() for i in items)
    keep = {i for i, c in isup.items() if c >= 3}
    pc = Counter()
    for items in baskets.values():
        for a, b2 in itertools.combinations(sorted(i for i in items if i in keep), 2):
            pc[(a, b2)] += 1
    ref = sorted(
        ((a, b2, c) for (a, b2), c in pc.items() if c >= 2),
        key=lambda t: (-t[2], t[0], t[1]),
    )
    assert got == ref


def test_markov_matches_pandas_reference(spark):
    import pandas as pd

    ev = t(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    from osm_pbf_parquet_spark.operators.ordered import markov_transitions

    got = {
        (r["state"], r["next_state"]): (r["n"], r["state_n"], r["p"])
        for r in markov_transitions(
            ev, "user_id", "event_type", ["ts_us", "event_id"]
        ).collect()
    }
    pdf = ev.toPandas().sort_values(["user_id", "ts_us", "event_id"])
    pdf["nxt"] = pdf.groupby("user_id")["event_type"].shift(-1)
    tr = pdf.dropna(subset=["nxt"]).groupby(["event_type", "nxt"]).size()
    totals = tr.groupby(level=0).sum()
    ref = {
        (s, nx): (int(c), int(totals[s]),
                  (int(c) * 1_000_000 // int(totals[s])) / 1e6)
        for (s, nx), c in tr.items()
    }
    assert got == ref


def test_grouped_hll_merges_like_global_hll(spark):
    """Partition-merge property: each group's register set (and thus
    z_scaled) must equal the global HLL run on just that group's rows —
    grouping must not change any sketch content."""
    from osm_pbf_parquet_spark.operators.sketches import (
        hll_distinct,
        hll_distinct_by,
    )

    ev = t(spark, SF_DIR, "events")
    grouped = {
        r["event_type"]: (r["z_scaled"], r["v_empty"], r["exact_distinct"])
        for r in hll_distinct_by(ev, "event_type", "user_id").collect()
    }
    for etype, vals in list(grouped.items())[:2]:  # 2 groups: runtime cap
        solo = hll_distinct(
            ev.where(F.col("event_type") == etype), "user_id"
        ).collect()[0]
        assert vals == (
            solo["z_scaled"], solo["v_empty"], solo["exact_distinct"]
        ), etype


def test_grouped_hll_projection_runs_on_a_stream(spark, tmp_path):
    """Streaming/batch unification extends to the GROUPED sketch: the
    (grp, bucket, rank) projection runs unchanged on a stream, the
    per-(grp, bucket) register max aggregates in complete mode, and the
    registers equal the batch run's on the same static input."""
    from osm_pbf_parquet_spark.operators.sketches import (
        hll_rank_projection_by,
    )

    src = t(spark, SF_DIR, "events").select("event_type", "user_id")
    path = str(tmp_path / "ev")
    src.write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(
        "event_type string, user_id long"
    ).parquet(path)
    regs_stream = (
        hll_rank_projection_by(stream, "event_type", "user_id")
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("r"))
    )
    q = (
        regs_stream.writeStream.format("memory")
        .queryName("grouped_hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["grp"], r["bucket"]): r["r"]
        for r in spark.sql("SELECT * FROM grouped_hll_regs").collect()
    }
    ref = {
        (r["grp"], r["bucket"]): r["r"]
        for r in hll_rank_projection_by(src, "event_type", "user_id")
        .groupBy("grp", "bucket").agg(F.max("rank").alias("r")).collect()
    }
    assert got == ref


def test_cooccurrence_cosine_bounds_and_symmetry(spark):
    """Cosine must lie in (0, 1]; an item paired with itself in every
    basket (perfect overlap) scores exactly 1.0."""
    from osm_pbf_parquet_spark.operators.itemsets import cooccurrence_cosine_topk

    rows = ([("b%d" % i, "x") for i in range(4)]
            + [("b%d" % i, "y") for i in range(4)]
            + [("b0", "z"), ("b1", "z")])
    df = spark.createDataFrame(rows, "basket string, item string")
    got = cooccurrence_cosine_topk(df, "basket", "item", min_item=2, k=10).collect()
    top = got[0]
    assert (top["item_1"], top["item_2"], top["cosine"]) == ("x", "y", 1.0)
    assert all(0 < r["cosine"] <= 1.0 for r in got)
    # z co-occurs with each of x,y in 2 of their 4 baskets: 2/sqrt(2*4)
    zrows = {(r["item_1"], r["item_2"]): r["cosine"] for r in got}
    import math
    assert zrows[("x", "z")] == 2 / math.sqrt(8)


def test_kcore_peels_to_dense_backbone(spark):
    """K5 with pendant chains: the 4-core is exactly the K5 (every
    survivor at degree 4); a k above the max clique degree empties."""
    from osm_pbf_parquet_spark.operators.graph import kcore_peel

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    chains = [(0, 100), (100, 101), (1, 200), (200, 201), (201, 202)]
    df = spark.createDataFrame(k5 + chains, "src long, dst long")
    rows = kcore_peel(df, k=4, rounds=4).collect()
    assert sorted((r["node"], r["deg"]) for r in rows) == [
        (0, 4), (1, 4), (2, 4), (3, 4), (4, 4)]
    assert kcore_peel(df, k=5, rounds=4).count() == 0


def test_kcore_monotone_rounds(spark):
    """More peel rounds can only shrink the survivor set (each round's
    alive set is a subset of the previous)."""
    from osm_pbf_parquet_spark.operators.graph import kcore_peel

    rng = __import__("random").Random(3)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(200)})
    df = spark.createDataFrame(edges, "src long, dst long")
    sizes = [kcore_peel(df, k=3, rounds=r).count() for r in (1, 2, 4)]
    assert sizes[0] >= sizes[1] >= sizes[2]


def test_kcore_rejects_bad_args(spark):
    from osm_pbf_parquet_spark.operators.graph import kcore_peel

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore_peel(df, k=3, rounds=0)
    with pytest.raises(ValueError):
        kcore_peel(df, k=0, rounds=1)


def test_basket_pairs_mega_basket_guard(spark):
    """One pathological basket whose items are all frequent defeats
    Apriori pruning (quadratic fan-out). With max_basket_items the job
    must FAIL naming the basket; without it the documented-unbounded
    contract still computes."""
    from osm_pbf_parquet_spark.operators.itemsets import basket_pairs

    # 12 items, each in 2 baskets (so all pass min_item=2), and basket 0
    # holds all 12 -> 66 pairs from one basket
    rows = [(0, i) for i in range(12)] + [(i + 1, i) for i in range(12)]
    df = spark.createDataFrame(rows, "basket long, item long")
    pairs, _ = basket_pairs(df, "basket", "item", min_item=2)
    assert pairs.count() == 66  # unbounded contract unchanged
    pairs, _ = basket_pairs(
        df, "basket", "item", min_item=2, max_basket_items=8
    )
    with pytest.raises(Exception, match="max_basket_items=8"):
        pairs.count()
    # a cap that every basket satisfies changes nothing
    pairs, _ = basket_pairs(
        df, "basket", "item", min_item=2, max_basket_items=12
    )
    assert pairs.count() == 66
