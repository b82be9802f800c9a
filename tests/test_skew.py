"""Salted aggregation correctness: the skew-proof plans must produce
exactly the answers of their single-shuffle equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators.skew import (
    salted_collect_set,
    salted_distinct_count,
)
from osm_pbf_parquet_spark.plans.relational import t

SF_DIR = "/root/testdata/sf0.01"


def test_salted_distinct_count_matches_plain(spark):
    li = t(spark, SF_DIR, "lineitem")
    plain = {
        (r["l_returnflag"]): r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    salted = {
        (r["l_returnflag"]): r["n_supp"]
        for r in salted_distinct_count(
            li, ["l_returnflag"], "l_suppkey", "n_supp"
        ).collect()
    }
    assert salted == plain


def test_salted_distinct_count_skewed_input(spark):
    """A pathological 1-key distribution still counts exactly."""
    df = spark.range(100_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 1000).alias("v")
    )
    [r] = salted_distinct_count(df, ["k"], "v").collect()
    assert (r["k"], r["n_distinct_v"]) == ("hot", 1000)


def test_salted_collect_set_matches_plain(spark):
    o = t(spark, SF_DIR, "orders").limit(2000)
    plain = {
        r["o_orderpriority"]: sorted(r["s"])
        for r in o.groupBy("o_orderpriority")
        .agg(F.collect_set("o_orderstatus").alias("s"))
        .collect()
    }
    salted = {
        r["o_orderpriority"]: list(r["o_orderstatus_set"])
        for r in salted_collect_set(
            o, ["o_orderpriority"], "o_orderstatus"
        ).collect()
    }
    assert salted == plain


def test_approx_sketch_accuracy(spark):
    """The sketch query certifies its own accuracy: every bounded-error
    boolean must be TRUE and the exact counts must match a plain
    countDistinct."""
    from osm_pbf_parquet_spark.plans.relational import q_approx_sketches

    li = t(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    rows = q_approx_sketches(spark, SF_DIR).collect()
    assert len(rows) == len(exact)
    for r in rows:
        assert r["exact_parts"] == exact[r["l_returnflag"]]
        assert r["parts_ok"] and r["p50_ok"] and r["p95_ok"]
