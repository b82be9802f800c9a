"""Hive-bucketed co-located joins: the write-once-shuffle-never layout
for a pipeline's hot join key (sinks/bucketed.py)."""

from __future__ import annotations

import os

from osm_pbf_parquet_spark.plans.relational import t
from osm_pbf_parquet_spark.sinks.bucketed import write_bucketed

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_zero_exchange(spark, tmp_path):
    """Both sides bucketed+sorted on the join key -> SortMergeJoin with
    no Exchange on either side. Broadcast is disabled for the audit: at
    testdata scale AQE would broadcast the small side, but at the scale
    bucketing exists for (two fact tables) neither side broadcasts."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = write_bucketed(
            spark,
            t(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus"),
            "audit_bucketed_orders", "o_orderkey", 8,
            os.path.join(str(tmp_path), "orders"),
        )
        l = write_bucketed(
            spark,
            t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice"),
            "audit_bucketed_lineitem", "l_orderkey", 8,
            os.path.join(str(tmp_path), "lineitem"),
        )
        j = l.join(o, l.l_orderkey == o.o_orderkey)
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point of the layout
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS audit_bucketed_orders")
        spark.sql("DROP TABLE IF EXISTS audit_bucketed_lineitem")


def test_bucketed_join_matches_plain_join(spark, tmp_path):
    orders = t(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    lineitem = t(spark, SF_DIR, "lineitem").select("l_orderkey")
    try:
        o = write_bucketed(spark, orders, "eq_bucketed_orders", "o_orderkey",
                           8, os.path.join(str(tmp_path), "orders"))
        l = write_bucketed(spark, lineitem, "eq_bucketed_lineitem",
                           "l_orderkey", 8,
                           os.path.join(str(tmp_path), "lineitem"))
        got = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus").count()
            .collect()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS eq_bucketed_orders")
        spark.sql("DROP TABLE IF EXISTS eq_bucketed_lineitem")
    want = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus").count()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
