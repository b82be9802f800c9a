"""Driver contract for the spark-graft builder (PySpark target).

``entry`` smoke-runs the flagship query; ``queries``/``oracle_sql`` expose
the engine's declared operator surface (SURVEY.md §2) for the DuckDB
correctness gate. Implementations live in ``osm_pbf_parquet_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-shaped pricing
    summary (scan → partial agg → final agg)."""
    from osm_pbf_parquet_spark.plans.relational import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def _registry() -> dict[str, tuple]:
    from osm_pbf_parquet_spark.plans.relational import QUERIES as RELATIONAL
    from osm_pbf_parquet_spark.plans.osm_queries import OSM_QUERIES
    from osm_pbf_parquet_spark.plans.analytic_queries import ANALYTIC_QUERIES

    reg: dict[str, tuple] = {}
    reg.update(RELATIONAL)
    reg.update(OSM_QUERIES)
    reg.update(ANALYTIC_QUERIES)
    try:  # data-pipeline operator suites land incrementally
        from osm_pbf_parquet_spark.plans.pipeline_queries import PIPELINE_QUERIES
        from osm_pbf_parquet_spark.plans.sampling_queries import SAMPLING_QUERIES

        reg.update(PIPELINE_QUERIES)
        reg.update(SAMPLING_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.advanced_queries import ADVANCED_QUERIES

        reg.update(ADVANCED_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.mining_queries import MINING_QUERIES

        reg.update(MINING_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.quality_queries import QUALITY_QUERIES

        reg.update(QUALITY_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.eval_queries import EVAL_QUERIES

        reg.update(EVAL_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.media_queries import MEDIA_QUERIES

        reg.update(MEDIA_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.tokenizer_queries import (
            TOKENIZER_QUERIES,
        )

        reg.update(TOKENIZER_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.stream_dedup_queries import (
            STREAM_DEDUP_QUERIES,
        )

        reg.update(STREAM_DEDUP_QUERIES)
    except ImportError:
        pass
    try:
        from osm_pbf_parquet_spark.plans.selection_queries import (
            SELECTION_QUERIES,
        )

        reg.update(SELECTION_QUERIES)
    except ImportError:
        pass
    return _verification_order(reg)


# The correctness driver checks the FIRST 50 registry entries, so insertion
# order decides which queries get a gate row each round. Front-load (a)
# queries that have never had a driver check, (b) queries added/changed this
# round whose behavior must be certified, (c) queries whose last green row
# predates a change to the module they run through. Long-stable queries take
# the tail — every registered query keeps at least one green CORRECTNESS row
# across rounds.
#
# ROUND-10 ROTATION (mechanically derived by tools/taint_ledger.py on the
# final r10 tree — TAINT_LEDGER.json is the committed evidence; counts
# restated from its never_checked/must_cover fields):
#
#   6 never-checked r10-new gates (osm_apply_changes,
#   stream_osm_apply_changes, quality_classifier,
#   stream_quality_classifier, pca_power_scores, kcenter_select)
#   + 3 line-tainted (margin_bitext_ann + margin_bitext_mine: the
#     unhinted mu attach in margin_from_candidates; gopher_quality: the
#     published symbol-occurrence counting + matching oracle)
#   + 11 module-binding-tainted (the r10 ledger fallback closing the
#     <module>-frame blind spot flags pre-existing module constants
#     changed since these queries' greens: the advanced_queries r5
#     block — cogroup_reconcile, salted_join, cohort_retention,
#     poisson_bootstrap, zscore_anomalies — and the quality_queries r6
#     block — profile_table, dq_checks, mad_outliers, ewma_smooth,
#     stream_dq_monitor, group_regression)
#   = 20 must-cover, ALL IN-CAP.
#
# The remaining 30 slots are freshness fills, oldest-green-first (r9
# verdict ask #2): topk_per_group (the last r3 row), the entire r4
# block, and the r5 block minus one (zorder_spatial stays at r5) —
# after r10 no registered query's last green row is older than r6,
# beating the "nothing older than r5" target.
_CHECK_FIRST = [
    # --- 20 must-cover (6 never-checked + 3 line- + 11 module-binding-tainted) ---
    "osm_apply_changes",
    "stream_osm_apply_changes",
    "quality_classifier",
    "stream_quality_classifier",
    "pca_power_scores",
    "kcenter_select",
    "margin_bitext_ann",
    "margin_bitext_mine",
    "gopher_quality",
    "cogroup_reconcile",
    "salted_join",
    "cohort_retention",
    "poisson_bootstrap",
    "zscore_anomalies",
    "profile_table",
    "dq_checks",
    "mad_outliers",
    "ewma_smooth",
    "stream_dq_monitor",
    "group_regression",
    # --- 30 freshness fills (oldest green first: r3, then r4, then r5) ---
    "topk_per_group",
    "argmin_per_group",
    "asof_join",
    "bucketed_join_agg",
    "date_gapfill",
    "distinct_agg",
    "exists_agg",
    "geo_distance",
    "json_extract",
    "ntile_quartiles_scalable",
    "or_predicate_join",
    "osm_tag_histogram",
    "percentiles",
    "pivot_counts",
    "range_window",
    "salted_distinct_count",
    "scalar_functions",
    "scalar_subquery",
    "sessionize",
    "union_distinct",
    "word_topk",
    "osm_count_by_type",
    "osm_datasource_nodes",
    "osm_filter_with_deps",
    "osm_geohash",
    "osm_header_metadata",
    "osm_latest_versions",
    "osm_loc_on_ways",
    "osm_relation_members",
    "zorder_bbox_search",
    # ---- cap boundary: the 50 names above are positions 1-50 (pinned in
    #      test_entry). Everything below is swept by the local
    #      full-registry parity tests on current code every pytest run. ----
]



def _verification_order(reg: dict[str, tuple]) -> dict[str, tuple]:
    head = {n: reg[n] for n in _CHECK_FIRST if n in reg}
    head.update((n, v) for n, v in reg.items() if n not in head)
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in _registry().items()
        if oracle is not None
    }
