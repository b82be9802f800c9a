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
# ROUND-9 ROTATION (mechanically derived by tools/taint_ledger.py on the
# final r9 tree — TAINT_LEDGER.json is the committed evidence; the counts
# below are restated from its must_cover/never_checked fields, not hand
# arithmetic):
#
#   5 never-checked r9-new gates (training_set_assembly,
#   margin_bitext_ann, gopher_quality, fingerprint_decontaminate,
#   stream_fingerprint_decontaminate)
#   + 17 line-tainted + 2 fingerprint-drifted
#   (osm_way_geometry, higher_order_arrays — one-time re-anchor after
#   the ledger's lambda-counter canonicalization fix) = 24 must-cover,
#   ALL IN-CAP:
#     - 15 gates migrated off the deleted legacy t() loader
#       (multimodal_metadata/features/decode/audio/frames,
#       udtf_top_words, udaf_median_chars, jsonl_roundtrip,
#       grouped_split, mutual_information, gram_matrix,
#       sample_chunk_windows, sample_length_buckets, sample_uniform_n,
#       sample_hash_split)
#     - bloom_decontaminate (probe-plan rewrite: per-row forall bit
#       tests against the 1-row broadcast word map)
#     - margin_bitext_mine (sub-k mu guard in margin_from_candidates +
#       matching oracle change)
#
# The remaining 26 slots are freshness fills, oldest-green-first (r8
# verdict ask #3): the analytic r3 block that yielded its slots two
# rounds running (rollup_agg, ntile_quartiles, grouping_sets_agg,
# cube_agg, anti_join, approx_sketches, filter_project, lag_lead_gap,
# ... all last green r3), then the oldest r4 gates.
_CHECK_FIRST = [
    # --- 24 must-cover (5 never-checked + 17 line-tainted + 2 re-anchors) ---
    "training_set_assembly",
    "margin_bitext_ann",
    "gopher_quality",
    "fingerprint_decontaminate",
    "stream_fingerprint_decontaminate",
    "margin_bitext_mine",
    "bloom_decontaminate",
    "multimodal_metadata",
    "multimodal_features",
    "multimodal_decode",
    "multimodal_audio",
    "multimodal_frames",
    "udtf_top_words",
    "udaf_median_chars",
    "jsonl_roundtrip",
    "grouped_split",
    "mutual_information",
    "gram_matrix",
    "sample_chunk_windows",
    "sample_length_buckets",
    "sample_uniform_n",
    "sample_hash_split",
    # --- 26 freshness fills (last green r3) ---
    "rollup_agg",
    "ntile_quartiles",
    "grouping_sets_agg",
    "cube_agg",
    "anti_join",
    "approx_sketches",
    "filter_project",
    "lag_lead_gap",
    "count_by_type",
    "multi_supplier_late_orders",
    "nation_trade_volume",
    "outer_join_agg",
    "parts_supplier_diversity",
    "pricing_summary",
    "range_join_binned",
    "region_revenue",
    "rich_inactive_customers",
    "running_total",
    "semi_join",
    "set_ops",
    "stream_click_attribution",
    "stream_dedup_user_types",
    "stream_enriched_counts",
    "stream_sessionize_stateful",
    "stream_windowed_counts",
    "top_revenue_orders",
    # r9 tool-fix drift absorption: the ledger's plan fingerprint now
    # canonicalizes PySpark's process-global lambda-variable counter
    # (lambda x_1 vs x_4 — registry-order-dependent before), which
    # one-time-drifts the only two Python-lambda-HOF plans; both take a
    # fresh row here to re-anchor their baselines.
    "osm_way_geometry",
    "higher_order_arrays",
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
