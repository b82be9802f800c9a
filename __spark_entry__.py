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
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in _registry().items()
        if oracle is not None
    }
