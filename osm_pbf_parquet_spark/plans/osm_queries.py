"""OSM-native queries for the driver contract.

The testdata sf dirs carry no OSM table, so these run the real PBF path on
the reference's golden fixture (tiny, read-only, content pinned by
``osmpbf/tests/read.rs``). No SQL oracle is possible (DuckDB can't read
PBF) → the driver records the weaker rows-only check; full value-level
verification lives in tests/test_pbf_decode.py and tests/test_transcode.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import osm_ops
from ..sources.pbf_source import scan_pbf

FIXTURE = "/root/reference/osmpbf/tests/test.osm.pbf"


def q_osm_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 par_map_reduce parity query (expects 3 nodes / 1 way / 1 rel)."""
    return osm_ops.count_by_type(scan_pbf(spark, FIXTURE))


def q_osm_filter_with_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2+F3 read_ways_and_deps parity: building ways + their nodes."""
    osm = scan_pbf(spark, FIXTURE)
    out = osm_ops.filter_with_deps(
        osm, F.element_at("tags", "building") == "yes"
    )
    return out.select("id", "type", "lat", "lon")


def q_osm_latest_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History compaction (window dedup) on the fixture elements."""
    osm = scan_pbf(spark, FIXTURE)
    return osm_ops.latest_versions(osm).select("id", "type", "version", "visible")


def q_osm_tag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return osm_ops.tag_histogram(scan_pbf(spark, FIXTURE))


def q_osm_way_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Way geometry materialization (explode→join→collect ordered)."""
    return osm_ops.way_node_join(scan_pbf(spark, FIXTURE))


def q_osm_datasource_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 via the Python DataSource API: ``format("osmpbf")`` with type
    pushdown — the plan shows ``PushedFilters: [EqualTo(type,node)]`` on
    the BatchScan and way/relation groups never decode
    (tests/test_plan_audit.py asserts the plan property)."""
    from ..sources.pbf_datasource import register_osm_pbf

    register_osm_pbf(spark)
    return (
        spark.read.format("osmpbf")
        .load(FIXTURE)
        .filter("type = 'node'")
        .select("id", "lat", "lon", "user", "version")
    )


OSM_QUERIES: dict[str, tuple] = {
    "osm_count_by_type": (q_osm_count_by_type, None),
    "osm_datasource_nodes": (q_osm_datasource_nodes, None),
    "osm_filter_with_deps": (q_osm_filter_with_deps, None),
    "osm_latest_versions": (q_osm_latest_versions, None),
    "osm_tag_histogram": (q_osm_tag_histogram, None),
    "osm_way_geometry": (q_osm_way_geometry, None),
}
