"""Every declared query must hash-match its DuckDB oracle at sf0.01 —
the same bar the driver's CORRECTNESS gate applies."""

from __future__ import annotations

import pytest

from osm_pbf_parquet_spark.plans.analytic_queries import ANALYTIC_QUERIES
from osm_pbf_parquet_spark.plans.osm_queries import OSM_QUERIES
from osm_pbf_parquet_spark.plans.relational import QUERIES

from oracle_harness import run_compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(ANALYTIC_QUERIES))
def test_analytic_oracle_parity(spark, name):
    fn, oracle = ANALYTIC_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_relational_oracle_parity(spark, name):
    fn, oracle = QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)


@pytest.mark.parametrize("name", sorted(OSM_QUERIES))
def test_osm_oracle_parity(spark, name):
    """Golden-fixture VALUES oracles: full value-hash checks against the
    reference's pinned test.osm.pbf content (read.rs:109-208)."""
    fn, oracle = OSM_QUERIES[name]
    run_compare(spark, SF_DIR, name, fn, oracle)
