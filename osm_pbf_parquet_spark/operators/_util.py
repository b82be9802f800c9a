"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_compute(df: DataFrame) -> DataFrame:
    """Match a compute-heavy per-row stage's parallelism to the cluster,
    not the input file count: a small corpus in one parquet file (or one
    row group) would otherwise run the whole signature/dot-product chain
    on a single core. No-op when the scan already has enough partitions —
    any real-scale input — so no shuffle is added at 100 TB; on small
    inputs the tiny repartition cost is repaid many times over."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
