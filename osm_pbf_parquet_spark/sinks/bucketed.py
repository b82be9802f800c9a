"""Hive-bucketed parquet tables for shuffle-free co-located joins.

The third leg of the join-strategy triad (broadcast for small dims,
AQE-shuffled hash/SMJ for one-off joins, BUCKETING for joins repeated
across many queries): writing both fact tables bucketed-and-sorted on
the join key means every subsequent equi-join on that key runs with ZERO
Exchange on either side — at 100 TB the dominant cost of a fact-fact
join is exactly that shuffle, paid once at write time instead of per
query. The bucketed layout only survives through the session catalog
(``saveAsTable``), not a bare ``read.parquet`` path — Spark's bucket
metadata lives in the table definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    spark: SparkSession, df: DataFrame, name: str, bucket_col: str,
    n_buckets: int, path: str,
) -> DataFrame:
    """Write ``df`` as an external parquet table bucketed AND sorted by
    ``bucket_col``; returns the catalog-backed DataFrame (reading via
    ``spark.table`` keeps the bucket spec, enabling exchange-free joins
    between tables sharing (key, n_buckets)). Sorting within buckets
    additionally removes the join-time Sort for sort-merge joins."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(name)
    )
    return spark.table(name)
