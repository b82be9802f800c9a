"""Sinks: the hive-partitioned Parquet writer matching the reference contract."""
