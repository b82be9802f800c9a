"""osm_pbf_parquet_spark — a PySpark-native OSM PBF → Parquet analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Rust pipeline (OvertureMaps/osm-pbf-parquet), re-expressed
Spark-first:

- ``sources.pbf_source.scan_pbf``  — distributed PBF scan (blob-index pass on
  the driver + ``mapInArrow`` parse kernel on executors).
- ``sinks.parquet_sink.write_osm_parquet`` — hive-partitioned zstd Parquet
  sink matching the reference's output contract.
- ``operators`` — the reference's library entry points (count_by_type,
  filter_with_deps, …) plus large-scale training-data operators (dedup,
  similarity search, text analysis, multimodal).

Everything here is public-knowledge PySpark; no code is copied from the
reference (cited by file:line in docstrings for parity checking only).
"""

__version__ = "0.1.0"
