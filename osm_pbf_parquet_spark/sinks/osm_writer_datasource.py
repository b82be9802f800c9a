"""``df.write.format("osmparquet")`` — Python DataSource WRITER API.

The idiomatic Spark 4 packaging of the native sink: any DataFrame in the
OSM wide schema (a ``scan_pbf`` result, a filtered subset, a repartitioned
stream) writes hive-partitioned ``type=*/`` zstd parquet through the same
pyarrow kind-writer machinery as ``sinks.native_sink`` — Arrow batches
flow straight from the executor into the C++ parquet writer
(``DataSourceArrowWriter``), never materializing Python row objects.

    from osm_pbf_parquet_spark.sinks.osm_writer_datasource import register_osm_parquet
    register_osm_parquet(spark)
    df.write.format("osmparquet").mode("overwrite") \
        .option("compression", "zstd").option("zstd_level", "3") \
        .save("/out/dir")

Commit protocol — here Spark drives it, which is exactly what the API is
for: each task's ``write()`` returns the files it committed (renamed from
``.inprogress`` at task end) as its ``WriterCommitMessage``; the driver
calls ``commit(messages)`` once every task succeeded — which prunes
losing/partial files of THIS job (run-token scoped, so ``append`` jobs
never disturb earlier output) and drops ``_SUCCESS`` — or ``abort()``,
which deletes everything this job wrote. Compare ``sinks/native_sink.py``
where the fused transcode implements the same protocol by hand because
its write happens inside a ``mapInArrow`` stage.

Unlike the fused sink this path receives whatever the upstream plan
produces (shuffles, filters, joins included), so it is the general-
purpose sink; the fused sink remains the fast path for the pure
PBF→parquet product flow.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    WriterCommitMessage,
)


class _Committed(WriterCommitMessage):
    """Files one task committed (picklable payload back to the driver)."""

    def __init__(self, files: list[str]):
        self.files = files


class OsmParquetWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmparquet writer requires a save path")
        self.codec = options.get("compression", "zstd")
        level = options.get("zstd_level")
        self.level = int(level) if level is not None else (
            3 if self.codec == "zstd" else None
        )
        self.target_bytes = int(options.get("target_file_mb", 500)) * 1024 * 1024
        self.rows_per_group = int(options.get("rows_per_group", 400_000))
        self.sort_by_id = options.get("sort_by_id", "false").lower() == "true"
        self.run_token = f"j{uuid.uuid4().hex[:12]}"
        if overwrite and os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator: Iterator) -> _Committed:  # executor side
        import pyarrow as pa
        from pyspark import TaskContext

        from .native_sink import write_kind_tables

        ctx = TaskContext.get()
        prefix = (
            f"part-{self.run_token}-{ctx.partitionId():05d}-{ctx.taskAttemptId()}"
        )
        tables = (pa.Table.from_batches([b]) for b in iterator)
        stats = write_kind_tables(
            tables, self.path, prefix, self.codec, self.level,
            self.target_bytes, self.rows_per_group, self.sort_by_id,
        )
        return _Committed([s[1] for s in stats])

    def commit(self, messages) -> None:  # driver side, all tasks succeeded
        from .native_sink import _finalize_output

        committed = {f for m in messages if m is not None for f in m.files}
        _finalize_output(self.path, committed, self.run_token)

    def abort(self, messages) -> None:  # driver side, job failed
        for kind_dir in os.listdir(self.path):
            full = os.path.join(self.path, kind_dir)
            if not os.path.isdir(full):
                continue
            for fname in os.listdir(full):
                if self.run_token in fname:
                    os.remove(os.path.join(full, fname))


class OsmParquetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "osmparquet"

    def writer(self, schema, overwrite: bool) -> OsmParquetWriter:
        return OsmParquetWriter(self.options, overwrite)


def register_osm_parquet(spark) -> None:
    spark.dataSource.register(OsmParquetDataSource)
