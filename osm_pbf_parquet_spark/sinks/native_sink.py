"""Fused transcode sink: parse + write in ONE distributed map stage.

The generic sink (``parquet_sink.write_osm_parquet``) routes kernel output
through Spark's row pipeline: every Arrow batch the parse kernel emits is
converted to JVM InternalRows (ArrowEvalPython), carried through the plan,
then re-encoded columnar by the JVM parquet writer. For the transcode
product — whose only consumer of the rows IS the parquet writer — that
row round-trip is pure overhead: measured at ~3× the cost of the parse
itself on a 130 MB input.

``transcode_pbf`` removes it. Each task parses its blob ranges and writes
hive-partitioned zstd parquet **directly from the Arrow batches** with
pyarrow's C++ writer, yielding only a tiny per-file stats batch. This is
the reference's own architecture — decode task feeding a parquet sink in
the same worker (``osm-pbf-parquet/src/pbf.rs:51-98`` →
``sink.rs:69-117``) — expressed Spark-first: the blob catalog is the
DataFrame, Spark schedules/distributes/retries the map stage, and the
data plane stays columnar end-to-end (PBF bytes → numpy → Arrow →
parquet) with zero per-row materialization anywhere.

Output contract parity (same as the generic sink):
- layout ``{out}/type={kind}/part-*.parquet``   (``sink.rs:155-179``, W1)
- zstd, level-configurable                       (``sink.rs:134-153``, W5)
- target file size rolling                       (``sink.rs:82-105``, W3)
- ``_SUCCESS`` marker on job completion          (commit protocol, W4)

Commit protocol (replaces Spark's OutputCommitter, which only serves the
JVM writer path): tasks write to ``.inprogress`` names and rename to
final names — which embed the task attempt id, so concurrent speculative
attempts can never collide — only at task end; the driver then keeps
exactly the files reported by collected stats rows (one winning attempt
per partition), deleting stragglers from lost/duplicate attempts before
writing ``_SUCCESS``. Local/POSIX filesystem semantics; an object-store
deployment would swap the rename for a multipart-commit (documented
limitation, same one the reference's local writer has).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterator

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from ..pbf.decode import ALL_KINDS
from ..schema import OSM_TYPES

# one row group per ~this many rows: big enough for good column encoding
# and row-group-stat pruning, small enough to bound task memory (a 32 MB
# uncompressed blob holds ~8k-1M elements; groups accumulate across blobs)
_ROWS_PER_GROUP = 400_000


class _KindWriter:
    """Rolling parquet writer for one element kind inside one task."""

    __slots__ = ("kind", "kind_dir", "prefix", "codec", "level", "target_bytes",
                 "rows_per_group", "sort_by_id", "writer", "path", "file_no",
                 "rows", "pending", "pending_rows", "stats")

    def __init__(self, kind: str, kind_dir: str, prefix: str, codec: str,
                 level: int | None, target_bytes: int, stats: list,
                 rows_per_group: int = _ROWS_PER_GROUP,
                 sort_by_id: bool = False) -> None:
        os.makedirs(kind_dir, exist_ok=True)
        self.kind = kind
        self.kind_dir = kind_dir
        self.prefix = prefix
        self.codec = codec
        self.level = level
        self.target_bytes = target_bytes
        self.rows_per_group = rows_per_group
        self.sort_by_id = sort_by_id
        self.writer: pq.ParquetWriter | None = None
        self.path = ""
        self.file_no = 0
        self.rows = 0
        self.pending: list[pa.Table] = []
        self.pending_rows = 0
        self.stats = stats

    def _open(self, schema: pa.Schema) -> None:
        self.path = os.path.join(
            self.kind_dir, f"{self.prefix}-{self.file_no:03d}.{self.codec}.parquet"
        )
        # Encoding tuning, measured on the 10M-node bench input: dictionary
        # OFF everywhere (unique ids/coords make dict attempts pure waste)
        # + DELTA_BINARY_PACKED for the near-sorted int64 columns writes
        # the node table 1.8x faster AND 19% smaller (7.6s/213 MB ->
        # 4.3s/172 MB at zstd-3). BYTE_STREAM_SPLIT for lat/lon was faster
        # still but Spark's vectorized parquet reader rejects it — both
        # Spark and DuckDB read DELTA_BINARY_PACKED fine. Round-5 re-sweep:
        # extending delta to timestamp (INT64 physical) and the way-ref
        # list elements (near-sorted node ids) cuts write time another 33%
        # and output 13% at the same zstd-3 (1.48s/42.0 MB -> 0.99s/36.5 MB
        # on the 25 MB profile input); both Spark's vectorized reader and
        # DuckDB read the nested-element encoding (verified by aggregate
        # parity). DELTA_BYTE_ARRAY on user/tag strings measured neutral.
        delta_cols = {"id", "changeset", "uid", "version", "timestamp"}
        encoding = {
            f.name: "DELTA_BINARY_PACKED"
            for f in schema if f.name in delta_cols
        }
        if "nds" in schema.names:
            encoding["nds.list.element"] = "DELTA_BINARY_PACKED"
        self.writer = pq.ParquetWriter(
            self.path + ".inprogress", schema, compression=self.codec,
            compression_level=self.level,
            use_dictionary=False,
            column_encoding=encoding,
        )
        self.rows = 0

    def add(self, table: pa.Table) -> None:
        self.pending.append(table)
        self.pending_rows += table.num_rows
        if self.pending_rows >= self.rows_per_group:
            self._flush_group()

    def _flush_group(self) -> None:
        if not self.pending_rows:
            return
        table = pa.concat_tables(self.pending).combine_chunks()
        self.pending, self.pending_rows = [], 0
        if self.sort_by_id:
            # row-group stats are the zone-map granularity (F2 parity):
            # sorting each group makes its id min/max exact. Blobs are
            # id-ordered in real planet files, so this is a near-no-op
            # local touch-up, not a shuffle.
            table = table.sort_by("id")
        if self.writer is None:
            self._open(table.schema)
        self.writer.write_table(table, row_group_size=self.rows_per_group)
        self.rows += table.num_rows
        # file_handle position ≈ compressed bytes flushed so far — the same
        # "estimate then roll" discipline as the reference's byte estimator
        if os.path.getsize(self.path + ".inprogress") >= self.target_bytes:
            self._roll()

    def _roll(self) -> None:
        if self.writer is None:
            return
        self.writer.close()
        os.replace(self.path + ".inprogress", self.path)
        self.stats.append((self.kind, self.path,
                           self.rows, os.path.getsize(self.path)))
        self.writer = None
        self.file_no += 1

    def close(self) -> None:
        self._flush_group()
        self._roll()


def write_kind_tables(tables: Iterator, out_path: str, prefix: str,
                      codec: str, level: int | None, target_bytes: int,
                      rows_per_group: int, sort_by_id: bool,
                      kinds=None) -> list[tuple]:
    """Shared task-side write loop (the fused transcode kernel and the
    ``osmparquet`` DataSource writer both route through here): split each
    incoming Arrow table by ``type``, drop the column (the hive dir
    carries it), append to rolling per-kind writers, and return the
    committed-file stats. On ANY failure every file this task produced is
    removed — the open ``.inprogress`` partial AND files already rolled
    to final names (a rolled file from a failed attempt would otherwise
    survive a job-level failure in append mode and duplicate rows on the
    next tick's retry)."""
    stats: list[tuple] = []
    writers: dict[str, _KindWriter] = {}
    try:
        for table in tables:
            if "type" not in table.column_names:
                raise ValueError("OSM writer requires a 'type' column")
            types = table.column("type")
            for kind in OSM_TYPES:
                if kinds is not None and kind not in kinds:
                    continue
                part = table.filter(pc.equal(types, kind))
                if part.num_rows == 0:
                    continue
                w = writers.get(kind)
                if w is None:
                    w = writers[kind] = _KindWriter(
                        kind, os.path.join(out_path, f"type={kind}"),
                        prefix, codec, level, target_bytes, stats,
                        rows_per_group, sort_by_id,
                    )
                w.add(part.drop_columns(["type"]))
        for w in writers.values():
            w.close()
    except BaseException:
        for w in writers.values():
            if w.writer is not None:
                try:
                    w.writer.close()
                except Exception:
                    pass
                try:
                    os.remove(w.path + ".inprogress")
                except OSError:
                    pass
        for _kind, fpath, _rows, _bytes in stats:  # rolled final-named files
            try:
                os.remove(fpath)
            except OSError:
                pass
        raise
    return stats


def _finalize_output(out_path: str, committed: set[str],
                     run_token: str | None = None) -> None:
    """Job-commit step: delete THIS JOB's partition-dir files that were
    NOT committed by a winning attempt (``.inprogress`` partials from
    failed tasks, complete files from losing speculative attempts), then
    write ``_SUCCESS``. ``run_token`` scopes the cleanup to files this
    job wrote — append-mode jobs must never touch earlier jobs' output
    (None = legacy unscoped behavior, only safe for overwrite mode)."""
    for kind_dir in os.listdir(out_path):
        full = os.path.join(out_path, kind_dir)
        if not os.path.isdir(full):
            continue
        for fname in os.listdir(full):
            if run_token is not None and run_token not in fname:
                continue  # another job's file — not ours to judge
            fpath = os.path.join(full, fname)
            if fname.endswith(".inprogress") or fpath not in committed:
                os.remove(fpath)
    with open(os.path.join(out_path, "_SUCCESS"), "w"):
        pass


def transcode_pbf(
    spark: SparkSession,
    path: str | list[str],
    out_path: str,
    compression: str = "zstd",
    zstd_level: int | None = 3,
    target_file_mb: int = 500,
    blobs_per_task: int | None = None,
    kinds=ALL_KINDS,
    mode: str = "overwrite",
    rows_per_group: int = _ROWS_PER_GROUP,
    sort_by_id: bool = False,
) -> dict:
    """PBF → hive-partitioned parquet in one fused map stage.

    Returns ``{"files": [...], "rows": {kind: n}, "bytes": total}``. The
    output reads back with ``spark.read.parquet(out_path)`` identically to
    the generic sink's (``tests/test_transcode.py`` pins the equivalence).
    """
    from ..sources.pbf_source import (
        _catalog_rows,
        _partitioned_catalog,
        normalize_kinds_columns,
    )

    kinds_list, _ = normalize_kinds_columns(kinds, None)
    if mode not in ("overwrite", "error", "append"):
        raise ValueError(f"unsupported mode: {mode}")
    # The commit protocol (task-side renames + driver finalize over
    # os.listdir) requires driver and executors to share ONE POSIX
    # filesystem. That holds on local[*] masters; on a multi-node cluster
    # the driver would finalize against paths it cannot see and silently
    # produce empty/inconsistent output — fail fast instead.
    master = spark.sparkContext.master or ""
    if not master.startswith("local"):
        raise ValueError(
            "transcode_pbf's fused sink assumes a shared POSIX filesystem "
            f"(task renames + driver finalize); master {master!r} is not "
            "local. Use sinks.parquet_sink.write_osm_parquet (Spark-managed "
            "commit) or the 'osmparquet' DataSource writer on a cluster."
        )
    if os.path.exists(out_path):
        if mode == "overwrite":
            shutil.rmtree(out_path)
        elif mode == "error":
            raise ValueError(f"output path exists: {out_path}")
    os.makedirs(out_path, exist_ok=True)
    # per-job token in every file name: append-mode finalize cleans up ONLY
    # this job's losing/partial files, never earlier jobs' committed output
    run_token = f"j{uuid.uuid4().hex[:12]}"

    rows, n_groups = _catalog_rows(
        path, spark.sparkContext.defaultParallelism, blobs_per_task,
        # kind-mixed round-robin runs: byte-equal contiguous chunks left
        # the way/relation span in one 4x-CPU straggler task (see
        # _catalog_rows) — the transcode's per-task outputs are
        # assignment-independent, so the fused sink takes the balanced
        # deal unconditionally
        interleave=True,
    )
    catalog = _partitioned_catalog(spark, rows, n_groups)
    target_bytes = target_file_mb * 1024 * 1024
    codec = compression
    level = zstd_level if compression == "zstd" else None

    def _transcode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        from ..sources.pbf_source import parse_blob_entries

        ctx = TaskContext.get()
        prefix = f"part-{run_token}-{ctx.partitionId():05d}-{ctx.taskAttemptId()}"

        def entries():
            for b in batches:
                yield from zip(
                    b.column("path").to_pylist(),
                    b.column("offset").to_pylist(),
                    b.column("size").to_pylist(),
                )

        tables = (
            pa.Table.from_batches([batch])
            for batch in parse_blob_entries(entries(), kinds_list, None)
        )
        stats = write_kind_tables(
            tables, out_path, prefix, codec, level, target_bytes,
            rows_per_group, sort_by_id, kinds=kinds_list,
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([s[0] for s in stats], pa.string()),
                pa.array([s[1] for s in stats], pa.string()),
                pa.array([s[2] for s in stats], pa.int64()),
                pa.array([s[3] for s in stats], pa.int64()),
            ],
            names=["kind", "file", "rows", "bytes"],
        )

    stat_rows = catalog.mapInArrow(
        _transcode, schema="kind string, file string, rows long, bytes long"
    ).collect()

    committed = {r["file"] for r in stat_rows}
    _finalize_output(out_path, committed, run_token)

    per_kind: dict[str, int] = {}
    for r in stat_rows:
        per_kind[r["kind"]] = per_kind.get(r["kind"], 0) + r["rows"]
    return {
        "files": sorted(committed),
        "rows": per_kind,
        "bytes": sum(r["bytes"] for r in stat_rows),
    }
