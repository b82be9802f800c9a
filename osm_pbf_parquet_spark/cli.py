"""Engine CLI: transcode OSM PBF → hive-partitioned zstd Parquet.

Parity: the reference binary's surface (``osm-pbf-parquet/src/util.rs:24-176``
clap Args + validation; driver orchestration ``lib.rs:23-56``).

    python -m osm_pbf_parquet_spark.cli --input planet.osm.pbf --output ./parquet
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="osm-pbf-parquet-spark")
    p.add_argument("--input", required=True, nargs="+",
                   help="one or more .osm.pbf paths (local or any Hadoop-FS URL)")
    p.add_argument("--output", required=True, help="output directory for type=*/ parquet")
    p.add_argument("--compression", default="zstd:3",
                   help="codec[:level], e.g. zstd:3 (reference default, util.rs:39), zstd:9, snappy, none")
    p.add_argument("--target-file-mb", type=int, default=500,
                   help="approximate output file size target (reference default 500MB, util.rs:61-63)")
    p.add_argument("--blobs-per-task", type=int, default=None)
    p.add_argument("--sort-by-id", action="store_true",
                   help="cluster output by id for row-group pruning (improvement; reference does not sort)")
    p.add_argument("--kinds", default="node,way,relation")
    return p


def validate_args(args) -> None:
    codec = args.compression.split(":")[0]
    if codec not in {"zstd", "snappy", "gzip", "lz4", "none", "uncompressed"}:
        raise SystemExit(f"unsupported compression codec: {codec}")
    if args.target_file_mb <= 0:
        raise SystemExit("--target-file-mb must be positive")
    kinds = set(args.kinds.split(","))
    if not kinds <= {"node", "way", "relation"}:
        raise SystemExit(f"invalid kinds: {sorted(kinds - {'node', 'way', 'relation'})}")


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    validate_args(args)
    from .session import get_spark

    codec, _, level = args.compression.partition(":")
    if codec in ("none", "uncompressed"):
        codec = "uncompressed"

    spark = get_spark("pbf-transcode")
    t0 = time.time()
    if args.sort_by_id:
        # global id clustering needs the range shuffle — only the JVM row
        # pipeline can express it, so this path keeps the generic sink
        from .sources.pbf_source import estimate_rows_per_file, scan_pbf
        from .sinks.parquet_sink import write_osm_parquet

        df = scan_pbf(spark, args.input, kinds=args.kinds.split(","),
                      blobs_per_task=args.blobs_per_task)
        rows_per_file = estimate_rows_per_file(
            scan_pbf(spark, args.input, blobs_per_task=args.blobs_per_task),
            target_mb=args.target_file_mb,
        )
        # A3 progress counter: piggybacks on the write job — no extra scan
        m = write_osm_parquet(
            df, args.output, compression=codec,
            zstd_level=int(level) if level else None,
            max_records_per_file=rows_per_file, sort_by_id=True,
            observe="transcode_progress",
        )
        nodes, ways, rels = m["nodes"], m["ways"], m["relations"]
    else:
        # default: fused parse+write stage (sinks/native_sink.py) — no JVM
        # row round-trip, ~4× the generic path's throughput
        from .sinks.native_sink import transcode_pbf

        # bare "zstd" keeps the sink's level-3 default (reference default,
        # util.rs:39) — passing None would drop to pyarrow's own default
        kw = {"zstd_level": int(level)} if level else {}
        stats = transcode_pbf(
            spark, args.input, args.output, compression=codec,
            target_file_mb=args.target_file_mb,
            blobs_per_task=args.blobs_per_task, kinds=args.kinds.split(","),
            **kw,
        )
        nodes = stats["rows"].get("node", 0)
        ways = stats["rows"].get("way", 0)
        rels = stats["rows"].get("relation", 0)
    elapsed = time.time() - t0
    print(
        f"transcoded {nodes + ways + rels} elements "
        f"({nodes} nodes, {ways} ways, {rels} relations) "
        f"in {elapsed:.1f}s -> {args.output}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
