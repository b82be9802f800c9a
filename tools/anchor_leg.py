"""Run ONE registry query in a FRESH JVM against a given data dir and
print a JSON line with wall seconds, JVM CPU seconds, peak RSS, and the
machine-state calibration pair — ``soak_leg.py`` generalized from the
pipeline soak trio to the whole registry, for A/B drift checks (r9
verdict #6: the graph anchors drifted up two rounds running; resolve
with fresh-JVM CPU-second evidence, optionally against an older tree).

Usage: python tools/anchor_leg.py <query_name> <data_dir> [repo_root]

``repo_root`` (default: this file's repo) selects WHICH TREE's engine
code is imported — point it at a git worktree of an older round to A/B
identical hosts across trees. The harness (this file) stays the current
round's; only the measured engine differs.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    name, data_dir = sys.argv[1], sys.argv[2]
    repo = (
        os.path.abspath(sys.argv[3])
        if len(sys.argv) > 3
        else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.path.insert(0, repo)
    from osm_pbf_parquet_spark.session import get_spark

    spark = get_spark("anchor_leg")
    jpid = int(spark._sc._jvm.java.lang.ProcessHandle.current().pid())
    clk = os.sysconf("SC_CLK_TCK")

    def jvm_cpu() -> float:
        with open(f"/proc/{jpid}/stat") as fh:
            tail = fh.read().rsplit(") ", 1)[1].split()
        return (int(tail[11]) + int(tail[12])) / clk

    def jvm_peak_rss_mb() -> int | None:
        try:
            with open(f"/proc/{jpid}/status") as fh:
                for ln in fh:
                    if ln.startswith("VmHWM:"):
                        return int(ln.split()[1]) // 1024
        except OSError:
            pass
        return None

    # warm-up outside the timed region (same contract as soak_leg.py)
    spark.read.parquet(f"{data_dir}/documents.parquet").count()
    n = spark.sparkContext.defaultParallelism
    spark.range(n * 4, numPartitions=n).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # fixed machine-state calibration (see soak_leg.py)
    c0, t0 = jvm_cpu(), time.time()
    spark.range(2_000_000_000, numPartitions=n).selectExpr(
        "sum(id % 1000) AS s"
    ).collect()
    calib_wall = time.time() - t0
    calib_cpu = jvm_cpu() - c0

    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    fn = entry.queries()[name]
    c0, t0 = jvm_cpu(), time.time()
    fn(spark, data_dir).count()
    wall = time.time() - t0
    cpu = jvm_cpu() - c0
    print(json.dumps({
        "query": name,
        "repo": repo,
        "wall_sec": round(wall, 3),
        "jvm_cpu_sec": round(cpu, 1),
        "calib_wall_sec": round(calib_wall, 3),
        "calib_cpu_sec": round(calib_cpu, 1),
        "jvm_peak_rss_mb": jvm_peak_rss_mb(),
    }))


if __name__ == "__main__":
    main()
