"""Run ONE soak query in a FRESH JVM and print a JSON line with wall
seconds, JVM CPU seconds, and the JVM's peak RSS.

Why a subprocess per measurement: r8's A/B (commit 2825bcb) proved the
long-session soak numbers measure cumulative GC/JIT session state, not
plan quality — identical plans swung 237 → 2111 JVM CPU-seconds inside
one session while fresh-JVM runs read equal. Each invocation here pays
its own session start (excluded from the timed region) and dies, so
every rep sees the same JVM state; CPU time is reported alongside wall
because wall additionally absorbs host-contention windows that CPU time
does not.

Usage: python tools/soak_leg.py <query_name> <soak_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name, soak_dir = sys.argv[1], sys.argv[2]
    # Pre-touch the full heap before the timed region (r12, SOAK_AB_r12):
    # the soak legs first-touch tens of GB of lazily-committed heap inside
    # the measurement, and page-backing cost varies 4x with host memory
    # state (796-3222 CPU-sec on identical plans; -Xms alone does NOT fix
    # it). With -Xms=-Xmx + AlwaysPreTouch the same leg reads a stable
    # 628-752 CPU-sec. Overridable via the env knob.
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms48g -XX:+AlwaysPreTouch"
    )
    from osm_pbf_parquet_spark.session import get_spark

    spark = get_spark("soak_leg")
    jpid = int(spark._sc._jvm.java.lang.ProcessHandle.current().pid())
    clk = os.sysconf("SC_CLK_TCK")

    def jvm_cpu() -> float:
        # own utime+stime of OUR JVM (pid via ProcessHandle — no /proc
        # scan that could pick up another session's java process)
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

    # pay JVM+parquet-footer init and spawn the Python worker pool
    # OUTSIDE the timed region (same warm-up contract as bench.py's
    # session) — the measurement target is the PLAN on a cold-but-ready
    # JVM, not session bring-up
    spark.read.parquet(f"{soak_dir}/documents.parquet").count()
    n = spark.sparkContext.defaultParallelism
    spark.range(n * 4, numPartitions=n).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # machine-state calibration: a FIXED pure-JVM workload (identical
    # cycles every run) measured in the same units as the leg. On this
    # host the same leg swings 24s..211s across identical fresh JVMs —
    # the divergence tracks preceding sustained all-core load
    # (thermal / hypervisor CPU state), not the plan — so every rep
    # carries its own normalizer: if calib_cpu inflates 2x, the leg's
    # inflation is machine state, not a plan regression.
    c0, t0 = jvm_cpu(), time.time()
    spark.range(2_000_000_000, numPartitions=n).selectExpr(
        "sum(id % 1000) AS s"  # bounded sum: no ANSI bigint overflow
    ).collect()
    calib_wall = time.time() - t0
    calib_cpu = jvm_cpu() - c0

    from osm_pbf_parquet_spark.plans.pipeline_queries import PIPELINE_QUERIES

    c0, t0 = jvm_cpu(), time.time()
    PIPELINE_QUERIES[name][0](spark, soak_dir).count()
    wall = time.time() - t0
    cpu = jvm_cpu() - c0
    print(json.dumps({
        "query": name,
        "wall_sec": round(wall, 3),
        "jvm_cpu_sec": round(cpu, 1),
        "calib_wall_sec": round(calib_wall, 3),
        "calib_cpu_sec": round(calib_cpu, 1),
        "jvm_peak_rss_mb": jvm_peak_rss_mb(),
    }))


if __name__ == "__main__":
    main()
