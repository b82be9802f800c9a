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
    # pre-touch the heap outside the timed region (see tools/soak_leg.py
    # and SOAK_AB_r12.json — page-backing variance, not the plan, drove
    # the 4x fresh-JVM CPU swings); requires the measured tree's session
    # factory to plumb the knob (r12+; older trees ignore it, which is
    # itself visible in the leg's stability).
    # EXCEPTION (measured, r12): the transcode anchor's hot loop runs in
    # 32 Python worker processes and barely touches the JVM heap
    # (jvm_cpu ~5s); pinning 48 GB resident in the parent JVM crowds the
    # workers' Arrow buffers + page cache and inflates the leg 130 ->
    # 570 tree-CPU-sec — so worker-heavy legs stay unpinned.
    if name != "pbf_transcode_4x":
        os.environ.setdefault(
            "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms48g -XX:+AlwaysPreTouch"
        )
    from osm_pbf_parquet_spark.session import get_spark

    spark = get_spark("anchor_leg")
    jpid = int(spark._sc._jvm.java.lang.ProcessHandle.current().pid())
    clk = os.sysconf("SC_CLK_TCK")

    def jvm_cpu() -> float:
        with open(f"/proc/{jpid}/stat") as fh:
            tail = fh.read().rsplit(") ", 1)[1].split()
        return (int(tail[11]) + int(tail[12])) / clk

    def tree_cpu() -> float:
        """utime+stime summed over the JVM AND its live descendants —
        the honest CPU number for anchors whose hot loop runs in the
        Python worker pool (mapInArrow/mapInPandas: the transcode sink),
        which JVM-only CPU time misses entirely. Workers persist in the
        pool between calls, so the delta across the timed region loses
        nothing to reaping."""
        stats: dict[int, tuple[int, int]] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as fh:
                    tail = fh.read().rsplit(") ", 1)[1].split()
                stats[int(d)] = (
                    int(tail[1]),  # ppid
                    int(tail[11]) + int(tail[12]),
                )
            except OSError:
                continue
        kids: dict[int, list[int]] = {}
        for pid, (ppid, _) in stats.items():
            kids.setdefault(ppid, []).append(pid)
        total, frontier = 0, [jpid]
        while frontier:
            pid = frontier.pop()
            if pid in stats:
                total += stats[pid][1]
                frontier.extend(kids.get(pid, []))
        return total / clk

    def jvm_peak_rss_mb() -> int | None:
        try:
            with open(f"/proc/{jpid}/status") as fh:
                for ln in fh:
                    if ln.startswith("VmHWM:"):
                        return int(ln.split()[1]) // 1024
        except OSError:
            pass
        return None

    # warm-up outside the timed region (same contract as soak_leg.py);
    # the transcode leg has no parquet data dir — its own warm-up below
    # (a full-pool synthetic transcode) covers scan+codec init instead
    if name != "pbf_transcode_4x":
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
    if name == "pbf_transcode_4x":
        # the transcode anchor is bench-only (not a registry query):
        # same fused mapInArrow sink, 4x synthetic input, own workdir —
        # warm-up pays the full worker-pool spawn + codec init outside
        # the timed region exactly as bench.py's big-tier leg does
        # (r11, r10 verdict #5: the expensive anchors need fresh-JVM
        # CPU-second evidence, not wall on a contended host)
        import shutil
        import tempfile

        import bench

        pbf = bench._make_bench_pbf(bench.N_BENCH_NODES * 4)
        workdir = tempfile.mkdtemp(prefix="anchor_transcode_")
        try:
            sys.path.insert(0, os.path.join(repo, "tests"))
            from pbf_encoder import write_synthetic_pbf_fast

            warm = os.path.join(workdir, "warm.osm.pbf")
            write_synthetic_pbf_fast(warm, n_nodes=280_000, n_ways=5_000,
                                     n_rels=500)
            bench._bench_transcode(spark, warm, workdir, blobs_per_task=1)
            c0, tc0, t0 = jvm_cpu(), tree_cpu(), time.time()
            bench._bench_transcode(spark, pbf, workdir)
            wall = time.time() - t0
            cpu = jvm_cpu() - c0
            tcpu = tree_cpu() - tc0
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    else:
        import __spark_entry__ as entry

        fn = entry.queries()[name]
        c0, tc0, t0 = jvm_cpu(), tree_cpu(), time.time()
        fn(spark, data_dir).count()
        wall = time.time() - t0
        cpu = jvm_cpu() - c0
        tcpu = tree_cpu() - tc0
    print(json.dumps({
        "query": name,
        "repo": repo,
        "wall_sec": round(wall, 3),
        "jvm_cpu_sec": round(cpu, 1),
        "tree_cpu_sec": round(tcpu, 1),
        "calib_wall_sec": round(calib_wall, 3),
        "calib_cpu_sec": round(calib_cpu, 1),
        "jvm_peak_rss_mb": jvm_peak_rss_mb(),
    }))


if __name__ == "__main__":
    main()
