"""Per-query optimization probe (r12 optimization round).

Times individual big-tier bench queries in-session with BOTH the bench's
count() action and the noop sink (guide §1.4: count() lets the optimizer
prune; noop computes every column), and captures .explain("formatted")
for the plan-shape record. NOT a replacement for bench.py — a focused
iteration tool so each candidate change is measured without paying the
full 20-minute bench.

Usage:
    python tools/opt_probe.py <query...> [--reps N] [--plans-dir DIR]
                              [--action count|noop|both] [--sf01]

Query names resolve against the big-tier headline mapping in bench.py
plus the sf0.1 headline list. Prints one JSON line per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _query_map():
    from osm_pbf_parquet_spark.plans.relational import QUERIES as REL
    from osm_pbf_parquet_spark.plans.pipeline_queries import PIPELINE_QUERIES as PIPE
    from osm_pbf_parquet_spark.plans.sampling_queries import SAMPLING_QUERIES as SAMP
    from osm_pbf_parquet_spark.plans.advanced_queries import ADVANCED_QUERIES as ADV
    from osm_pbf_parquet_spark.plans.quality_queries import QUALITY_QUERIES as QUAL
    from osm_pbf_parquet_spark.plans.media_queries import MEDIA_QUERIES as MEDIA
    from osm_pbf_parquet_spark.plans.mining_queries import MINING_QUERIES as MINING
    from osm_pbf_parquet_spark.plans.selection_queries import SELECTION_QUERIES as SEL

    m = {}
    for reg in (REL, PIPE, SAMP, ADV, QUAL, MEDIA, MINING, SEL):
        for name, (fn, _o) in reg.items():
            m[name] = fn
    # big-tier specials from bench.py
    m["skew_salted_distinct"] = bench._q_skew_salted_distinct
    m["hll_distinct_big"] = bench._q_hll_big
    m["pagerank_suppliers_big"] = bench._q_pagerank_big
    return m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--action", default="count",
                    choices=["count", "noop", "both"])
    ap.add_argument("--sf01", action="store_true",
                    help="run against SF_DIR instead of the big tier")
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable) — for A/B "
                    "sweeps in a fresh JVM per configuration")
    ap.add_argument("--stages", action="store_true",
                    help="enable the UI and report the slowest stages "
                    "per query from the REST API (guide §7.1)")
    args = ap.parse_args()

    from osm_pbf_parquet_spark.session import get_spark

    extra = dict(c.split("=", 1) for c in args.conf)
    if args.stages:
        extra.setdefault("spark.ui.enabled", "true")
    spark = get_spark("opt_probe", **extra)
    spark.read.parquet(f"{bench.SF_DIR}/region.parquet").count()
    n = spark.sparkContext.defaultParallelism
    spark.range(n * 4, numPartitions=n).mapInPandas(
        lambda it: it, "id long"
    ).count()
    if args.sf01:
        data_dir = bench.SF_DIR
    else:
        bench._make_big_tier(spark)
        data_dir = bench.BIG_DIR
        spark.range(n * 1000).repartition(n).mapInArrow(
            lambda it: it, "id long"
        ).count()

    def _stage_report(since_stage: int) -> list[dict]:
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as resp:
            stages = json.load(resp)
        rows = []
        for s in stages:
            if s["stageId"] < since_stage:
                continue
            rows.append({
                "id": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "runMs": s["executorRunTime"],
                "cpuMs": s.get("executorCpuTime", 0) // 1_000_000,
                "shufRdMB": round(s["shuffleReadBytes"] / 1e6, 1),
                "shufWrMB": round(s["shuffleWriteBytes"] / 1e6, 1),
                "inMB": round(s["inputBytes"] / 1e6, 1),
                "spillMB": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            })
        rows.sort(key=lambda r: -r["runMs"])
        return rows[:12]

    def _sql_report() -> list[str]:
        """Per-operator metrics of the LAST completed SQL execution —
        the precise attribution (which operator, not which stage)."""
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/sql?length=200&details=true"
            "&planDescription=false"
        ) as resp:
            execs = json.load(resp)
        if not execs:
            return []
        last = max(execs, key=lambda e: e["id"])
        out = []
        for n in last.get("nodes", []):
            interesting = {
                m["name"]: m["value"] for m in n.get("metrics", [])
                if any(k in m["name"] for k in (
                    "time total", "time in", "output rows", "data size",
                    "shuffle bytes written", "records read",
                ))
            }
            t = interesting.get("time total (min, med, max (stageId: taskId))") or \
                interesting.get("time total") or ""
            out.append(f"{n['nodeId']:>3} {n['nodeName'][:46]:46} {interesting}")
        return out

    qmap = _query_map()
    for name in args.queries:
        fn = qmap[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, data_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        out = {"query": name}
        for action in (["count", "noop"] if args.action == "both"
                       else [args.action]):
            reps = []
            stage0 = None
            for i in range(args.reps):
                if args.stages and i == args.reps - 1:
                    # attribute only the LAST (warmest) rep's stages
                    st = spark.sparkContext.statusTracker()
                    ids = st.getJobIdsForGroup(None) or [0]
                    stage0 = max(
                        (sid for jid in ids
                         for sid in (st.getJobInfo(jid).stageIds
                                     if st.getJobInfo(jid) else [])),
                        default=-1,
                    ) + 1
                spark.sparkContext.setJobDescription(f"{name} [{action}]")
                t0 = time.time()
                df = fn(spark, data_dir)
                if action == "count":
                    df.count()
                else:
                    df.write.format("noop").mode("overwrite").save()
                reps.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            out[action] = {"min": min(reps), "reps": reps}
            if args.stages and stage0 is not None:
                out[f"{action}_stages"] = _stage_report(stage0)
                out[f"{action}_sql"] = _sql_report()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
