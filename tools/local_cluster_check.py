"""Multi-process-executor falsifier: run the FULL query registry (and
the most expensive bench anchors) under ``local-cluster[n,cores,mb]`` —
real standalone-mode executor JVMs with their own Python worker pools —
instead of the single-JVM ``local[32]`` every prior round's correctness
record was produced in.

What only this mode exercises (and local[*] structurally cannot):

- driver↔executor task/result serialization for every closure, plan
  and Arrow batch the engine ships;
- broadcast-variable transport (torrent blocks over the block manager,
  not same-heap references);
- executor-side Python worker spawning with a REAL remote PYTHONPATH
  (local mode inherits the driver's sys.path);
- per-executor memory limits (spark.executor.memory actually bounds a
  process here);
- cache/persist semantics across block managers (functions/caching.py's
  PersistSet refcounts are driver-side bookkeeping; the blocks they
  pin live on executors in this mode).

Every gate keeps its DuckDB oracle: a query "running" under
local-cluster is weak evidence — value-level parity on real executors
is the claim worth recording. Output: LOCAL_CLUSTER_r{N}.json with one
row per query (ok/error, seconds, rows) plus the anchor timings.

Usage:
    python tools/local_cluster_check.py [--master local-cluster[2,8,4096]]
        [--sf /root/testdata/sf0.01] [--skip-anchors] [--only name,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DEFAULT_MASTER = "local-cluster[2,8,4096]"


def run_registry(spark, sf_dir: str, only: set[str] | None) -> dict:
    import __spark_entry__ as entry
    from oracle_harness import compare_frames, duck_connect

    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_connect(sf_dir)
    results: dict[str, dict] = {}
    for i, (name, fn) in enumerate(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        row: dict = {}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            row["rows"] = int(len(sdf))
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                compare_frames(sdf, ddf, name)
                row["oracle"] = "match"
            else:
                row["oracle"] = "rows-only"
            row["ok"] = True
        except Exception as exc:
            row["ok"] = False
            row["error"] = f"{type(exc).__name__}: {exc}"[:500]
            traceback.print_exc()
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        status = "ok" if row["ok"] else "FAIL"
        print(
            f"[{i + 1}/{len(qs)}] {name}: {status} "
            f"({row['sec']}s, {row.get('rows', '-')} rows)",
            file=sys.stderr,
            flush=True,
        )
    con.close()
    return results


def run_anchors(spark) -> dict:
    """The most expensive bench-tier anchors, once each, on the 10×
    tier — the shapes whose shuffles/broadcasts/Python stages are most
    likely to hit a real process boundary differently."""
    import bench
    from osm_pbf_parquet_spark.plans.pipeline_queries import PIPELINE_QUERIES
    from osm_pbf_parquet_spark.plans.mining_queries import MINING_QUERIES
    from osm_pbf_parquet_spark.plans.quality_queries import QUALITY_QUERIES

    bench._make_big_tier(spark)
    anchors = {
        "pagerank_suppliers": MINING_QUERIES["pagerank_suppliers"][0],
        "dedup_minhash_lsh": PIPELINE_QUERIES["dedup_minhash_lsh"][0],
        "jaccard_join_exact": PIPELINE_QUERIES["jaccard_join_exact"][0],
        "shortest_hops": QUALITY_QUERIES["shortest_hops"][0],
        "dedup_simhash": PIPELINE_QUERIES["dedup_simhash"][0],
    }
    out: dict[str, dict] = {}
    for name, fn in anchors.items():
        t0 = time.time()
        try:
            n = fn(spark, bench.BIG_DIR).count()
            out[name] = {"ok": True, "rows": int(n),
                         "sec": round(time.time() - t0, 2)}
        except Exception as exc:
            out[name] = {"ok": False,
                         "error": f"{type(exc).__name__}: {exc}"[:500],
                         "sec": round(time.time() - t0, 2)}
            traceback.print_exc()
        spark.catalog.clearCache()
        print(f"anchor {name}: {out[name]}", file=sys.stderr, flush=True)

    # the transcode sink (executor-side Arrow parse + parquet write)
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="lc_pbf_")
    try:
        pbf = bench._make_bench_pbf()
        t0 = time.time()
        bench._bench_transcode(spark, pbf, workdir)
        sec = time.time() - t0
        out["pbf_transcode"] = {
            "ok": True,
            "sec": round(sec, 2),
            "mb_per_s": round(os.path.getsize(pbf) / 1e6 / sec, 1),
        }
    except Exception as exc:
        out["pbf_transcode"] = {
            "ok": False, "error": f"{type(exc).__name__}: {exc}"[:500]
        }
        traceback.print_exc()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(f"anchor pbf_transcode: {out['pbf_transcode']}",
          file=sys.stderr, flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=DEFAULT_MASTER)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "LOCAL_CLUSTER_r09.json"))
    ap.add_argument("--skip-anchors", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--merge",
        action="store_true",
        help="merge this run's registry rows into an existing --out "
        "artifact (incremental re-cert of new gates) instead of "
        "overwriting it; anchors are kept from the existing artifact",
    )
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_MASTER"] = args.master
    from osm_pbf_parquet_spark.session import get_spark

    t_start = time.time()
    spark = get_spark("local_cluster_check")
    assert spark.sparkContext.master == args.master
    only = {s for s in args.only.split(",") if s} or None

    payload: dict = {"master": args.master, "sf": args.sf}
    payload["registry"] = run_registry(spark, args.sf, only)
    merged_from_prior = False
    prior_wall = 0.0
    if args.merge and os.path.exists(args.out):
        with open(args.out) as fh:
            prior = json.load(fh)
        assert prior.get("master") == args.master and prior.get("sf") == args.sf
        merged = dict(prior.get("registry", {}))
        merged.update(payload["registry"])
        payload["registry"] = merged
        if "anchors" in prior:
            payload["anchors"] = prior["anchors"]
        merged_from_prior = True
        # carry the prior artifact's cumulative wall so the summary
        # never reads as "the whole merged registry ran in this
        # increment's wall time" (r8 advice #3)
        prior_wall = float(
            prior.get("summary", {}).get("wall_total_sec", 0.0)
        )
    if not args.skip_anchors and not only and "anchors" not in payload:
        payload["anchors"] = run_anchors(spark)

    reg = payload["registry"]
    payload["summary"] = {
        "queries_total": len(reg),
        "queries_ok": sum(1 for r in reg.values() if r["ok"]),
        "queries_failed": sorted(n for n, r in reg.items() if not r["ok"]),
        "oracle_matched": sum(
            1 for r in reg.values() if r.get("oracle") == "match"
        ),
        "anchors_failed": sorted(
            n for n, r in payload.get("anchors", {}).items() if not r["ok"]
        ),
        "wall_total_sec": round(time.time() - t_start + prior_wall, 1),
    }
    if merged_from_prior:
        payload["summary"]["merged"] = True
        payload["summary"]["incremental_wall_sec"] = round(
            time.time() - t_start, 1
        )
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps(payload["summary"]))


if __name__ == "__main__":
    main()
