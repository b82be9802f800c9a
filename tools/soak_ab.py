"""Fresh-JVM CPU-second A/B of one soak leg across two engine trees.

Usage: python tools/soak_ab.py <query> <data_dir> <tree_a> <tree_b> [reps]

r11 verdict What's-wrong #1: the dedup_minhash_lsh 50x soak leg swung
796..3105 JVM-CPU-seconds across fresh JVMs on IDENTICAL code and data,
with peak RSS growing 23 -> 44 GB round-over-round — unexplained by the
committed evidence. This harness produces the adjudicating evidence:

- plan-identity hash per tree (tools/plan_hash.py) — same hash = no plan
  regression is possible, the swing is machine/JVM state;
- ``reps`` interleaved fresh-JVM legs per tree (A, B, A, B, ...) via
  tools/anchor_leg.py, each with its own calibration pair, each started
  only after host memory settles (MemAvailable back above a floor), so
  page-cache/ballooning state from the previous leg can't bleed in.

Prints one JSON object with both trees' rep arrays and the plan hashes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def _mem_available_gb() -> float:
    with open("/proc/meminfo") as fh:
        for ln in fh:
            if ln.startswith("MemAvailable:"):
                return int(ln.split()[1]) / 1048576
    return 0.0


def _settle(floor_gb: float = 80.0, timeout: float = 120.0) -> float:
    t0 = time.time()
    while _mem_available_gb() < floor_gb and time.time() - t0 < timeout:
        time.sleep(5)
    return round(_mem_available_gb(), 1)


def _run(script: str, *args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, script), *args],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        return {"error": proc.stderr[-800:]}
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    query, data_dir, tree_a, tree_b = sys.argv[1:5]
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    out: dict = {"query": query, "data_dir": data_dir,
                 "trees": {"a": tree_a, "b": tree_b},
                 "plan": {}, "legs": {"a": [], "b": []}}
    for label, tree in (("a", tree_a), ("b", tree_b)):
        out["plan"][label] = _run("plan_hash.py", query, data_dir, tree)
    for i in range(reps):
        for label, tree in (("a", tree_a), ("b", tree_b)):
            avail = _settle()
            leg = _run("anchor_leg.py", query, data_dir, tree)
            leg["mem_available_gb_at_start"] = avail
            out["legs"][label].append(leg)
            print(json.dumps({"rep": i, "tree": label, **leg}),
                  file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
