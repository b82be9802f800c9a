"""Print a canonicalized plan-identity hash for one registry query.

Usage: python tools/plan_hash.py <query_name> <data_dir> [repo_root]

Builds the query's DataFrame (no execution beyond what plan construction
itself runs — bounded collects like codebook training DO run, same as the
ledger's attribution tracer) and hashes the optimized logical plan with
run-varying tokens stripped (expression ids ``#123``, plan ids, cache/
temp paths, object addresses). Two trees printing the same hash execute
the same logical plan — the A/B separator between "plan regression" and
"machine state" (r11 verdict What's-wrong #1 asked for exactly this for
the dedup soak leg).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys


def canonical_plan(df) -> str:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    plan = re.sub(r"#\d+", "#", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=", plan)
    plan = re.sub(r"@[0-9a-f]{6,}", "@", plan)
    plan = re.sub(r"/tmp/\S+", "/tmp/_", plan)
    return plan


def main() -> None:
    name, data_dir = sys.argv[1], sys.argv[2]
    repo = (
        os.path.abspath(sys.argv[3])
        if len(sys.argv) > 3
        else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.path.insert(0, repo)
    from osm_pbf_parquet_spark.session import get_spark

    spark = get_spark("plan_hash")
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, data_dir)
    plan = canonical_plan(df)
    print(json.dumps({
        "query": name,
        "repo": repo,
        "plan_md5": hashlib.md5(plan.encode()).hexdigest(),
        "plan_lines": len(plan.splitlines()),
    }))


if __name__ == "__main__":
    main()
