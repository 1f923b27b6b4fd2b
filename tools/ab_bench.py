#!/usr/bin/env python
"""Fresh-session A/B micro-bench for diagnosing cross-round timing drift.

One invocation = ONE fresh Spark session running a handful of registry
queries from ONE repo checkout (``--repo`` — e.g. a git worktree pinned at
an old round's commit), with bench.py's exact methodology: warm the
session, one cold pass, N warm passes, ``clear_session_state`` between
queries, report the warm median. Alternating invocations between two
checkouts on the same host cancels slow-box drift, which a single
full-suite run cannot do (VERDICT r11 Missing #1: is the compute-lane
creep code, environment, or band-pooling?).

Usage (serial — NEVER run two Spark sessions concurrently):

    for i in 1 2 3; do
      python tools/ab_bench.py --repo /root/repo       --queries a,b >> ab.jsonl
      python tools/ab_bench.py --repo /root/repo/.ab_r8 --queries a,b >> ab.jsonl
    done

Prints ONE JSON line: {"repo": ..., "git": ..., "queries": {name:
{"cold": s, "warm": s, "warms": [...]}}, "total_warm": s}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True, help="repo checkout to import from")
    ap.add_argument("--queries", required=True, help="comma-separated registry names")
    ap.add_argument("--repeat", type=int, default=3, help="warm passes (median)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    repo = os.path.abspath(args.repo)
    sys.path.insert(0, repo)
    # Version purity: sys.path only steers the DRIVER. Python workers
    # resolve cloudpickled-by-reference modules from their own PYTHONPATH,
    # so without this a worker could import the launch checkout instead of
    # --repo and the A/B would silently compare mixed code (ADVICE r12).
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    git = subprocess.run(
        ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip()

    from ucr_bigdata_snowfallproject_spark.queries import REGISTRY
    from ucr_bigdata_snowfallproject_spark.session import (
        clear_session_state, get_spark)

    names = args.queries.split(",")
    missing = [n for n in names if n not in REGISTRY]
    if missing:
        raise SystemExit(f"not in {repo} registry: {missing}")

    spark = get_spark(app_name="ab-bench")
    # bench.py's warm_session inline (it moved files across rounds): JVM +
    # codegen + parquet datasource + Python/Arrow worker pool with numpy.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(args.sf_dir, "region.parquet")).count()

    def _warm_fn(s):
        import numpy as np

        return pd.Series([np.asarray([v], dtype=np.int64) for v in s])

    spark.range(32 * 100).repartition(32).select(
        pandas_udf(_warm_fn, "array<long>")("id")).count()

    def run_pass() -> dict[str, float]:
        t: dict[str, float] = {}
        for name in names:
            fn, _ = REGISTRY[name]
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            t[name] = round(time.perf_counter() - t0, 3)
            clear_session_state(spark)
        return t

    cold = run_pass()
    warms = [run_pass() for _ in range(args.repeat)]
    out = {
        "repo": repo,
        "git": git,
        "queries": {
            n: {
                "cold": cold[n],
                "warm": round(statistics.median(w[n] for w in warms), 3),
                "warms": [w[n] for w in warms],
            }
            for n in names
        },
    }
    out["total_warm"] = round(sum(q["warm"] for q in out["queries"].values()), 3)
    # VERDICT r17 #8: report cold next to warm in every A/B — the r17
    # eager-barrier changes cost +34% cold while the warm-only A/Bs saw
    # only wins; total_cold makes that trade a measured choice per change.
    out["total_cold"] = round(sum(q["cold"] for q in out["queries"].values()), 3)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
