#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed as a full cold logical-plan → action execution
(count-shaped, no driver collect of payloads). The session is warmed with a
trivial job first so JVM/codegen startup isn't attributed to the first
query.

At sf0.1 the cold pass is substantially PLAN-COMPILE-bound (analyzer/
optimizer/codegen dominate the small executions), so cold deltas mostly
measure plan complexity, not operator speed. ``--repeat N`` (default 2,
also env ``SPARK_GRAFT_BENCH_REPEAT``) re-runs the suite N more times and
reports per-query warm MEDIANS beside the cold numbers — warm runs reuse
nothing between invocations except the JVM/codegen caches, so they
approximate steady-state execution. The primary ``value`` stays the cold
total for round-over-round comparability; ``warm_value`` is the
execution-side signal.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ucr_bigdata_snowfallproject_spark.queries import REGISTRY  # noqa: E402
from ucr_bigdata_snowfallproject_spark.session import get_spark  # noqa: E402

#: Headline set: one per operator family (scan+agg, join chain, top-k,
#: median, window, set-op, scalar/JSON, time buckets, text, dedup exact,
#: minhash LSH, similarity, flagship pipeline shape).
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "group_median_quantity",
    "window_latest_lineitem_per_order",
    "window_running_customer_spend",
    "topk_orders_by_price",
    "json_extract_events",
    "events_hourly_buckets",
    "text_stats_documents",
    "dedup_exact_by_fingerprint",
    "dedup_minhash_candidates",
    "dedup_embedding_cosine_blocked",
    "text_language_id",
    "similarity_brute_force_topk",
    "similarity_ivf_topk",
    "asof_join_purchase_attribution",
    "sessionize_events",
    "range_join_price_bands",
    "window_rank_functions",
    "wordcount_top20",
    # NOT apply_in_pandas_zscore: many-small-groups applyInPandas is the
    # documented slow path (17.9s at sf0.1); its window-function oracle
    # formulation is the production shape (window_running_customer_spend
    # et al. cover it). The Arrow scalar-UDF path benches here instead.
    "pandas_udf_vowel_ratio",
    "flagship_monthly_median_join",
    "curation_pipeline_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="snowfall-bench")
    # warm the JVM + codegen paths outside the timed region; the region
    # count also initializes the parquet datasource (footer reader, file
    # listing, vectorized reader classes) so one-time class-loading isn't
    # attributed to the first timed query — on a real cluster those are
    # per-executor-lifetime costs, not per-query costs
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ucr_bigdata_snowfallproject_spark.io import load_table

    load_table(spark, sf_dir, "region").count()

    def run_suite(tag: str) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in HEADLINE:
            fn, _ = REGISTRY[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# [{tag}] {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        return timings

    cold = run_suite("cold")
    warm_runs = [run_suite(f"warm{i + 1}") for i in range(repeat)]

    total = round(sum(cold.values()), 3)
    out = {
        "metric": "headline_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": cold,
        "sf": sf,
    }
    if warm_runs:
        warm = {
            name: round(statistics.median(r[name] for r in warm_runs), 3)
            for name in HEADLINE
        }
        out["warm_queries"] = warm
        out["warm_value"] = round(sum(warm.values()), 3)
        out["warm_repeat"] = repeat
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
