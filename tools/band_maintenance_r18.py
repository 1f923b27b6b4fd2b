#!/usr/bin/env python
"""Round-18 close band maintenance (VERDICT r17 #5 + the standing
per-round protocol recorded in bench_bands.json _doc):

1. Append this round's full-suite HOST-NORMALIZED warm medians to
   ``history`` ([18, norm] per banded query) and pool them into ``obs``.
2. RE-SEED the four queries whose r17 plan changes moved their steady
   state out of the pooled window (similarity_knn_graph_int8 4.56x,
   graph_triangles_parts 1.75x, dedup_embedding_knn_components 2.17x,
   dedup_minhash_components_md5 — VERDICT r17 #5): obs = the
   recent-state window only (normalized observations from rounds >= 17,
   i.e. the r17 driver run + this round's close bench), so the lo bound
   stops flagging the intended speedups.
3. Recompute every touched band's lo/hi = band_limits(obs) (the file
   invariant: stored limits always equal the rule).

Usage: python tools/band_maintenance_r18.py <final_bench_stderr_detail.json>
where the arg is the '# detail: ' JSON line bench.py prints to stderr
(contains warm_queries + host_ratios).
"""
import json
import sys

sys.path.insert(0, "/root/repo")
from tools.bench_bands import band_limits

BANDS_PATH = "/root/repo/bench_bands.json"

#: r17 driver-run warm medians (BENCH_r17.json) and that run's measured
#: host ratios (default 1.014, compute 1.136) — the recent-state seeds.
R17_RATIOS = {"default": 1.014, "compute": 1.136}
R17_RAW = {
    "similarity_knn_graph_int8": 1.83,
    "graph_triangles_parts": 7.33,
    "dedup_embedding_knn_components": 6.24,
    "dedup_minhash_components_md5": 5.62,
}
RESEED = sorted(R17_RAW)

detail = json.load(open(sys.argv[1]))
warm = detail["warm_queries"]
ratios = detail["host_ratios"]

spec = json.load(open(BANDS_PATH))
bands, hist = spec["bands"], spec["history"]

touched = 0
for name, band in bands.items():
    if name not in warm:
        continue
    cls = band.get("class", "default")
    norm = round(warm[name] / ratios.get(cls, ratios["default"]), 3)
    hist.setdefault(name, []).append([18, norm])
    if name in RESEED:
        r17_norm = round(
            R17_RAW[name] / R17_RATIOS[band.get("class", "default")], 3
        )
        # recent-state window: r17 driver obs + this round's close obs
        band["obs"] = sorted([r17_norm, norm])
        # record the r17 point in history too if missing (driver run)
        if not any(r == 17 for r, _v in hist[name]):
            hist[name].append([17, r17_norm])
            hist[name].sort(key=lambda rv: rv[0])
    else:
        band["obs"] = sorted(band["obs"] + [norm])
    lo, hi = band_limits(band)
    band["lo"], band["hi"] = round(lo, 3), round(hi, 3)
    touched += 1

spec["_doc"] += (
    " | r18 maintenance: appended the r18 close-bench normalized obs; "
    "RE-SEEDED the four r17-plan-change queries (similarity_knn_graph_"
    "int8, graph_triangles_parts, dedup_embedding_knn_components, "
    "dedup_minhash_components_md5) to their recent-state window (r17 "
    "driver run + r18 close) per VERDICT r17 #5 — the r12 deliberate-"
    "plan-change precedent."
)
json.dump(spec, open(BANDS_PATH, "w"), indent=1, sort_keys=True)
print(f"updated {touched} bands; re-seeded {RESEED}")
