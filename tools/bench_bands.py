"""Host-normalized bench-band verdicts (VERDICT r08 #2) — pure Python,
imported by ``bench.py`` and unit-tested without Spark.

Round 8 measured two full sf0.1 runs two hours apart differing by a
UNIFORM 1.31× (median over 60 queries, zero code change): host drift of
that size is normal on this box, and absorbing it purely with band WIDTH
(the r8 rule's ``2.5·min_obs`` floor) meant a genuine ~2× plan regression
on a narrow-spread query passed silently. The fix is to MEASURE the
drift per run and divide it out before comparing:

1. ``bench_bands.json`` pins a CALIBRATION set — stable, plan-audited
   queries whose code hasn't changed in rounds (the judge's suggested
   ``flagship_monthly_median_join`` plus four siblings; the median over
   five keeps one calibration query's own regression from poisoning the
   ratio — it just flags itself instead).
2. ``host_ratio`` = median over calibration queries of
   ``warm[q] / center[q]`` (center = median of the pooled steady-state
   observations), clamped to [0.5, 1.8] so a suite-wide regression can't
   normalize itself away: the worst observed GENUINE drift is ~1.55×
   uniform (r8, totals 49.1 s vs 76.1 s), so a ratio pegged at the 1.8
   clamp is itself a signal — either extreme box load (re-run quiet) or
   a real suite-wide slowdown, and with the clamp a uniform ≥3.24×
   (1.8 · HI_REL) regression still flags every query.
3. Every warm median is divided by ``host_ratio`` and compared against a
   band whose width now only has to absorb RESIDUAL per-query noise
   (GC, AQE variance — ±20-30%), not uniform host swings:

       hi = max(1.8 · center, center + 0.25 s)
       lo = 0.35 · center − 0.05 s   (floored at 0)

   The absolute ±0.25 s / ±0.05 s slack covers sub-second queries where
   timing noise is additive, not multiplicative. Under this rule a 2×
   single-query regression trips even inside a simulated 1.3× uniform
   drift (pinned in ``tests/test_bench_bands.py``), which the r8 rule
   could not do.
"""

from __future__ import annotations

import statistics

#: host_ratio clamp: a drift estimate outside this range means extreme
#: box load or a genuine suite-wide regression — do not let it
#: normalize a real slowdown away (see module docstring).
RATIO_CLAMP = (0.5, 1.8)

#: tightened band rule vs the normalized center (see module docstring)
HI_REL, HI_ABS = 1.8, 0.25
LO_REL, LO_ABS = 0.35, 0.05


def center(band: dict) -> float:
    """Steady-state center of one band: median of the pooled per-round
    warm-median observations."""
    return float(statistics.median(band["obs"]))


def band_limits(band: dict) -> tuple[float, float]:
    """(lo, hi) for host-NORMALIZED seconds."""
    c = center(band)
    return max(0.0, LO_REL * c - LO_ABS), max(HI_REL * c, c + HI_ABS)


def host_ratio(warm: dict[str, float], spec: dict) -> float:
    """This run's uniform drift estimate: median of warm/center over the
    spec's calibration queries (1.0 when none are measurable)."""
    bands = spec.get("bands", {})
    ratios = [
        warm[q] / center(bands[q])
        for q in spec.get("calibration", [])
        if q in warm and q in bands and center(bands[q]) > 0
    ]
    if not ratios:
        return 1.0
    r = statistics.median(ratios)
    return min(max(r, RATIO_CLAMP[0]), RATIO_CLAMP[1])


def verdict(warm: dict[str, float], spec: dict, headline: list[str]) -> dict:
    """Compare one run's warm medians against the band spec.

    Returns ``{"host_ratio": r, "out_of_band": {name: {...}}, "no_band":
    [names]}`` — ``out_of_band`` values carry the raw seconds, the
    normalized seconds actually compared, and the (normalized-domain)
    band, so a flagged query is diagnosable from the bench output alone.
    """
    bands = spec.get("bands", {})
    r = host_ratio(warm, spec)
    oob = {}
    for n in headline:
        if n not in bands or n not in warm:
            continue
        lo, hi = band_limits(bands[n])
        norm = warm[n] / r
        if not (lo <= norm <= hi):
            oob[n] = {
                "sec": warm[n],
                "norm_sec": round(norm, 3),
                "lo": round(lo, 3),
                "hi": round(hi, 3),
            }
    return {
        "host_ratio": round(r, 3),
        "out_of_band": oob,
        "no_band": [n for n in headline if n not in bands],
    }
