"""Window operators (SURVEY §2.5).

The reference's one windowed pattern is the per-station latest-day snapshot
(P5/A2, ``untitled.py:80``), done as an eager per-file pandas filter.  Here
it's a real window — plus the ranking / frame surface the monthly
climatology use case needs.

Scale notes: ``row_number`` / ``rank`` stream within a sorted partition —
no full-group buffering.  Partition keys must be reasonably high-cardinality
(station id, order key); a low-cardinality partitionBy at 100 TB is a skew
bomb, which is a caller contract documented here rather than an engine fix.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    keep_ties: bool = True,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Latest-row-per-group arg-max (P5/A2; reference untitled.py:80 keeps
    *every* row of the max day → ``keep_ties=True`` matches it; with
    ``keep_ties=False`` supply tiebreakers for determinism).
    """
    w = Window.partitionBy(*keys)
    if keep_ties:
        mx = F.max(order_col).over(w)
        return (
            df.withColumn("__mx", mx)
            .filter(F.col(order_col) == F.col("__mx"))
            .drop("__mx")
        )
    ordered = w.orderBy(F.desc(order_col), *[F.desc(t) for t in tiebreakers])
    return (
        df.withColumn("__rn", F.row_number().over(ordered))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_n_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    n: int,
) -> DataFrame:
    """Per-group top-N via row_number (deterministic iff order_by is total)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n).drop("__rn")


def with_rank(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    out: str = "rank",
    dense: bool = False,
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order_by)
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(out, fn.over(w))


def running_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    agg: Column,
    out: str,
) -> DataFrame:
    """Cumulative aggregate (rows unbounded-preceding..current), e.g. the
    running monthly precipitation total in the climatology use case."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, agg.over(w))


def rolling_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    agg: Column,
    out: str,
    preceding: int,
) -> DataFrame:
    """Trailing-window aggregate over the last ``preceding``+1 rows (rolling
    monthly average pattern, SURVEY §2.5)."""
    w = Window.partitionBy(*keys).orderBy(*order_by).rowsBetween(-preceding, Window.currentRow)
    return df.withColumn(out, agg.over(w))


def with_lag_lead(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    lag_out: str = "lag_1",
    lead_out: str = "lead_1",
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(lag_out, F.lag(col, 1).over(w)).withColumn(
        lead_out, F.lead(col, 1).over(w)
    )


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Batch sessionization (the batch twin of streaming ``session_window``,
    SURVEY §2.10): within each key, a new session starts when the gap since
    the previous event exceeds ``gap_seconds``. Adds a 1-based ``session_id``.

    Gap arithmetic is in microseconds (``unix_micros``) so engines that keep
    sub-second precision agree exactly. Scale: one shuffle on ``keys``; both
    windows stream over the same sort — Spark plans a single exchange+sort.
    """
    order = [F.col(ts_col).asc(), *[F.col(t).asc() for t in tiebreakers]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = (
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev) > F.lit(gap_seconds * 1_000_000))
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_new.cast("long")).over(run))


def rolling_anomalies(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    preceding: int = 30,
    z_thresh: float = 3.0,
    round_digits: int = 4,
    scale: int | None = None,
) -> DataFrame:
    """Rolling z-score anomaly flags — the climatology-anomaly pattern of
    the reference's weather domain (SURVEY §2.5 rolling averages): each
    value scored against the mean/stddev of the PRECEDING ``preceding``
    rows per key (current row excluded, so an outlier can't mask itself),
    flagged when |z| ≥ ``z_thresh``.

    Appends (roll_mean, roll_std, zscore, is_anomaly); rows without
    enough history (or zero variance) get NULL zscore and False flag.
    One window pass per key — same shuffle the sessionize/lag family
    already pays.

    ``scale`` engages the exact-integer-sums mode for cross-engine
    determinism: the value scales to integers (e.g. ``scale=100`` →
    cents), and mean/std derive from the window's EXACT integer Σx and
    Σx² via ``var = (Σx² − (Σx)²/n)/(n−1)`` — identical on every engine,
    unlike native sliding AVG/STDDEV whose float accumulation order
    differs (measured 5/10k rows flipping the 4th decimal vs DuckDB).
    ``scale=None`` uses the native aggregates (fine within one engine)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(-preceding, -1)
    )
    if scale is None:
        mean = F.avg(F.col(value_col)).over(w)
        std = F.stddev_samp(F.col(value_col)).over(w)
        v = F.col(value_col)
        rnd = lambda c: F.round(c, round_digits)  # noqa: E731
    else:
        x = F.round(F.col(value_col) * scale, 0).cast("long")
        s1 = F.sum(x).over(w).cast("double")
        s2 = F.sum(x * x).over(w).cast("double")
        n = F.count(x).over(w).cast("double")
        mean = s1 / n / scale
        std = F.when(
            n > 1, F.sqrt((s2 - s1 * s1 / n) / (n - 1)) / scale
        )
        v = x.cast("double") / scale
        # floor-based half-up rounding: F.round on doubles goes through
        # BigDecimal's SHORTEST-decimal representation, so an exact
        # decimal half (common for integer-ratio means: s1/n = ...375)
        # rounds UP in Spark but DOWN in engines that round the binary
        # value — FLOOR(x·10^d + 0.5) evaluates identically everywhere
        p = float(10 ** round_digits)
        rnd = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    z = (v - mean) / std
    return (
        df.withColumn("roll_mean", rnd(mean))
        .withColumn("roll_std", rnd(std))
        .withColumn(
            "zscore",
            F.when(std > 0, rnd(z)),
        )
        .withColumn(
            # flag from the UNROUNDED |z| — the emitted zscore column is
            # rounded for cross-engine display determinism, but flagging
            # on the rounded value would flip rows whose z lands within
            # half an ulp-of-rounding below the threshold vs an engine
            # flagging on the exact value (the oracle does)
            "is_anomaly",
            F.coalesce(
                F.when(std > 0, F.abs(z) >= F.lit(z_thresh)), F.lit(False)
            ),
        )
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: how many users performed ``steps[0]``,
    then ``steps[1]`` STRICTLY AFTER their first ``steps[0]``, then
    ``steps[2]`` strictly after that, ... (the product-analytics
    conversion funnel; each stage anchors at the user's EARLIEST
    qualifying event, the standard first-touch semantics). Returns one
    row per step: (step_idx, step, n_users), n_users non-increasing.

    Scale shape: one filtered groupBy per step over a progressively
    shrinking user set — K partial-aggregable passes, each shuffling only
    (user, ts) pairs for that step's events; the per-user anchor frames
    join key-to-key (user) so AQE reuses/broadcasts the small survivor
    side. No giant per-user event-list window, no sequence UDF."""
    out_frames = []
    anchor = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    out_frames.append(
        anchor.agg(
            F.lit(0).alias("step_idx"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            df.filter(F.col(type_col) == step)
            .join(anchor, user_col)
            .filter(F.col(ts_col) > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        out_frames.append(
            nxt.agg(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        anchor = nxt
    res = out_frames[0]
    for f in out_frames[1:]:
        res = res.unionByName(f)
    return res


def ewma_truncated(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    horizon: int = 8,
    scale: int = 100,
    round_digits: int = 6,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key truncated exponential moving average with decay 1/2 —
    the classic smoothing signal for monitoring metrics / event values,
    bounded to the last ``horizon`` observations.

    ``ewma_t = Σ_{i<h} 2^{h-1-i}·v_{t-i} / Σ_{i<h} 2^{h-1-i}`` over the
    observations that actually exist (series shorter than ``horizon``
    renormalize over the available prefix; NULL values are skipped from
    BOTH sums, so they neither contribute nor dilute).

    Determinism contract (exact-integer-sums rule, as
    :func:`rolling_anomalies` / ``group_ols``): values quantize to
    ``round(v·scale)`` integers; decay 1/2 makes every weight an exact
    power-of-two INTEGER (no float weight products), so numerator and
    denominator are exact int64 sums and the single final division +
    floor-half-up rounding evaluates identically in any IEEE-754 engine —
    a DuckDB oracle reproduces it bit-for-bit. A general α would put a
    non-representable float in every term; 1/2 is the standard monitoring
    default and keeps the contract exact.

    Scale shape: ONE window sort per key (all ``horizon`` lags share the
    same window frame → Spark computes them in a single WindowExec pass),
    zero joins, zero extra shuffles. The unbounded-history recurrence
    form would need an iterative pass or a float power ladder; truncation
    at h≈8 is within 2^-8 of it and stays one linear scan."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    cents = F.round(F.col(value_col) * scale).cast("long")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for i in range(horizon):
        weight = 1 << (horizon - 1 - i)
        v_i = F.lag(cents, i).over(w) if i else cents
        num = num + F.when(v_i.isNotNull(), v_i * weight).otherwise(F.lit(0))
        den = den + F.when(v_i.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    p = float(10**round_digits)
    raw = num.cast("double") / (den.cast("double") * float(scale))
    return df.withColumn(
        out_col,
        F.when(den > 0, F.floor(raw * p + F.lit(0.5)) / p),
    )


def rate_of_change(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    order_tiebreakers: Sequence[str] = (),
    scale: int = 100,
    round_digits: int = 6,
    out_col: str = "rate_per_sec",
) -> DataFrame:
    """Per-key discrete derivative: (v_t − v_prev) / (t − t_prev) in
    value-units per second — the telemetry slope/velocity signal (counter
    rates, balance deltas, sensor drift). First observation per key and
    zero-Δt successors (equal timestamps) emit NULL.

    Determinism: Δvalue in exact cents (``round(v·scale)`` int64) and Δt
    in exact microseconds; ONE float division + floor-half-up rounding —
    engine-bit-identical (exact-integer-sums rule). One window (lag) pass
    per key, zero joins."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_tiebreakers]
    )
    cents = F.round(F.col(value_col) * scale).cast("long")
    t_us = F.unix_micros(F.col(ts_col))
    dv = cents - F.lag(cents).over(w)
    dt = t_us - F.lag(t_us).over(w)
    p = float(10**round_digits)
    raw = dv.cast("double") / scale / (dt.cast("double") / 1e6)
    return df.withColumn(
        out_col,
        F.when(dt > 0, F.floor(raw * p + F.lit(0.5)) / p),
    )
