"""Time-series regularization: resample onto a fixed grid + forward fill.

The reference's weather tables are irregular observations (stations skip
days — the monthly-median rollup at reference ``untitled.py:81`` papers
over gaps); a serving layer (the ArcGIS TimeSlider, ``map_tutorial.html:
65-71``) wants a dense, regular time axis. This operator densifies a keyed
event series onto a fixed-interval grid between each key's first and last
observation and forward-fills measure values across the gaps.

Scale shape (100 TB): the grid is generated per key with
``sequence``+``explode`` — grid size is bounded by span/step per key and
never materializes on the driver. The fill is ``last(ignorenulls)`` over a
running window: one shuffle on the key, streaming frame (no per-group
buffering). The bucket pre-aggregation shuffles on (key, bucket) first, so
the grid join is against an already-reduced relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Fixed-width step units in microseconds. Month/year are NOT fixed-width —
#: epoch flooring can't express them; use step="1 month" ⇒ date_trunc only.
_UNIT_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
    "week": 7 * 86_400 * 1_000_000,
}

#: Units date_trunc understands for the count == 1 fast path.
_TRUNC_UNITS = {"second", "minute", "hour", "day", "week", "month", "year"}


def _bucket_expr(ts: Column, step: str) -> Column:
    """Floor ``ts`` onto the ``step`` grid.

    ``step`` is "<count> <unit>" ("1 hour", "15 minutes"). count == 1 uses
    ``date_trunc`` (matches SQL-engine semantics exactly); multi-unit
    fixed-width steps floor on epoch microseconds — pure integer
    ``us - pmod(us, step_us)`` so "15 minutes" buckets to :00/:15/:30/:45,
    not to the 1-minute truncation (which would silently miss the grid
    join and zero out every bucket). Multi-unit month/year steps raise:
    they're not fixed-width.
    """
    parts = step.split()
    if len(parts) != 2:
        raise ValueError(f"step must be '<count> <unit>', got {step!r}")
    count, unit = int(parts[0]), parts[1].rstrip("s").lower()
    if count == 1:
        if unit not in _TRUNC_UNITS:
            raise ValueError(f"unsupported step unit {unit!r}")
        return F.date_trunc(unit, ts)
    if unit not in _UNIT_US:
        raise ValueError(
            f"multi-unit steps need a fixed-width unit {sorted(_UNIT_US)}, got {unit!r}"
        )
    step_us = F.lit(count * _UNIT_US[unit])
    us = F.unix_micros(ts)
    return F.timestamp_micros(us - F.pmod(us, step_us))


def resample_forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regularize ``df`` to one row per (key, ``step``-bucket) between each
    key's first and last bucket.

    Output columns: ``key_col``, ``bucket`` (timestamp), ``n_events``
    (rows observed in the bucket, 0 for generated gap rows), ``last_value``
    (the ``value_col`` of the bucket's latest row by ``order_col``,
    forward-filled from the previous non-empty bucket for gap rows).

    ``order_col`` must be unique per row (e.g. an event id) so the
    per-bucket "latest" is deterministic and oracle-checkable.
    """
    bucketed = (
        df.select(
            F.col(key_col),
            _bucket_expr(F.col(ts_col), step).alias("bucket"),
            F.col(value_col).alias("__v"),
            F.col(order_col).alias("__o"),
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by("__v", "__o").alias("__bucket_last"),
        )
    )
    grid = (
        bucketed.groupBy(key_col)
        .agg(F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1"))
        .select(
            key_col,
            F.explode(
                F.sequence("__b0", "__b1", F.expr(f"INTERVAL {step}"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(bucketed, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("__bucket_last", ignorenulls=True).over(w).alias("last_value"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    order_tiebreakers: list[str] = (),
    bucket_us: int = 3_600 * 1_000_000,
    scale: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key, per-bucket TIME-weighted average under last-observation-
    carried-forward semantics (TimescaleDB's ``time_weight``): each
    observation's value holds from its timestamp until the key's next
    observation; a bucket's TWA is ∫value·dt over the bucket divided by
    covered time. The telemetry/finance primitive a plain AVG gets wrong
    whenever sampling is irregular (a 1-second spike shouldn't weigh like
    an hour-long plateau).

    Semantics: segments are [t_i, t_{i+1}) — the key's OPEN-ENDED last
    observation bounds nothing and is excluded (documented; pass a sentinel
    end-of-horizon row per key to clip against a horizon instead).
    Equal-timestamp observations order by ``order_tiebreakers``; the
    earlier ones form zero-length segments, so the last one wins — 
    deterministic under any arrival order. Buckets a key never covers
    emit nothing; partially covered buckets divide by COVERED time only.

    Determinism: everything up to the final division is exact integer
    arithmetic — event times in exact microseconds, segment/bucket
    overlaps as integer durations, values as round(v·scale) integers,
    and Σ(v·dur) as a decimal(38,0) sum of decimal·long products (each
    product |v·scale|·overlap ≤ 2⁶³·bucket_us would overflow a LONG
    multiply for |value| > 2⁶³/(scale·bucket_us) ≈ 2.6·10⁷ at hourly
    buckets/scale 100 — well inside telemetry range; the decimal path is
    exact to 10³⁸, i.e. |value|·scale·bucket_us·rows < 10³⁸, and NULLs
    visibly past it instead of wrapping) — then ONE float division +
    floor-half-up rounding (exact-integer-sums rule; bit-identical
    oracle, whose HUGEINT sums are exact the same way).

    Scale shape: one window (lead) per key for segments; segments explode
    to the buckets they cover (bound: gap/bucket_us rows per segment —
    pick the bucket for the data's sparsity, exactly like resample); one
    partial-aggregable (keys, bucket) groupBy. Nothing corpus-sized after
    the explode."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_tiebreakers]
    )
    t0 = F.unix_micros(F.col(ts_col))
    cents = F.round(F.col(value_col) * scale).cast("long")
    seg = (
        df.select(
            *keys,
            t0.alias("__t0"),
            F.lead(t0).over(w).alias("__t1"),
            cents.alias("__v"),
        )
        .filter(F.col("__t1").isNotNull() & (F.col("__t1") > F.col("__t0")))
    )
    b0 = F.floor(F.col("__t0") / bucket_us).cast("long")
    b1 = F.floor((F.col("__t1") - 1) / bucket_us).cast("long")
    per_bucket = seg.select(
        *keys,
        "__t0",
        "__t1",
        "__v",
        F.explode(F.sequence(b0, b1)).alias("__b"),
    ).select(
        *keys,
        "__b",
        "__v",
        (
            F.least(F.col("__t1"), (F.col("__b") + 1) * bucket_us)
            - F.greatest(F.col("__t0"), F.col("__b") * bucket_us)
        ).alias("__dur"),
    )
    p = float(10**round_digits)
    agged = per_bucket.groupBy(*keys, "__b").agg(
        # decimal(19,0)·long → decimal(38,0): exact where a long·long
        # multiply would silently wrap (|v·scale| > 2⁶³/bucket_us)
        F.sum(F.col("__v").cast("decimal(19,0)") * F.col("__dur")).alias("__num"),
        F.sum("__dur").alias("__den"),
    )
    twa = F.floor(
        F.col("__num") / (F.col("__den").cast("double") * scale) * p + F.lit(0.5)
    ) / p
    return agged.filter(F.col("__den") > 0).select(
        *keys,
        F.timestamp_micros(F.col("__b") * bucket_us).alias("bucket_start"),
        F.col("__den").alias("covered_us"),
        twa.alias("twa"),
    )
