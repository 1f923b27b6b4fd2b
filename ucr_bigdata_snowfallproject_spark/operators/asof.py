"""As-of and range joins (SURVEY §2.3 extension — nearest-observation
lookup for the weather time-series use case).

- :func:`asof_join` — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key. Implemented as union + window
  (last_value over the interleaved stream): ONE shuffle on (key), no
  range-condition nested-loop, no per-key collect. This is the
  sort-merge-friendly formulation that survives scale.
- :func:`range_join` — interval containment via inequality join; Spark
  plans a sort-merge/broadcast-nested-loop; callers bucket coarse ranges
  first when both sides are large.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Merge-asof (backward): each left row gets the most recent right
    values at-or-before its timestamp, per key.

    Union-interleave strategy: tag sides, sort by (key, ts, side-order),
    forward-fill right values with ``last(ignorenulls)`` over
    rows-unbounded-preceding, keep left rows. ``tolerance`` (e.g. '3600'
    seconds) nulls out matches older than the window.
    """
    lt = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    rt = (
        right.select(
            *keys, F.col(right_ts).alias("__ts"), *[F.col(v) for v in right_values]
        )
        .withColumn("__ts", F.col("__ts").cast("timestamp"))
        .withColumn("__side", F.lit(0))
    )
    lcols = [c for c in lt.columns if c not in ("__side",)]
    merged = lt.select(
        *[F.col(c) for c in lcols],
        "__side",
        *[F.lit(None).cast(rt.schema[v].dataType).alias(f"__r_{v}") for v in right_values],
    ).unionByName(
        rt.select(
            *[
                F.col(c) if c in rt.columns else F.lit(None).cast(lt.schema[c].dataType).alias(c)
                for c in lcols
            ],
            "__side",
            *[F.col(v).alias(f"__r_{v}") for v in right_values],
        ),
        allowMissingColumns=False,
    )
    # right rows sort before left rows at equal ts → "at or before" semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *[F.col(c) for c in lcols],
        "__side",
        *[
            F.last(f"__r_{v}", ignorenulls=True).over(w).alias(v)
            for v in right_values
        ],
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        age = F.col("__ts").cast("long") - F.col("__match_ts").cast("long")
        out = out.select(
            *[c for c in lcols],
            *[
                F.when(age <= int(tolerance), F.col(v)).alias(v)
                for v in right_values
            ],
            "__match_ts",
        )
    return out.drop("__ts", "__match_ts")


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: Sequence[str] = (),
    grid: int = 3600,
) -> DataFrame:
    """Interval-overlap join — both sides are interval SETS (closed
    intervals in the same numeric/epoch domain), matched when they overlap
    (``l_start ≤ r_end AND r_start ≤ l_end``), optionally within equal
    ``keys``.

    The scalable shape: a naive inequality join plans a nested loop over
    the key group. Here both sides explode to ``grid``-sized cells
    (interval [s,e] → cells ⌊s/g⌋..⌊e/g⌋), the join keys on (keys, cell) —
    an equi-join, hash-partitionable — and the overlap predicate filters
    inside cells. The classic duplicate problem (a pair sharing several
    cells matches once per cell) is solved WITHOUT a dedup shuffle by the
    covering-cell trick: keep the match only in the cell containing
    ``max(l_start, r_start)`` — the first cell of the overlap region,
    which both intervals provably cover — so each overlapping pair
    survives exactly once.

    ``grid`` trades explode factor (long intervals → many cells) against
    cell population (small grid → more cells, fewer rows per cell); set it
    near the typical interval length."""
    ks = list(keys)

    def cells(df: DataFrame, s: str, e: str, side: str) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / grid), F.floor(F.col(e) / grid)
                )
            ).alias(f"__cell_{side}"),
        )

    lc = cells(left, l_start, l_end, "l")
    rc = cells(right, r_start, r_end, "r")
    cond = (F.col(f"__cell_l") == F.col(f"__cell_r"))
    for k in ks:
        cond = cond & (lc[k] == rc[k])
    joined = lc.join(rc, cond).filter(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        # covering cell: emit only where the overlap region begins
        & (
            F.col("__cell_l")
            == F.floor(F.greatest(F.col(l_start), F.col(r_start)) / grid)
        )
    )
    out = joined.drop("__cell_l", "__cell_r")
    for k in ks:
        out = out.drop(rc[k])
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: Column,
    right_lo: Column,
    right_hi: Column,
    extra: Column | None = None,
    hi_inclusive: bool = True,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    containing them (``hi_inclusive=False`` → half-open [lo, hi), the
    non-overlapping-bands convention). Equi-key in ``extra`` turns the plan
    into a sort-merge join with range predicate as post-filter (the scalable
    shape)."""
    upper = left_point <= right_hi if hi_inclusive else left_point < right_hi
    cond = (left_point >= right_lo) & upper
    if extra is not None:
        cond = extra & cond
    return left.join(right, cond)
