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
