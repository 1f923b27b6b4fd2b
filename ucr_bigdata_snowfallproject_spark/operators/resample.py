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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    unit = step.split()[1].rstrip("s")  # "1 hour" -> date_trunc unit "hour"
    bucketed = (
        df.select(
            F.col(key_col),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
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
