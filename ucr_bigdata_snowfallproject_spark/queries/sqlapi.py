"""SQL-API subqueries, date arithmetic, sliding windows, global scalars — query registrations.

Split from the flat ``queries.py`` in round 9 (VERDICT r08 #8): this
module exists for its ``@register`` side effects and is imported in a
fixed order by ``queries/__init__.py``; the registry order itself is
normalized afterwards by ``_reorder_registry`` (gated window first), so
module order never changes the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..io import load_table  # noqa: F401
from ..operators import aggregates, relational, windows  # noqa: F401
from ..operators import curation as curation_ops  # noqa: F401
from ..operators import dedup as dedup_ops  # noqa: F401
from ..operators import similarity as sim_ops  # noqa: F401
from ..operators import text as text_ops  # noqa: F401

from ._shared import REGISTRY, _scratch_dir, register  # noqa: F401

# =========================================================================
# SQL-API subqueries, date arithmetic, sliding windows, global scalars
# (SURVEY §2.4 A3, §2.8 F9, §3.2 SQL surface, §2.10 batch twin)
# =========================================================================


@register(
    "sql_scalar_subquery_above_avg",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def sql_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery through the Spark SQL entry point (SURVEY §3.2's
    redesigned lifecycle: temp views + one declarative statement; P3/A3's
    driver-side scalars become a subquery Catalyst folds into a broadcast
    scalar — no collect)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)"
    )


@register(
    "correlated_subquery_above_custavg",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
)
def correlated_subquery_above_custavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, hand-decorrelated the way Catalyst's
    DecorrelateInnerQuery would (SURVEY §4): per-key window average + filter
    — ONE shuffle on the correlation key instead of a per-row subquery."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("__avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("__avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "scalar_date_arithmetic",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month_start,
           CAST(EXTRACT(quarter FROM l_shipdate) AS INTEGER)  AS ship_quarter,
           CAST(EXTRACT(dow FROM l_shipdate) AS INTEGER)      AS ship_dow,
           CAST(COUNT(*) AS BIGINT)                           AS n_items,
           CAST(MIN(l_shipdate + INTERVAL 90 DAY) AS TIMESTAMP) AS min_due
    FROM lineitem
    GROUP BY 1, 2, 3
    """,
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9 date surface round 2: truncation, quarter/day-of-week parts,
    interval arithmetic (the monthly-climatology date toolkit). Spark
    dayofweek is 1=Sunday; DuckDB dow is 0=Sunday → aligned by -1."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.date_trunc("month", "l_shipdate").alias("ship_month_start"),
            F.quarter("l_shipdate").alias("ship_quarter"),
            (F.dayofweek("l_shipdate") - 1).alias("ship_dow"),
            F.col("l_shipdate"),
        )
        .groupBy("ship_month_start", "ship_quarter", "ship_dow")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min(F.col("l_shipdate") + F.expr("INTERVAL 90 DAYS")).alias("min_due"),
        )
    )


@register(
    "events_sliding_windows",
    """
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS sum_value
    FROM (SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
                 event_type, value FROM events
          UNION ALL
          SELECT time_bucket(INTERVAL '6 hours', ts) - INTERVAL '6 hours',
                 event_type, value FROM events)
    GROUP BY 1, 2
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregation in batch — the batch twin of the
    streaming sliding window (SURVEY §2.10): 12 h windows every 6 h, each
    event lands in 2 windows (Spark expands via its window generator; the
    oracle expresses the same as a union of phase-shifted tumbling
    buckets)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@register(
    "global_scalar_aggregates",
    """
    SELECT CAST(MIN(o_orderdate) AS TIMESTAMP) AS min_date,
           CAST(MAX(o_orderdate) AS TIMESTAMP) AS max_date,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           CAST(COUNT(*) AS BIGINT)    AS n_rows
    FROM orders
    """,
)
def global_scalar_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A6 global scalar min/max/count (the reference's driver-side
    ``max(years)``/``min(years)`` at untitled.py:29-30, kept distributed —
    partial+final agg, one row out, never a collect-and-loop)."""
    o = load_table(spark, sf_dir, "orders")
    return aggregates.scalar_agg(
        o,
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


