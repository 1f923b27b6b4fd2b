"""Scalar functions (SURVEY S2.8 F1-F10 + JSON/array extensions) — query registrations.

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
# Scalar functions (SURVEY §2.8 F1-F10 + JSON/array extensions)
# =========================================================================


@register(
    "scalar_string_functions",
    """
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INTEGER) AS brand_num,
           split_part(p_type, ' ', 1)                            AS type_head,
           concat_ws('|', p_brand, p_type)                       AS brand_type,
           upper(p_name)                                         AS name_upper,
           CAST(length(p_name) AS INTEGER)                       AS name_len,
           substring(p_name, 1, 5)                               AS name_prefix
    FROM part
    """,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F4/F5 string surface (regex extract, split, null-skipping
    concat; reference untitled.py:23,33,49-50,69-71)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
    )


@register(
    "scalar_date_parts",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)  AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(COUNT(*) AS BIGINT)                         AS n_orders,
           ROUND(SUM(o_totalprice), 2)                      AS total
    FROM orders GROUP BY 1, 2
    """,
)
def scalar_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 date-part derivation + monthly grain aggregation (reference
    untitled.py:57-59,81)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            "o_totalprice",
        )
        .groupBy("order_year", "order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "conditional_balance_buckets",
    """
    SELECT c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY 1, 2
    """,
)
def conditional_balance_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 conditional expression (when/otherwise; reference untitled.py:34
    — implemented with the *intended* null semantics, see SURVEY §7.4)."""
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        c.withColumn("bucket", bucket)
        .groupBy("c_mktsegment", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


@register(
    "json_extract_events",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT)               AS n_with_k,
           ROUND(AVG(value), 4)                                                   AS avg_value
    FROM events GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the events props column (SURVEY §2.8
    extension: get_json_object; the semi-structured surface)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_with_k"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@register(
    "events_hourly_buckets",
    """
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregation in batch (the batch twin of the
    streaming surface, SURVEY §2.10): F.window ≡ epoch-aligned bucketing."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )


