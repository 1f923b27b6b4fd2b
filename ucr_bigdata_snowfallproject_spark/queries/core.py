"""Relational core (SURVEY S2.2 P1-P9, S2.3 J1/J2, S2.6 O1/O2, S2.7 U1) — query registrations.

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
# Relational core (SURVEY §2.2 P1-P9, §2.3 J1/J2, §2.6 O1/O2, §2.7 U1)
# =========================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregation (A-series; the engine's headline
    scan+agg). Partial+final hash agg, fully codegen'd; at 100 TB the only
    shuffle is the 6-group exchange."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped join+agg+top-k (J1 fact⋈dim chain + O1 top-k;
    reference's join at untitled.py:85, sort+tail at untitled.py:20-21).
    customer is broadcast; top-k plans as TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    # the segment-filtered customer side is still fact-scale at TPC-H
    # scaling — no forced broadcast, AQE picks the strategy (r4 lesson)
    joined = o.join(
        c.select(F.col("c_custkey").alias("o_custkey")), on="o_custkey"
    ).join(l, F.col("o_orderkey") == F.col("l_orderkey"))
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return relational.top_k(
        agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"),
        [F.desc("revenue"), F.asc("l_orderkey")],
        10,
    )


@register(
    "q5_nation_revenue",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN supplier ON s_nationkey = n_nationkey
                JOIN lineitem ON l_suppkey   = s_suppkey
                JOIN orders   ON o_orderkey  = l_orderkey
    WHERE r_name IN ('ASIA', 'AMERICA')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (J1 chain: two dim hops + fact⋈fact;
    SURVEY §2.3). region/nation/supplier broadcast — the fact table
    shuffles only for the lineitem⋈orders equi-join and final agg."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        l.join(o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(dims), l.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "filter_project_sentinels",
    """
    SELECT c_custkey, c_name, acctbal, c_mktsegment
    FROM (SELECT c_custkey, c_name,
                 CASE WHEN c_acctbal IN (0.0, -999.0, -999.9) THEN NULL
                      ELSE c_acctbal END AS acctbal,
                 c_mktsegment
          FROM customer)
    WHERE acctbal IS NOT NULL AND c_mktsegment <> 'MACHINERY'
    """,
)
def filter_project_sentinels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 null filter + P2 sentinel scrub + P6/P7 projection (reference
    untitled.py:26-27,36). IsNotNull + the inequality push to the scan."""
    c = load_table(spark, sf_dir, "customer")
    scrubbed = relational.scrub_sentinels(c, cols=["c_acctbal"]).withColumnRenamed(
        "c_acctbal", "acctbal"
    )
    return relational.project(
        relational.filter_not_null(scrubbed, "acctbal").filter(
            F.col("c_mktsegment") != "MACHINERY"
        ),
        "c_custkey",
        "c_name",
        "acctbal",
        "c_mktsegment",
    )


@register(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 semi join — the reference's hand-rolled row-at-a-time membership
    probe (untitled.py:72) as a broadcast left-semi join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return relational.semi_join(c, o, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 complement: left-anti join (SURVEY §2.3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return relational.anti_join(c, o, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "union_urgent_or_big_orders",
    """
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 300000
    """,
)
def union_urgent_or_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union-all accumulate (reference's append loop, untitled.py:80-82)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    big = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey", "o_orderpriority")
    return relational.union_all(urgent, big)


@register(
    "intersect_building_buyers",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def intersect_building_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics both engines; SURVEY §2.7)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return relational.intersect(
        c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
        o.select(F.col("o_custkey").alias("c_custkey")),
    )


@register(
    "except_all_nonbuilding",
    """
    SELECT c_nationkey FROM customer
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def except_all_nonbuilding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / exceptAll multiset difference (SURVEY §2.7)."""
    c = load_table(spark, sf_dir, "customer")
    return relational.except_all(
        c.select("c_nationkey"),
        c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey"),
    )


@register(
    "topk_orders_by_price",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 top-k (reference sort+tail at untitled.py:20-21); plans as
    TakeOrderedAndProject — O(k) memory per partition at any scale."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return relational.top_k(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 15)


