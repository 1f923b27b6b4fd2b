"""TPC-H breadth adapted to the driver's star schema (incl. the round-4 Q2/Q9/Q20/Q21 completion) — query registrations.

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
# TPC-H breadth (adapted to the driver's star schema — no partsupp /
# commit/receipt dates, so Q2/Q4/Q12/Q20/Q21 shapes are re-expressed over
# the tables that exist). Each exercises a distinct plan shape the engine
# must keep efficient at 100 TB: disjunctive pushdown, decorrelated
# correlated aggregates, anti-join + scalar subquery, arg-max-over-agg.
# =========================================================================


@register(
    "q6_revenue_forecast",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure filter+global-agg. The whole query should
    collapse to one codegen'd scan stage with every predicate in
    PushedFilters (asserted in test_plan_shapes) — at 100 TB this is the
    row-group-skipping showcase."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: two roles of the same dimension (nation as supplier-
    side and customer-side), disjunctive cross-pair filter, year rollup.
    Both nation joins broadcast; the only shuffles are fact⋈orders and the
    final 4-group agg."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ("NATION_1", "NATION_2")
    s_n = s.join(
        F.broadcast(n.withColumnRenamed("n_name", "supp_nation")), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", "supp_nation")
    c_n = c.join(
        F.broadcast(n.withColumnRenamed("n_name", "cust_nation")), c.c_nationkey == n.n_nationkey
    ).select("c_custkey", "cust_nation")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s_n.filter(F.col("supp_nation").isin(*pair))), l.l_suppkey == s_n.s_suppkey)
        .join(c_n.filter(F.col("cust_nation").isin(*pair)), o.o_custkey == c_n.c_custkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: returned-item reporting — selective fact filter,
    3-way join, top-20 by aggregated revenue (TakeOrderedAndProject above
    the agg; never a global sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )
    return relational.top_k(
        agg.select(
            "c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name"
        ),
        [F.desc("revenue"), F.asc("c_custkey")],
        20,
    )


@register(
    "q14_promo_revenue",
    """
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                   / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: conditional aggregate ratio over a broadcast
    fact⋈dim join — one scan, zero shuffles beyond the single-row agg."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: arg-max over an aggregate (view reused twice in the
    SQL). Spark plan: one agg, then an empty-partition window max — the
    window over no keys stays a single exchange of the *aggregated* (tiny)
    relation, never the fact table."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = rev.withColumn("_mx", F.max("total_revenue").over(Window.partitionBy())).filter(
        F.col("total_revenue") == F.col("_mx")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(F.broadcast(top), s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM (
      SELECT l_extendedprice,
             AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty,
             l_quantity, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#11'
    )
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: correlated per-part average, decorrelated to a
    window (equivalently groupBy+rejoin). The window partitions on the join
    key the rows already shuffled on — AQE reuses the exchange."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select(
        "p_partkey"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        j.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_predicates",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    extracts the common single-side conjuncts (brand IN (...), quantity
    ranges) below the join so the scan still prunes; the residual
    disjunction evaluates post-join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & qty.between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "q22_idle_rich_customers",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT)      AS numcust,
           ROUND(SUM(c_acctbal), 2)      AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: scalar subquery threshold + NOT EXISTS anti-join.
    The threshold is a one-row broadcast (never a collect); the anti join
    ships only customer keys. Phone-prefix from the spec is adapted to
    mktsegment (no phone column in the fixture)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q11_top_share_parts",
    """
    WITH part_value AS (
      SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS val
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(val, 2) AS part_value
    FROM part_value
    WHERE val > (SELECT SUM(val) * 0.0005 FROM part_value)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_top_share_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: an aggregate filtered against a scalar fraction of
    its own total (partsupp value adapted to lineitem part value). The
    total re-aggregates the 200k-group output — a one-row broadcast, never
    a second fact scan (ReuseExchange dedups the shared subplan)."""
    l = load_table(spark, sf_dir, "lineitem")
    pv = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("val")
    )
    total = pv.agg((F.sum("val") * 0.0005).alias("__cut"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("__cut"))
        .select("l_partkey", F.round("val", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@register(
    "q16_supplier_variety",
    """
    SELECT p_brand, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand IN ('Brand#21', 'Brand#22', 'Brand#23')
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: distinct-count aggregation after a dim join with a
    NOT IN exclusion (complaints clause adapted to negative-balance
    suppliers; partsupp adapted to the lineitem part-supplier link). The
    exclusion plans as a broadcast anti-join; COUNT(DISTINCT) expands to a
    two-phase aggregate."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#21", "Brand#22", "Brand#23")
    ).select("p_partkey", "p_brand", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "curation_pipeline_stats",
    """
    WITH kept AS (
      SELECT doc_id, lang, text,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
      WHERE length(text) >= 100
        AND len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 20
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
          ORDER BY doc_id) AS rn
        FROM kept) WHERE rn = 1
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)        AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)   AS total_tokens,
           ROUND(AVG(n_tokens), 4)         AS avg_tokens
    FROM deduped
    GROUP BY lang
    """,
)
def curation_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end LLM-data curation pipeline as ONE declarative plan
    (X1+X4 composed): length/token floor → exact near-dup removal on the
    normalized-text fingerprint (deterministic min-id survivor) → per-
    language token budget. At 100 TB this is the shape of a pretraining
    data refresh: one scan, one dedup shuffle, one 2-digit-cardinality
    agg."""
    d = load_table(spark, sf_dir, "documents")
    kept = d.select(
        "doc_id", "lang", "text", text_ops.token_count("text").alias("n_tokens")
    ).filter((F.length("text") >= 100) & (F.col("n_tokens") >= 20))
    deduped = dedup_ops.exact_dedup(
        kept.withColumn("__fp", text_ops.fingerprint("text")), ["__fp"], "doc_id"
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@register(
    "q4_priority_with_late_lines",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: EXISTS over the fact table → left-semi join, then a
    tiny-cardinality count (commitdate<receiptdate adapted to
    shipdate>orderdate — the fixtures carry no commit/receipt dates). The
    semi join ships only (orderkey, shipdate); duplicates never reach the
    agg."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN n_name = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n_name
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of a region's yearly volume — a
    conditional-sum ratio per group over a 4-dim join chain (all dims
    broadcast; the fact shuffles once into the year agg)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), l.l_suppkey == dim.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "n_name",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q12_shipmode_priority_counts",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: per-category conditional counts of the joined
    priority (shipmode adapted to linestatus — no l_shipmode in the
    fixture). CASE-sum pairs collapse into one pass over the join."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: customer order-count histogram — LEFT OUTER join
    with an extra join-side predicate (kept in the ON clause, NOT a WHERE,
    so customers with zero qualifying orders survive as count 0), then a
    second aggregation over the first's output."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "resample_events_hourly_ffill",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             arg_max(value, event_id) AS bucket_last
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      FROM span
    )
    SELECT g.user_id, g.bucket,
           COALESCE(h.n_events, 0) AS n_events,
           ROUND(LAST_VALUE(h.bucket_last IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS last_value
    FROM grid g LEFT JOIN hourly h USING (user_id, bucket)
    """,
)
def resample_events_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators.resample): densify each user's
    event series onto an hourly grid between their first and last hour,
    forward-filling the latest value across gaps — the dense-time-axis
    shape the reference's TimeSlider serving layer needs
    (map_tutorial.html:65-71) and the gap-robust twin of the reference's
    irregular monthly rollup (untitled.py:81)."""
    from ..operators.resample import resample_forward_fill

    e = load_table(spark, sf_dir, "events")
    out = resample_forward_fill(e, "user_id", "ts", "value", "event_id", "1 hour")
    return out.select(
        "user_id", "bucket", "n_events", F.round("last_value", 4).alias("last_value")
    )


@register(
    "group_quantiles_lineitem",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
           ROUND(quantile_cont(l_quantity, 0.5),  4) AS q50,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75,
           ROUND(quantile_cont(l_quantity, 0.95), 4) AS q95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def group_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact quantiles at 4 probabilities (A1 family,
    aggregates.group_quantiles): cross-engine pin that Spark's
    ``percentile`` linear interpolation matches ANSI ``quantile_cont``.
    The approx switch (mergeable sketch) is the 100 TB path, pinned
    against this exact form in tests."""
    l = load_table(spark, sf_dir, "lineitem")
    out = aggregates.group_quantiles(
        l, ["l_returnflag"], "l_quantity", (0.25, 0.5, 0.75, 0.95)
    )
    return out.select(
        "l_returnflag",
        *[F.round(c, 4).alias(c) for c in ("q25", "q50", "q75", "q95")],
    )


@register(
    "text_tfidf_top_terms",
    r"""
    WITH terms AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM terms GROUP BY doc_id, term
    ), df_t AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             ROUND(tf.tf * LN(CAST(n.n + 1 AS DOUBLE) / (df_t.df + 1)), 6) AS tfidf
      FROM tf JOIN df_t USING (term) CROSS JOIN n
    )
    SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction (X4 text analysis): top-3 TF-IDF terms per
    document with smoothed idf = ln((N+1)/(df+1)) and a deterministic
    (score desc, term asc) tiebreak. Plan shape: one corpus explode →
    (doc, term) TF shuffle; the vocabulary-sized DF table broadcasts back;
    per-doc window top-k. See operators/text.py:tfidf_top_terms."""
    d = load_table(spark, sf_dir, "documents")
    return text_ops.tfidf_top_terms(d, "doc_id", "text", k=3)


@register(
    "text_unigram_logppl",
    r"""
    WITH terms AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), vocab AS (
      SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term
    ), total AS (
      SELECT SUM(cnt) AS total FROM vocab
    )
    SELECT t.doc_id,
           ROUND(AVG(-LN(v.cnt / total.total)), 6) AS logppl,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM terms t JOIN vocab v USING (term) CROSS JOIN total
    GROUP BY t.doc_id
    """,
)
def text_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-perplexity quality signal (X4, CCNet-style): mean
    −ln p(token) per document against the corpus's own unigram
    distribution — the cheap outlier detector a curation pipeline bins
    documents by. One heavy explode shuffle; the vocabulary and the
    total-token scalar broadcast back. See operators/text.py:unigram_logppl."""
    d = load_table(spark, sf_dir, "documents")
    return text_ops.unigram_logppl(d, "doc_id", "text")


@register(
    "curation_length_band_filter",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents
    )
    SELECT doc_id, source, n_chars FROM ranked
    WHERE rn >= CAST(FLOOR(n * 0.05) AS BIGINT) + 1
      AND rn <= n - CAST(FLOOR(n * (1.0 - 0.95)) AS BIGINT)
    """,
)
def curation_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality filter: drop the shortest and longest 5% of
    documents by corpus-relative rank, not fixed byte cutoffs. The exact
    rank form here is the SQL-expressible correctness contract; the 100 TB
    path is ``approx=True`` (percentile_approx cutoffs → pure predicate,
    no global sort), pinned against this form in
    tests/test_extension_ops.py. See operators/text.py:length_band_filter."""
    d = load_table(spark, sf_dir, "documents")
    return text_ops.length_band_filter(
        d.select("doc_id", "source", "n_chars"), "n_chars", "doc_id"
    )


@register("embedding_cluster_sizes", None)  # seeded k-means — engine-specific
def embedding_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic/mixture diagnostic (X3 family): seeded k-means assignment over
    the embedding column → per-cluster member counts. Shows distribution
    drift and over-represented modes before any expensive curation pass.
    Rows-only (k-means draws are engine-specific); in-Spark determinism and
    count conservation pinned in tests. See
    operators/similarity.py:cluster_assign."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim_ops.cluster_sizes(e, n_centroids=16, seed=42)


@register("stratified_sample_orders", None)  # sampling draw is engine-specific
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample (`sampleBy`): different keep-rates per
    order priority — the profiling/debugging primitive for skewed 100 TB
    tables (oversample rare strata, undersample dominant ones). Rows-only:
    engines draw different rows; determinism within Spark is pinned by the
    fixed seed (pytest), and the sampling SEMANTICS are externally proven
    by the portable twin ``stratified_sample_portable`` below."""
    o = load_table(spark, sf_dir, "orders")
    fractions = {"1-URGENT": 0.5, "2-HIGH": 0.2, "3-MEDIUM": 0.1,
                 "4-NOT SPECIFIED": 0.1, "5-LOW": 0.05}
    return o.sampleBy("o_orderpriority", fractions, seed=42).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


@register(
    "stratified_sample_portable",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                                   || '#ordstrat'), 1, 8))::BIGINT
               AS DOUBLE) / 4294967296.0
          < CASE o_orderpriority
              WHEN '1-URGENT' THEN 0.5 WHEN '2-HIGH' THEN 0.2
              WHEN '3-MEDIUM' THEN 0.1 WHEN '4-NOT SPECIFIED' THEN 0.1
              ELSE 0.05 END
    """,
)
def stratified_sample_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified per-priority sample, ENGINE-PORTABLE (VERDICT r15
    next-round #3): ``curation.stratified_sample`` keeps a row iff
    ``md5-prefix(o_orderkey || '#ordstrat') / 2^32 < rate(priority)`` —
    the same fractions as the seeded ``sampleBy`` twin above, but the
    kept set is a pure function of (id, seed, stratum), so the DuckDB
    oracle recomputes it IDENTICALLY from the md5 rule. Nested samples
    for free (hash thresholds contain each other — raise a stratum's
    rate and the old sample is a subset of the new). Scan-shaped, no
    shuffle; at 100 TB this is a pushdown-friendly predicate on the
    fact scan."""
    from ..operators import curation as cur_ops

    o = load_table(spark, sf_dir, "orders")
    rates = {"1-URGENT": 0.5, "2-HIGH": 0.2, "3-MEDIUM": 0.1,
             "4-NOT SPECIFIED": 0.1, "5-LOW": 0.05}
    return cur_ops.stratified_sample(
        o, "o_orderpriority", rates, "o_orderkey",
        seed="ordstrat", default_rate=0.05,
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


# =========================================================================
# Round-4 TPC-H completion: Q2/Q9/Q20/Q21 plan shapes adapted to the
# fixture schema (no partsupp / receipt dates — COVERAGE.md documents the
# substitutions). With these, all 22 TPC-H query SHAPES are covered.
# =========================================================================


@register(
    "q9_product_type_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity), 2) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape (adapted: 0.1·p_retailprice stands in for the
    missing partsupp ps_supplycost): deep 5-way join — selective dim
    filter (p_name) drives the fact scan, two broadcast dims, profit
    aggregated by (nation, year). The canonical star-join-profit plan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


@register(
    "q20_supplier_part_volume",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
      GROUP BY l_suppkey HAVING SUM(l_quantity) > 50)
    """,
)
def q20_supplier_part_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape (adapted: shipped-quantity history stands in for
    partsupp availability): IN-subquery containing its own aggregate with
    HAVING → inner agg once, then a left-semi join probes it. No
    correlated re-execution anywhere."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    l = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 50)
        .select("l_suppkey")
    )
    return s.join(
        heavy, s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


@register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM (
      SELECT l1.l_orderkey, l1.l_suppkey
      FROM late l1
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey)
    ) w
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape (adapted: late = shipped >60 days after the order
    date, standing in for the missing commit/receipt dates): the
    multi-EXISTS correlated pattern — EXISTS(another supplier in the
    order) → left-semi join, NOT EXISTS(another LATE supplier) →
    left-anti join, both on the order key with a supplier inequality.
    Top-20 waiting suppliers."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.alias("l1")
    others = l.select("l_orderkey", "l_suppkey").alias("l2")
    waiting = l1.join(
        others,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        late.alias("l3"),
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        waiting.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             ROUND(AVG(l_extendedprice / l_quantity), 4) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, s_name, unit_cost
    FROM cost
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size < 10
      AND unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                       WHERE c2.l_partkey = cost.l_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (adapted: observed average unit price from lineitem
    history stands in for partsupp ps_supplycost): correlated scalar MIN
    per part, decorrelated to a window-min over the partition the
    aggregate already shuffled on; small-part filter + broadcast dims.
    Ties at the min keep every minimal supplier (both engines agree on
    rounded values)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "unit_cost"
        )
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("__min", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("__min")
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_name", "unit_cost")
    )


