"""As-of / range joins, sessionization, rank surface, grouping sets, pivot — query registrations.

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
# As-of / range joins, sessionization, rank surface, grouping sets, pivot
# (SURVEY §2.3 extension, §2.5, §2.4)
# =========================================================================


@register(
    "asof_join_purchase_attribution",
    """
    SELECT c.event_id, c.user_id, c.ts, c.value AS click_value,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join — nearest-observation lookup (SURVEY §2.3
    extension): each click gets the most recent at-or-before purchase value
    per user. Union-interleave + forward-fill formulation: ONE shuffle on
    user_id, no range nested-loop (operators.asof.asof_join)."""
    from ..operators import asof as asof_ops

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_ops.asof_join(
        clicks, purchases, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_values=["purchase_value"],
    )
    return out.select("event_id", "user_id", "ts", "click_value", "purchase_value")


@register(
    "range_join_price_bands",
    """
    SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(o.o_totalprice), 4) AS avg_price
    FROM orders o
    JOIN (VALUES (0.0, 100000.0, 'low'), (100000.0, 250000.0, 'mid'),
                 (250000.0, 400000.0, 'high'), (400000.0, 1e9, 'jumbo'))
         b(lo, hi, band)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (SURVEY §2.3 extension) against a
    broadcast band dimension; half-open [lo, hi) bands. The tiny interval
    side broadcasts → BroadcastNestedLoopJoin, corpus never shuffles."""
    from ..operators import asof as asof_ops

    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [(0.0, 100000.0, "low"), (100000.0, 250000.0, "mid"),
         (250000.0, 400000.0, "high"), (400000.0, 1e9, "jumbo")],
        "lo double, hi double, band string",
    )
    joined = asof_ops.range_join(
        o, F.broadcast(bands), F.col("o_totalprice"), F.col("lo"), F.col("hi"),
        hi_inclusive=False,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "sessionize_events",
    """
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS sum_value,
           MIN(ts)                   AS session_start
    FROM (SELECT user_id, ts, value,
                 CAST(SUM(CASE WHEN prev IS NULL
                               OR epoch_us(ts - prev) > 21600000000 THEN 1
                               ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM (SELECT user_id, event_id, ts, value,
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
                FROM events))
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (6 h inactivity gap) — the batch twin of
    streaming session_window (SURVEY §2.10). Gap math in microseconds so
    both engines agree exactly; one shuffle on user_id drives lag, the
    running session counter, and the final per-session aggregate."""
    from ..operators.windows import sessionize

    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, ["user_id"], "ts", gap_seconds=21600, tiebreakers=["event_id"])
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("ts").alias("session_start"),
    )


@register(
    "window_rank_functions",
    """
    SELECT s_nationkey, s_suppkey,
           CAST(RANK()       OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6)      AS prnk,
           CAST(NTILE(4)     OVER w AS INTEGER) AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking surface (SURVEY §2.5): rank, dense_rank, percent_rank,
    ntile over one window spec — a single exchange+sort serves all four."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY §2.4 extension) — the general form
    rollup/cube specialize; one Expand node, one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total")
    )


@register(
    "pivot_status_by_segment",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an explicit value list — explicit values keep
    the plan single-pass (no distinct-scan to discover columns), the shape
    that survives 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        # customer scales WITH the fact tables (unlike nation/region) —
        # not force-broadcast; AQE upgrades at small scale (r4 lesson)
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "c_mktsegment",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
    )


@register(
    "correlation_matrix_lineitem",
    """
    SELECT ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_l_quantity,
           ROUND(CORR(l_extendedprice, l_discount), 6) AS corr_l_discount,
           ROUND(CORR(l_extendedprice, l_tax), 6)      AS corr_l_tax
    FROM lineitem
    """,
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 one-job correlation matrix via operators.aggregates
    .correlation_matrix — numeric columns from df.schema metadata (F10), all
    corr aggregates in ONE scan (vs the reference's per-column job loop,
    untitled.py:162-165)."""
    l = load_table(spark, sf_dir, "lineitem")
    out = aggregates.correlation_matrix(
        l, "l_extendedprice", ["l_quantity", "l_discount", "l_tax"]
    )
    return out.select(
        *[F.round(c, 6).alias(c) for c in out.columns]
    )


@register(
    "array_functions_embeddings",
    """
    SELECT vec_id,
           CAST(embedding[1] AS DOUBLE)                                AS first_dim,
           CAST(LEN(list_filter(embedding, x -> x > 0)) AS INTEGER)    AS n_pos,
           ROUND(SQRT(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])), 4)       AS l2,
           ROUND(list_sum(list_transform(embedding::DOUBLE[],
                                         x -> x * 2)), 4)              AS sum_scaled
    FROM embeddings
    """,
)
def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-lambda scalar surface (SURVEY §2.8 extension): element_at,
    filter, aggregate (dot), transform — all JVM-side codegen'd expressions,
    zero Python in the hot path."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(sim_ops.l2_norm(F.col("embedding")), 4).alias("l2"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * 2),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sum_scaled"),
    )


