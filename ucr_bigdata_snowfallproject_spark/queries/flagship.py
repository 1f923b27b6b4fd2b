"""Flagship (SURVEY S7.1): monthly median measures + dimension join — query registrations.

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
# Flagship (SURVEY §7.1): monthly median measures + dimension join
# =========================================================================


@register(
    "flagship_monthly_median_join",
    """
    SELECT m.l_suppkey, m.ship_year, m.ship_month, s.s_name, s.s_nationkey,
           m.median_qty, m.median_price
    FROM (SELECT l_suppkey,
                 CAST(EXTRACT(year FROM l_shipdate) AS INTEGER)  AS ship_year,
                 CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS ship_month,
                 ROUND(MEDIAN(l_quantity), 4)      AS median_qty,
                 ROUND(MEDIAN(l_extendedprice), 4) AS median_price
          FROM lineitem GROUP BY 1, 2, 3) m
    JOIN supplier s ON m.l_suppkey = s.s_suppkey
    """,
)
def flagship_monthly_median_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference pipeline shape (SURVEY §7.1): monthly median measures
    per entity (A1, untitled.py:81) ⋈ broadcast dimension (J1,
    untitled.py:85). Aggregate-below-join keeps the shuffle on the
    pre-aggregated (small) side; the dim never shuffles."""
    l = load_table(spark, sf_dir, "lineitem").withColumns(
        {"ship_year": F.year("l_shipdate"), "ship_month": F.month("l_shipdate")}
    )
    medians = aggregates.group_median(
        l,
        ["l_suppkey", "ship_year", "ship_month"],
        ["l_quantity", "l_extendedprice"],
    ).select(
        "l_suppkey",
        "ship_year",
        "ship_month",
        F.round("l_quantity", 4).alias("median_qty"),
        F.round("l_extendedprice", 4).alias("median_price"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
    )
    return relational.join_dim(medians, s, on=["l_suppkey"]).select(
        "l_suppkey", "ship_year", "ship_month", "s_name", "s_nationkey",
        "median_qty", "median_price",
    )


