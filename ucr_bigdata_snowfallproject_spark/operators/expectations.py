"""Row-level data-quality gates — the expectations layer (Delta Live
Tables / Great Expectations shape) an ingest pipeline runs before data is
allowed into a curated table: declare named boolean conditions, get a
violation report, and route rows (keep / drop / quarantine-with-reason).

Semantics: a row PASSES an expectation iff the condition evaluates TRUE;
NULL counts as a violation (SQL three-valued logic would otherwise let
null-ridden rows slip through every gate — the exact rows gates exist to
catch).

Scale: everything is column expressions over one scan — the report is a
single partial-aggregable job, enforcement is a filter, and the
quarantine split adds one array column; no shuffle anywhere, so gates run
at ingest scan speed on 100 TB. All DuckDB-oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fails(cond: Column) -> Column:
    """1 iff the expectation is violated (FALSE or NULL), else 0."""
    return F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)


def expectation_report(
    df: DataFrame, expectations: dict[str, Column]
) -> DataFrame:
    """Violation counts per expectation — one output row per named
    condition: (expectation, n_rows, n_fail). One aggregate job over one
    scan regardless of how many expectations are declared."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in expectations.items():
        aggs.append(F.sum(_fails(cond)).alias(name))
    row = df.agg(*aggs)
    stacked = ", ".join(f"'{n}', {n}" for n in expectations)
    return row.select(
        F.expr(
            f"stack({len(expectations)}, {stacked}) AS (expectation, n_fail)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("expectation", "n_rows", "n_fail")


def passes_all(expectations: dict[str, Column]) -> Column:
    """TRUE iff the row passes every expectation (NULL-safe)."""
    out = F.lit(True)
    for cond in expectations.values():
        out = out & F.coalesce(cond, F.lit(False))
    return out


def enforce_expectations(
    df: DataFrame, expectations: dict[str, Column]
) -> DataFrame:
    """The keep-gate: rows passing EVERY expectation (expect-or-drop)."""
    return df.filter(passes_all(expectations))


def quarantine_split(
    df: DataFrame, expectations: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(passed, quarantined): quarantined rows carry ``failed`` — the
    sorted array of violated expectation names — so a repair pipeline can
    route by reason. Both frames derive from one tagged plan; at 100 TB
    write both sinks from a single pass (e.g. partitioned by a pass
    flag) rather than scanning twice."""
    failed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(_fails(cond) == 1, F.lit(name))
                    for name, cond in expectations.items()
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    tagged = df.withColumn("failed", failed)
    passed = tagged.filter(F.size("failed") == 0).drop("failed")
    bad = tagged.filter(F.size("failed") > 0)
    return passed, bad
