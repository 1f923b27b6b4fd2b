"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Thin adapter over ``ucr_bigdata_snowfallproject_spark.queries.REGISTRY`` —
each registry entry is a (PySpark callable, DuckDB oracle SQL|None) pair;
see that module for per-query operator/SURVEY citations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ucr_bigdata_snowfallproject_spark.queries import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference pipeline's heart re-expressed Spark-first
    (SURVEY §7.1): monthly median measures per entity (A1,
    reference untitled.py:81) joined to a broadcast dimension (J1,
    reference untitled.py:85).
    """
    fn, _ = REGISTRY["flagship_monthly_median_join"]
    return fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query;
    non-SQL-expressible ops (sketches, hash-seeded LSH) are omitted →
    driver records the weaker rows-only check."""
    # The gsod_reference_pipeline oracle reads the fixture tree's
    # ground-truth parquet directly; materialize it here too so the SQL is
    # runnable even if the driver evaluates oracles before Spark queries.
    from ucr_bigdata_snowfallproject_spark.pipeline import fixtures as fx

    fx.ensure_tree()
    return {
        name: oracle for name, (_fn, oracle) in REGISTRY.items() if oracle is not None
    }
