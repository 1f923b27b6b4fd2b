"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    has fewer partitions than cores.

    Small test files arrive as ONE input split (they're under
    ``spark.sql.files.maxPartitionBytes``), which serializes compute-heavy
    per-row operators (shingling, hashing, vector math) onto one core. At
    real scale the file splits already match core counts and this is a
    no-op — the partition count check costs nothing and never shrinks
    existing parallelism.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key) if key else df.repartition(target)
