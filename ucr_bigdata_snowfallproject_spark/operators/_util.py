"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    has fewer partitions than cores.

    Small test files arrive as ONE input split (they're under
    ``spark.sql.files.maxPartitionBytes``), which serializes compute-heavy
    per-row operators (shingling, hashing, vector math) onto one core. At
    real scale the inputs span at least as many files as cores and this is
    a no-op.

    The gate reads ``df.inputFiles()`` (datasource file listing, already
    cached by the scan) instead of ``df.rdd.getNumPartitions()`` — the
    latter forces a full plan→RDD conversion per call, pure driver-side
    compile cost on plans where compile already dominates. Many files can
    still yield many splits each, so skipping when files ≥ cores never
    shrinks parallelism; few-files-but-huge inputs split fine on their own
    once they exceed ``spark.sql.files.maxPartitionBytes``, and the extra
    exchange this inserts for them keys the downstream aggregation anyway.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:  # non-file-backed plans (createDataFrame fixtures)
        pass
    return df.repartition(target, key) if key else df.repartition(target)
