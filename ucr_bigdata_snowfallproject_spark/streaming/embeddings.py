"""Streaming ANN: flag arriving embeddings that are near-duplicates of a
STATIC IVF-indexed corpus — the vector-space face of
:mod:`.documents`' MinHash stream probe, and the streaming consumer of
:func:`~..operators.similarity.build_ivf_index`.

Per micro-batch, each arriving vector computes its centroid dots
scan-side (Arrow UDF — stateless, streaming-safe), explodes to its
``n_probe`` nearest cells, and a stream-static equi-join on ``__cell``
probes the inverted file; only probed-cell members are cosine-scored.
Corpus vectors are never re-assigned and the stream side's work is
O(batch × n_probe). Same append-mode, at-least-once contract as the
MinHash flag stream (a pair surfaces once per shared probed cell at most
``n_probe`` times; consumers treat flags as a set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from ..operators.similarity import (
    _ranked_cells,
    dot,
    l2_norm,
    matrix_dots_udf,
)

#: file-source schema for an embedding stream (mirrors the fixture table)
EMBEDDING_STREAM_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def read_embedding_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stream over a directory of embedding parquet files
    (exactly-once file tracking; swap for Kafka at deploy)."""
    reader = spark.readStream.schema(EMBEDDING_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_ann_near_dup_flags(
    vec_stream: DataFrame,
    cells: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_probe: int = 4,
    round_digits: int | None = 4,
) -> DataFrame:
    """Flag streaming vectors whose cosine similarity to an indexed
    corpus vector (within their ``n_probe`` nearest IVF cells) is ≥
    ``threshold``. ``cells`` is the static inverted file from
    :func:`~..operators.similarity.build_ivf_index` (persist/reload via
    ``index_store.save_ivf_cells``). Returns an append-mode stream of
    (id, matched_id, sim); self-matches excluded. Works identically on a
    batch frame (the batch-twin identity is pinned in tests) — all plain
    DataFrame ops, no state store."""
    n_centroids = len(centroids)
    dots_udf = matrix_dots_udf(centroids)
    probes = vec_stream.select(
        F.col(id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        dots_udf(F.col(vec_col)).alias("__qd"),
    ).select(
        "__qid",
        "__qvec",
        "__qn",
        F.explode(
            F.slice(
                F.transform(
                    F.array_sort(
                        _ranked_cells(n_centroids, centroids, F.col("__qd"))
                    ),
                    lambda s: s.getField("cid"),
                ),
                1,
                n_probe,
            )
        ).alias("__cell"),
    )
    sim = dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__qn") * F.col("__cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        probes.join(cells, "__cell")
        .withColumn("sim", sim)
        .filter(
            (F.col("sim") >= threshold) & (F.col("__qid") != F.col(id_col))
        )
        .select(
            F.col("__qid").alias(id_col),
            F.col(id_col).alias("matched_id"),
            "sim",
        )
    )
