"""Streaming curation: near-dup flagging of an arriving document stream
against a STATIC MinHash signature index (the streaming face of
``operators.dedup.incremental_minhash_dedup``).

The batch incremental form processes crawl batches; this is the same
index-probe shape as a continuous stream: per micro-batch, signatures
compute scan-side (Arrow UDF — streaming-safe, stateless), band hashes
explode, and a stream-static join probes the banded index. Corpus text is
never read; the only streamed state is Spark's file-source tracking.

Output contract: APPEND-mode, AT-LEAST-ONCE flags — a (doc, match) pair
that agrees in several bands emits once per agreeing band, and no
watermark/state is spent deduplicating them in-flight (a stateless
operator survives any stream volume). Consumers treat the flag stream as
a set: dedup downstream, or merge in ``foreachBatch`` where exactly-once
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.dedup import band_signatures, minhash_signatures_arrow

#: file-source schema for the documents stream (mirrors the fixture table)
DOCUMENT_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stream source over a directory of document parquet files
    (exactly-once file tracking; swap for Kafka at deploy)."""
    reader = spark.readStream.schema(DOCUMENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


#: shared with the batch incremental probe — the same banded layout is the
#: stored index format (operators.dedup.band_signatures)
_banded = band_signatures


def stream_near_dup_flags(
    doc_stream: DataFrame,
    seen_sigs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Flag streaming documents that are near-dups (MinHash Jaccard
    estimate ≥ ``threshold``) of the indexed corpus.

    Returns an append-mode stream of (doc_id, matched_id, jaccard_est) —
    at-least-once per matching pair (once per agreeing band; see module
    docstring). ``seen_sigs`` is the static (__id, __sig) index as
    produced by :func:`~..operators.dedup.minhash_signatures_arrow` and
    maintained by the batch pipeline; the stream side only ever computes
    O(batch) signature work and the join probes (band, bucket) — narrow
    keys, broadcast-able index shards."""
    sigs = minhash_signatures_arrow(
        doc_stream, "doc_id", "text", num_hashes, shingle_n
    )
    stream_b = _banded(sigs, "n", num_hashes, bands)
    static_b = _banded(seen_sigs, "s", num_hashes, bands)
    est = F.aggregate(
        F.zip_with("__sig_n", "__sig_s", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(num_hashes)
    return (
        stream_b.join(static_b, ["__band", "__bucket"])
        .withColumn("jaccard_est", est)
        .filter(F.col("jaccard_est") >= threshold)
        .select(
            F.col("__id_n").alias("doc_id"),
            F.col("__id_s").alias("matched_id"),
            "jaccard_est",
        )
    )


def stream_merge_into_snapshot(
    doc_stream: DataFrame,
    root: str,
    key: str = "doc_id",
    delete_col: str | None = None,
    query_name: str = "merge_apply",
):
    """Streaming CDC apply: every micro-batch MERGEs into a snapshot-
    versioned parquet table (``..table.merge_upsert``) via ``foreachBatch``
    — the upsert-sink pattern Structured Streaming uses where a sink needs
    transactional semantics the file sink can't give. Each batch commits
    one immutable table version; the ``_latest`` marker flip is the commit
    point, so a crash between batches never exposes partial state (the
    stream's checkpoint replays the batch; re-merging the same rows is
    idempotent because MERGE is keyed).

    Create the target with ``table.create_partitioned_snapshot`` for the
    100 TB shape: each micro-batch then rewrites only the key-buckets it
    touches (partition-level MERGE) instead of copy-on-writing the whole
    table per batch — ``merge_upsert`` dispatches on the table's layout
    automatically.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from .. import table as snapshot_table

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        snapshot_table.merge_upsert(
            batch_df.sparkSession, root, batch_df, key, delete_col=delete_col
        )

    return (
        doc_stream.writeStream.foreachBatch(apply_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
