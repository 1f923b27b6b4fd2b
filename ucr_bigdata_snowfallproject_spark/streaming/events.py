"""Streaming operators over the events stream (SURVEY §2.10).

The reference is pure batch — its only temporal construct is the ArcGIS
TimeSlider over a published layer (map_tutorial.html:65-71) and the batch
latest-day snapshot (untitled.py:80). This module provides the streaming
twins, all built on Spark Structured Streaming built-ins:

- tumbling/sliding windowed aggregation with watermarked late-data drop —
  the streaming version of the monthly-median rollup (median →
  ``percentile_approx``: exact median is impossible in incremental
  execution; documented batch/stream divergence, SURVEY §7.4);
- ``dropDuplicatesWithinWatermark`` stateful dedup (X1's streaming face);
- latest-event-per-key via ``applyInPandasWithState`` — the P5 arg-max as
  a custom stateful operator (update-mode emission);
- per-key truncated EWMA via ``applyInPandasWithState`` (restart-safe
  bounded state, bit-identical to the batch windows.ewma_truncated);
- windowed fixed-bin histograms (the batch aggregates.histogram_fixed
  binning rule, incremental).

State stores are keyed by (key) or (key, window); watermarks bound state
size — both prerequisites for unbounded 100 TB/day streams.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: file-source schema for the events stream (ts already µs timestamp —
#: streaming fixtures are written by tests/driver from the batch table)
EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stream source over a directory of event parquet files
    (exactly-once file tracking; swap for Kafka at deploy with the same
    downstream graph)."""
    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling (or sliding, when ``slide`` is set) counts +
    sums per (window, event_type). Append-safe: emits once the watermark
    passes the window end; late rows beyond the watermark are dropped."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_percentiles(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    accuracy: int = 10000,
) -> DataFrame:
    """Streaming percentile sketch per window — the streaming stand-in for
    the batch group-median A1 (exact median is not incrementally
    computable; percentile_approx's sketch is mergeable, so state stays
    bounded — SURVEY §7.4)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.percentile_approx("value", 0.5, accuracy).alias("median_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "median_value", "n_events")
    )


def stream_dedup(
    events: DataFrame, keys: Iterable[str] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Stateful streaming dedup (X1 streaming face): drops duplicate keys
    arriving within the watermark horizon; state for a key expires once the
    watermark passes it (bounded state — the 100 TB/day requirement)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


_LATEST_STATE_SCHEMA = "ts timestamp, event_id long, value double"
_LATEST_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def latest_per_key_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """P5 latest-per-key as a custom stateful streaming operator
    (``applyInPandasWithState``): per user_id, keep the max-ts event seen
    so far and emit the current winner on every trigger (update-mode
    consumers read the latest snapshot).

    The reference's batch twin is the latest-day filter (untitled.py:80);
    this is its unbounded-stream generalization with per-key state and
    event-time ordering (processing-time arrival order does not matter).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts, event_id, value = state.get
        else:
            ts, event_id, value = None, None, None
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                r_ts = row.ts.to_pydatetime() if hasattr(row.ts, "to_pydatetime") else row.ts
                # (ts, event_id) lexicographic arg-max: deterministic under
                # any arrival order, matching the batch/SQL
                # row_number() ORDER BY ts DESC, event_id DESC
                if ts is None or (r_ts, int(row.event_id)) > (ts, event_id):
                    ts, event_id, value = r_ts, int(row.event_id), float(row.value)
        state.update((ts, event_id, value))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "ts": [ts],
                "event_id": [event_id],
                "value": [value],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_LATEST_OUTPUT_SCHEMA,
            stateStructType=_LATEST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Execute a streaming frame with trigger=availableNow into an
    in-memory table and return the materialized result (test/driver
    convenience — production sinks are parquet/Kafka via writeStream)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def windowed_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (dynamic-gap tumbling): per (user_id, session) counts
    and value sums, where a session closes after ``gap`` of inactivity —
    the streaming twin of operators.windows.sessionize. Watermark bounds
    open-session state; a session emits once the watermark passes its
    close (append mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def write_stream_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Production file sink: exactly-once parquet append via the streaming
    commit log (checkpointLocation). Restarts resume from the checkpoint —
    no duplicate files, no lost batches."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Stream-static join: enrich the event stream with a batch dimension
    (the streaming face of J1). The static side is broadcast and re-read
    per micro-batch — no state store involved, so it is watermark-free and
    works in append mode; the dimension can even change between batches
    (slowly-changing lookup)."""
    return events.join(F.broadcast(dim), on=on, how=how)


def stream_stream_attribution(
    events: DataFrame,
    trigger_type: str = "click",
    outcome_type: str = "purchase",
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition: each
    ``outcome_type`` event joins the ``trigger_type`` events of the same
    user in the preceding ``max_delay`` — the streaming twin of the batch
    as-of/attribution join.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store holds only ``watermark + max_delay`` of
    each side per key — the prerequisite for unbounded streams.
    """
    trig = (
        events.filter(F.col("event_type") == trigger_type)
        .select(
            F.col("user_id").alias("t_user"),
            F.col("ts").alias("t_ts"),
            F.col("event_id").alias("trigger_id"),
        )
        .withWatermark("t_ts", watermark)
    )
    out = (
        events.filter(F.col("event_type") == outcome_type)
        .select(
            F.col("user_id").alias("o_user"),
            F.col("ts").alias("o_ts"),
            F.col("event_id").alias("outcome_id"),
            F.col("value").alias("outcome_value"),
        )
        .withWatermark("o_ts", watermark)
    )
    return trig.join(
        out,
        (F.col("t_user") == F.col("o_user"))
        & (F.col("o_ts") >= F.col("t_ts"))
        & (F.col("o_ts") <= F.col("t_ts") + F.expr(f"INTERVAL {max_delay}")),
        "inner",
    ).select(
        F.col("t_user").alias("user_id"),
        "trigger_id",
        "outcome_id",
        F.col("t_ts").alias("trigger_ts"),
        F.col("o_ts").alias("outcome_ts"),
        "outcome_value",
    )


def stream_incremental_event_totals(
    event_stream: DataFrame,
    root: str,
    query_name: str = "incr_totals",
):
    """Streaming materialized rollup: maintain a per-user totals snapshot
    table — (user_id, n_events, sum_cents) — incrementally via
    ``table.merge_additive_agg`` in ``foreachBatch``. The 100 TB shape
    for "keep this aggregate fresh": each micro-batch shuffles only its
    own rows (one partial agg) and merges O(batch keys) into the table —
    on a bucketed snapshot, only touched key-buckets rewrite.

    EXACTLY-ONCE, not just at-least-once: additive merges are NOT
    idempotent, so each commit stamps its batch id as the version's
    commit note (atomic with the ``_latest`` flip). On checkpoint replay
    the applier sees the already-committed id and skips — a crash between
    data write and marker flip leaves the note uncommitted, so the replay
    correctly re-applies. Sums are integer cents (``round(value*100)``):
    exactly associative, so the converged table is bit-identical to a
    full recompute regardless of batching (pinned in tests).

    Returns the started StreamingQuery (caller awaits/stops)."""
    from .. import table as snapshot_table

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        note = snapshot_table.version_note(root)
        applied = int(note) if note is not None else -1
        if batch_id <= applied:
            return  # checkpoint replay of a committed batch
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("long")
            ).alias("sum_cents"),
        )
        snapshot_table.merge_additive_agg(
            batch_df.sparkSession, root, delta, "user_id",
            ["n_events", "sum_cents"], commit_note=str(batch_id),
        )

    return (
        event_stream.writeStream.foreachBatch(apply_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


_EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def ewma_stream(
    events: DataFrame,
    horizon: int = 8,
    scale: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """Streaming twin of ``operators.windows.ewma_truncated``: per user,
    every arriving event is emitted once (append mode) with its
    decay-1/2 truncated EWMA over the last ``horizon`` observations —
    per-key state is just the previous ``horizon−1`` quantized values
    (plus their null mask), so state size is O(keys · horizon) regardless
    of stream length.

    Determinism contract: within a micro-batch rows are sorted by
    (ts, event_id); ACROSS micro-batches the smoothing follows arrival
    order (the standard streaming-EWMA semantics). When per-key arrival
    is event-time-ordered — the replay/test fixture contract — the
    emitted values are bit-identical to the batch operator: the same
    shortest-decimal HALF_UP cent quantization (``decimal`` mirrors
    Spark's BigDecimal rounding, incl. negatives where ``floor(x+0.5)``
    differs), the same exact power-of-two integer sums, the same
    floor-half-up final rounding."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    p = float(10**round_digits)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, mask = state.get
            vals, mask = list(vals), list(mask)
        else:
            vals, mask = [], []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((vals, mask))
            return
        rows = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        out_ids: list[int] = []
        out_vals: list[float | None] = []
        for row in rows.itertuples(index=False):
            v = row.value
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(0)
                mask.append(False)
            else:
                cents = int(
                    Decimal(repr(float(v) * scale)).quantize(
                        Decimal(1), rounding=ROUND_HALF_UP
                    )
                )
                vals.append(cents)
                mask.append(True)
            num = den = 0
            recent = list(zip(vals[-horizon:], mask[-horizon:]))
            for i, (c, ok) in enumerate(reversed(recent)):
                if not ok:
                    continue
                w = 1 << (horizon - 1 - i)
                num += c * w
                den += w
            out_ids.append(int(row.event_id))
            out_vals.append(
                None
                if den == 0
                else math.floor(num / (den * float(scale)) * p + 0.5) / p
            )
        keep = horizon - 1
        state.update((vals[-keep:] if keep else [], mask[-keep:] if keep else []))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_ids),
                "event_id": out_ids,
                "ewma": out_vals,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_EWMA_OUTPUT_SCHEMA,
        stateStructType="vals array<bigint>, mask array<boolean>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_histogram(
    events: DataFrame,
    window: str = "1 hour",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 10,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming fixed-bin histogram per event-time window — the
    distribution monitor behind live drift/latency dashboards, using the
    SAME clamped width_bucket binning rule as the batch
    ``aggregates.histogram_fixed`` / ``psi_drift`` (fixed edges, so
    micro-batch results are comparable across time and engines; empty
    bins simply have no row in update mode — the batch twin's scaffold
    is a presentation concern a dashboard join supplies).

    Built-ins only: watermark → groupBy(window, bin) → count — fully
    incremental partial aggregation, state bounded by
    (windows in watermark horizon) × n_bins."""
    width = (hi - lo) / n_bins
    v = F.col(value_col)
    raw_bin = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int")
    bin_col = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(n_bins - 1))
    return (
        events.withWatermark("ts", watermark)
        .filter(v.isNotNull())
        .groupBy(F.window("ts", window).alias("w"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("lo_edge"),
            "n",
        )
    )


def windowed_approx_users(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "2 hours",
    rsd: float = 0.05,
) -> DataFrame:
    """Streaming distinct-user estimate per event-time window via
    ``approx_count_distinct`` (HyperLogLog++) — exact streaming DISTINCT
    needs unbounded per-window state (every seen id), while the sketch
    keeps O(1.04/rsd²) bytes per window and merges incrementally across
    micro-batches; the standard cardinality monitor. Batch twin: the same
    aggregate over the full input (sketches are deterministic for a given
    input SET, so stream == batch once windows close)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .select(F.col("w.start").alias("window_start"), "approx_users")
    )
