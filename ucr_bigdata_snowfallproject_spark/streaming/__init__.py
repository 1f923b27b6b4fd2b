"""Structured Streaming layer (SURVEY §2.10)."""

from .events import (  # noqa: F401
    ewma_stream,
    latest_per_key_stream,
    read_event_stream,
    stream_dedup,
    stream_static_enrich,
    stream_stream_attribution,
    windowed_event_counts,
    windowed_histogram,
    windowed_percentiles,
    windowed_sessions,
)
