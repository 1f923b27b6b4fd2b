"""Structured Streaming layer (SURVEY §2.10)."""

from .events import (  # noqa: F401
    latest_per_key_stream,
    read_event_stream,
    stream_dedup,
    windowed_event_counts,
    windowed_percentiles,
)
