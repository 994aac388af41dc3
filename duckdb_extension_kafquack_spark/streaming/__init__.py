"""Structured Streaming surface: event-time windows, watermarks, stateful ops."""

from . import state, windows  # noqa: F401  (registers streaming suite entries)

from .windows import (
    run_stream_to_table,
    session_window,
    sliding_window,
    stream_static_join,
    streaming_dedup,
    streaming_tumbling_window,
    tumbling_counts,
    tumbling_window,
)

__all__ = [
    "tumbling_counts",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "streaming_tumbling_window",
    "streaming_dedup",
    "stream_static_join",
    "run_stream_to_table",
]
