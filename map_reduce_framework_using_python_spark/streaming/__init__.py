"""Structured Streaming surface (SURVEY.md §2.B streaming rows; pure
north-star extension — the reference is batch-only text MR).

Every windowed operator here is the streaming twin of a batch query in
``plans/events.py``; the pytest parity suite replays the ``events``
table through ``Trigger.AvailableNow`` and asserts the streaming result
equals the batch result (modulo watermark-dropped late rows).
"""

from map_reduce_framework_using_python_spark.streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
    session_window_counts,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "dedup_within_watermark",
    "read_events_stream",
    "run_available_now",
    "session_window_counts",
    "sliding_window_agg",
    "tumbling_window_agg",
]
