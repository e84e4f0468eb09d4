"""Structured Streaming mirror of the batch event-window operators
(SURVEY.md §2 B10: the reference is batch-only; this is the declared
streaming extension over the `events` fixture)."""

from bdt_spark.streaming.windows import (
    merge_running_state,
    purchases_after_errors_stream,
    read_events_stream,
    read_running_state,
    running_max_stream_to_parquet,
    sessionized_stream,
    stateful_running_max,
    streaming_frequent_items,
    tumbling_counts_stream,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts_stream",
    "sessionized_stream",
    "stateful_running_max",
    "streaming_frequent_items",
    "running_max_stream_to_parquet",
    "merge_running_state",
    "read_running_state",
    "purchases_after_errors_stream",
]
