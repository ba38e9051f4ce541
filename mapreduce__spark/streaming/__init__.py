from mapreduce__spark.streaming.streams import (
    read_events_stream,
    stream_tumbling_counts,
    stream_sessionized,
    stream_dedup_first,
    stream_user_totals_stateful,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream",
    "stream_tumbling_counts",
    "stream_sessionized",
    "stream_dedup_first",
    "stream_user_totals_stateful",
    "run_stream_to_memory",
]
