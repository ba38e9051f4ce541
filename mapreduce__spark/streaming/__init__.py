from mapreduce__spark.streaming.streams import (
    read_events_stream,
    stream_tumbling_counts,
    stream_sessionized,
    stream_dedup_first,
    stream_user_totals_stateful,
    stream_user_totals_tws,
    stream_static_join,
    stream_stream_interval_join,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream",
    "stream_tumbling_counts",
    "stream_sessionized",
    "stream_dedup_first",
    "stream_user_totals_stateful",
    "stream_user_totals_tws",
    "stream_static_join",
    "stream_stream_interval_join",
    "run_stream_to_memory",
]
