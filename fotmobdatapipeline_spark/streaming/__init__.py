from fotmobdatapipeline_spark.streaming.events import (
    read_events_stream,
    running_user_counts,
    session_aggregate,
    windowed_event_counts,
)

__all__ = [
    "read_events_stream",
    "running_user_counts",
    "session_aggregate",
    "windowed_event_counts",
]
