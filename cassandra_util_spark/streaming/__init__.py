from cassandra_util_spark.streaming.events import (
    continuous_rollup,
    stream_events,
    streaming_dedup,
    streaming_retention,
    windowed_rollup,
)

__all__ = [
    "continuous_rollup",
    "stream_events",
    "streaming_dedup",
    "streaming_retention",
    "windowed_rollup",
]
