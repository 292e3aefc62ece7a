from cassandra_util_spark.streaming.events import (
    continuous_rollup,
    stream_events,
    streaming_dedup,
    streaming_retention,
    windowed_rollup,
)
from cassandra_util_spark.streaming.ingest import stream_to_runstore

__all__ = [
    "continuous_rollup",
    "stream_events",
    "streaming_dedup",
    "streaming_retention",
    "stream_to_runstore",
    "windowed_rollup",
]
