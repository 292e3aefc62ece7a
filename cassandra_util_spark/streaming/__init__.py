from cassandra_util_spark.streaming.events import (
    stream_events,
    streaming_retention,
    windowed_rollup,
)

__all__ = ["stream_events", "streaming_retention", "windowed_rollup"]
