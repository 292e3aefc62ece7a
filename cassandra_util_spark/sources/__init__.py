from cassandra_util_spark.sources.snapshots import SnapshotStore

__all__ = ["SnapshotStore"]
