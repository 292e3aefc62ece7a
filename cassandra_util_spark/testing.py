"""Test-harness helpers — the ccm-testing-helper analog.

The reference boots a config-driven CCM Cassandra cluster for its specs
(``CassandraSetup.scala:147-157``, ``CCM.scala:87-206``); the Spark engine's
"cluster" is a local SparkSession plus the driver-shipped fixture tables, so
the harness collapses to: build a session with test-sized knobs and register
the standard tables as temp views.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from cassandra_util_spark.core.session import get_spark

FIXTURE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def local_test_session(app_name: str = "cassandra-util-spark-test", cores: int = 4) -> SparkSession:
    """Small-footprint session for tests: few cores, few shuffle partitions
    (32-partition shuffles on 100-row fixtures are pure overhead)."""
    return get_spark(app_name, master=f"local[{cores}]", shuffle_partitions=cores)


def load_fixture_tables(
    spark: SparkSession,
    sf_dir: str = "/root/testdata/sf0.001",
    tables: tuple[str, ...] = FIXTURE_TABLES,
) -> dict[str, str]:
    """Register every fixture parquet as a temp view; returns {name: path}.
    Missing files are skipped (some scale factors omit tables)."""
    loaded: dict[str, str] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
            loaded[name] = path
    return loaded
