"""cassandra_util_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of protectwise/cassandra-util.

The reference is a Cassandra toolkit (CQL statement DSL + a rule-driven
retention engine executed at compaction time).  This package re-expresses the
same capabilities Spark-first:

- ``core``       — keyed-table data model (partition/clustering keys, writetime)
- ``plans``      — rule model + compiler to Catalyst ``Column`` expressions;
                   safe statement builder (the cql-wrapper analog)
- ``operators``  — retention jobs (rule-based deletion / late-TTL), convictor
                   plugin registry, merges, dedup, similarity, text analysis
- ``sources``    — versioned parquet snapshot store with commit/backup protocol
- ``streaming``  — Structured Streaming ingestion + maintenance jobs

Design stance: everything that can be a DataFrame expression IS one — rules are
compiled to literal-folded predicates so retention is a map-only scan (no
shuffle, full predicate pushdown), which is what survives at 100 TB.
"""

__version__ = "0.1.0"

from cassandra_util_spark.core.table import KeyedTable, TableMeta

__all__ = ["KeyedTable", "TableMeta", "__version__"]
