from cassandra_util_spark.core.table import KeyedTable, TableMeta
from cassandra_util_spark.core.session import get_spark

__all__ = ["KeyedTable", "TableMeta", "get_spark"]
