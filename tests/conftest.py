import pytest

from cassandra_util_spark.core.session import get_spark
from cassandra_util_spark.core.table import KeyedTable, TableMeta


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("cassandra-util-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture
def tenanted(spark):
    """Factory for the reference's `tenanted` fixture table:
    pk = (id, tenant), no clustering keys (testing.cql:119-128)."""

    def make(rows, with_writetime=False):
        if with_writetime:
            df = spark.createDataFrame(rows, "tenant bigint, id string, writetime bigint")
            meta = TableMeta(("id", "tenant"), (), "writetime")
        else:
            df = spark.createDataFrame(rows, "tenant bigint, id string")
            meta = TableMeta(("id", "tenant"))
        return KeyedTable(df, meta, "tenanted")

    return make


@pytest.fixture
def rules_df(spark):
    """Factory for the deletion_rules / deletion_rules_ttl fixture tables."""

    def make(rows, with_ttl=False):
        schema = "rulename string, column string, range struct<lo:string,hi:string>"
        if with_ttl:
            schema += ", ttl bigint"
        return spark.createDataFrame(rows, schema)

    return make


@pytest.fixture
def abcd(spark):
    """The 6-layout a,b,c,d matrix fixture (testing.cql:3-85): rows are the
    cross product a in 0..A-1, b in 0..B-1, c=100000+a, d=100000+b."""

    def make(partition_keys, clustering_keys, a=10, b=10):
        rows = [(x, y, 100000 + x, 100000 + y) for x in range(a) for y in range(b)]
        df = spark.createDataFrame(rows, "a int, b int, c int, d int")
        return KeyedTable(df, TableMeta(tuple(partition_keys), tuple(clustering_keys)), "abcd")

    return make
