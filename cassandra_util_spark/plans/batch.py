"""Logical write batches — the CQLBatch analog (cql-wrapper
``CQLBatch.scala:16-336``).

A batch collects mutations client-side, then executes as Spark writes:

- **unlogged** batches split into sub-batches of ``max_batch_statements``
  and execute concurrently — here, splitting maps to partition-parallel
  writes; the knob is retained for API parity and bounded-memory staging;
- **logged** batches are never split and require single-partition atomicity —
  enforced at the API level (all rows share one partition key), matching the
  reference's guidance (cql-wrapper README: logged batches spanning
  partitions are an anti-pattern);
- **counter** batches merge increments additively before writing
  (``CQLBatch.scala:284-336``);
- ``USING TIMESTAMP`` becomes an explicit ``writetime`` column
  (``CQLTimestamp.scala:17-40``);
- token-aware routing (``groupByFirstReplica``) becomes repartition-by-
  partition-key so each task writes co-located data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import TableMeta


class BatchError(ValueError):
    pass


@dataclass
class WriteBatch:
    """A logical batch of row mutations against one keyed table."""

    meta: TableMeta
    kind: str = "unlogged"  # unlogged | logged | counter
    rows: list[dict[str, Any]] = field(default_factory=list)
    default_timestamp: Optional[int] = None  # writetime µs for rows lacking one

    # -- construction -------------------------------------------------------

    def add(self, *rows: dict[str, Any]) -> "WriteBatch":
        self.rows.extend(rows)
        return self

    def __add__(self, other: "WriteBatch") -> "WriteBatch":
        if other.meta != self.meta or other.kind != self.kind:
            raise BatchError("can only concatenate batches of the same table and kind")
        return WriteBatch(
            self.meta, self.kind, self.rows + other.rows, self.default_timestamp
        )

    def logged(self) -> "WriteBatch":
        return WriteBatch(self.meta, "logged", self.rows, self.default_timestamp)

    def unlogged(self) -> "WriteBatch":
        return WriteBatch(self.meta, "unlogged", self.rows, self.default_timestamp)

    def counter(self) -> "WriteBatch":
        return WriteBatch(self.meta, "counter", self.rows, self.default_timestamp)

    def using_timestamp(self, writetime_us: int) -> "WriteBatch":
        return WriteBatch(self.meta, self.kind, self.rows, writetime_us)

    # -- split semantics ----------------------------------------------------

    def grouped(self, max_statements: int) -> list["WriteBatch"]:
        """Unlogged/counter batches split into bounded sub-batches; logged
        batches never split (atomicity — ``CQLBatch.scala:243-267``)."""
        if self.kind == "logged":
            return [self]
        return [
            WriteBatch(self.meta, self.kind, self.rows[i : i + max_statements], self.default_timestamp)
            for i in range(0, len(self.rows), max_statements)
        ]

    def validate(self) -> None:
        if self.kind == "logged" and self.rows:
            pks = {tuple(r.get(k) for k in self.meta.partition_keys) for r in self.rows}
            if len(pks) > 1:
                raise BatchError(
                    "logged batch spans multiple partitions; logged atomicity "
                    "is only available within one partition"
                )

    # -- execution ----------------------------------------------------------

    def to_df(self, spark: SparkSession, schema: Optional[str] = None) -> DataFrame:
        self.validate()
        rows = self.rows
        if self.meta.writetime_col:
            wt = self.meta.writetime_col
            rows = [
                {**r, wt: r.get(wt, self.default_timestamp)}
                for r in rows
            ]
        df = spark.createDataFrame(rows, schema=schema) if schema else spark.createDataFrame(rows)
        return df

    def execute(
        self,
        spark: SparkSession,
        path: str,
        schema: Optional[str] = None,
        existing: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Apply the batch to a parquet target.

        unlogged/logged: append, repartitioned by partition key (token-aware
        routing analog).  counter: merge increments with the existing state
        (sum per primary key) and return the merged view.

        Counter-path atomicity caveat: the counter merge is a READ-MODIFY-
        WRITE — it overwrites ``path`` with the merged view, so two
        concurrent counter batches against the same path can lose one
        writer's increments, and a crash mid-overwrite can leave a partial
        directory.  The reference never has this problem because counter
        merges happen server-side per cell (Cassandra counter shards); here
        the deterministic single-writer discipline is the contract.  For a
        durable multi-writer counter table use
        :class:`cassandra_util_spark.operators.counters.CounterStore`:
        each batch appends an additive delta run (no read of existing
        state, nothing to lose), totals merge on read, and compaction
        folds deltas — the loss-free shape
        ``test_interleaved_counter_batches_lose_nothing`` pins against
        this path's demonstrated lost update.
        """
        df = self.to_df(spark, schema)
        if self.kind == "counter":
            if existing is None:
                merged = df
            else:
                merged = existing.unionByName(df, allowMissingColumns=True)
            keys = list(self.meta.primary_key)
            value_cols = [
                c for c in merged.columns
                if c not in keys and c != self.meta.writetime_col
            ]
            out = merged.groupBy(*keys).agg(
                *[F.sum(F.col(c).cast("decimal(28,6)")).cast("double").alias(c) for c in value_cols]
            )
            out.write.mode("overwrite").parquet(path)
            return out
        out = df.repartition(*[F.col(c) for c in self.meta.partition_keys])
        out.write.mode("append").parquet(path)
        return df
