"""Bucketed parquet tables: pre-shuffled storage for co-located joins.

The reference co-locates work by Cassandra token ownership (token-aware
batch grouping, ``CQLBatch.groupByFirstReplica`` — ``CQLBatch.scala:56-67``);
on files the same idea is hash-bucketed storage: both join sides written
with ``bucketBy(N, key)`` hash-partition rows into N files per directory,
so an equi-join on the bucket key needs NO exchange at read time — the
dominant shuffle of fact-to-fact joins disappears.

Scale notes:
- bucket count is a layout-time decision: pick N so one bucket of the LARGER
  table fits an executor core's working set (at 100 TB / 1024 buckets ≈
  100 GB per bucket — size N to the cluster, not the laptop);
- both sides must agree on (bucket column, N) — Spark only elides the
  exchange when the output partitioning matches the join's requirement;
- ``sortBy`` within buckets additionally elides the sort of a sort-merge
  join (files arrive pre-sorted), leaving a pure zipper merge;
- bucket pruning: an equality filter on the bucket column scans 1/N files
  (``SelectedBucketsCount`` in the scan node).

Only ``saveAsTable`` records bucketing in the catalog — plain
``.parquet(path)`` writes silently drop the bucket spec, which is why this
module insists on table names (external tables when ``path`` is given).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table registered in the catalog.

    ``path`` makes it an external table (data at ``path``, metadata in the
    catalog) — use this in tests/ephemeral runs; omit for managed tables in
    the warehouse dir.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching (bucket column, bucket count) on both sides the planner
    emits a sort-merge join with NO Exchange under either side; assert that
    with :func:`join_is_colocated` in tests/CI rather than trusting layout
    drift."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def join_is_colocated(df: DataFrame) -> bool:
    """True iff the physical plan contains a join with no shuffle exchange
    beneath it (broadcast exchanges don't count as shuffles)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan


def selected_buckets(df: DataFrame) -> Optional[tuple[int, int]]:
    """(selected, total) bucket counts from the scan node when bucket pruning
    kicked in, else None — the observable for 1/N scan elision.

    Note: ``spark.sql.sources.bucketing.autoBucketedScan.enabled`` (default
    true) strips bucket layout from scans that elide no exchange, which also
    forfeits pruning on plain key-equality filters; disable it around
    point-lookup-heavy workloads."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    return (int(m.group(1)), int(m.group(2))) if m else None
