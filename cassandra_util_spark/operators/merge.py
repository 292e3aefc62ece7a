"""Merge operators: the compaction-merge semantics as DataFrame ops.

- last-write-wins across overlapping sorted runs (the reference's
  "handle overlapping keys" behavior, RuleBasedLateTTLConvictorSpec.scala:307-335)
- counter merge: increments combine additively on write
  (counter batches, CQLBatch.scala:284-336)

Scale notes: LWW is one shuffle on the primary key (minimum possible);
counter merge is a partial-aggregate (map-side combine) then one shuffle on
the group key — both scale linearly and AQE splits skewed keys.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import TableMeta


def lww_merge(
    df: DataFrame,
    primary_key: Sequence[str],
    writetime_col: str,
    tiebreak: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Newest writetime per key wins.  Cassandra breaks exact-timestamp ties
    by cell value (greater wins); pass ``tiebreak`` columns to get the same
    determinism — they order descending after writetime."""
    order = [F.col(writetime_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*primary_key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_snapshots(
    runs: Sequence[DataFrame],
    meta: TableMeta,
    tiebreak: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Union overlapping sorted runs and collapse to the LWW view — the
    compaction merge.  Spark's multi-file scan already parallelizes the
    union; the only cost is the key shuffle of the dedup window."""
    unioned = reduce(DataFrame.unionByName, runs)
    if meta.writetime_col is None:
        return unioned.dropDuplicates(list(meta.primary_key))
    return lww_merge(unioned, meta.primary_key, meta.writetime_col, tiebreak)


def counter_merge(
    df: DataFrame,
    keys: Sequence[str],
    counters: Sequence[str],
    exact: bool = True,
) -> DataFrame:
    """Merge counter increments: sum of deltas per key.

    ``exact=True`` sums in DECIMAL(28,6) — float summation is
    order-dependent and a 1000-executor plan must produce the same total
    every run (and match any external oracle)."""
    aggs = []
    for c in counters:
        col = F.col(c).cast("decimal(28,6)") if exact else F.col(c)
        aggs.append(F.sum(col).alias(f"{c}_total"))
    aggs.append(F.count(F.lit(1)).alias("merge_count"))
    return df.groupBy(*keys).agg(*aggs)
