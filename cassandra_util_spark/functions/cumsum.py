"""Distributed exact cumulative sum — the scale path for the engine's
global-order operations (token-budget cuts, global sequence packing).

A global running sum is the one windowed shape Spark cannot parallelize
declaratively: ``Window.orderBy(...)`` with no partition spec moves EVERY
row into one task.  The corpus planners tolerate that on bounded frames;
the token-budget cut and global packing do not — their frames are
corpus-sized.  This module implements the classic two-phase prefix sum as
a composition of DataFrame ops, exact for integer values:

1. ``repartitionByRange`` on the total order + ``sortWithinPartitions`` —
   each of N partitions holds one contiguous, locally-sorted range;
2. a per-partition LOCAL cumsum (window partitioned by
   ``spark_partition_id()`` — N independent groups, parallel across the
   cluster);
3. per-partition totals (N rows — bounded by construction) collected,
   prefix-summed on the driver with exact Python integers, and broadcast
   back as each partition's OFFSET;
4. ``cumsum = local_cumsum + offset`` — map-side.

Cost: two full-data exchanges (the range shuffle, then the pid-hash
shuffle the window inserts because Catalyst cannot see that rows are
already pid-clustered) plus an N-row aggregate — versus the single-task
serialization of the naive global window.  At 100 TB the second exchange
is the price of staying JVM-side/whole-stage-codegen; an
``applyInPandas`` local cumsum would trade it for a full Arrow round
trip into Python.

Determinism contract: ``order_cols`` must be a TOTAL order (include a
unique tiebreak).  Range partitioning may split equal keys across
partition boundaries, so a non-total order would make the running sum
assignment nondeterministic between runs — the same rule every top-k in
this repo follows.

Exactness: integer values sum exactly under any grouping, so the result
is bit-identical to the single-task global window (test-pinned).  For
doubles the per-partition regrouping changes addition order; use
decimals if cross-run bit-equality of float sums matters.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Exact global running total of ``value_col`` under the total order
    ``order_cols``, with no single-task window.  Output: the input columns
    plus ``out_col`` (the INCLUSIVE running sum; subtract ``value_col``
    for the exclusive form)."""
    if not order_cols:
        raise ValueError("order_cols must name a total order")
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    order = [F.col(c).asc() for c in order_cols]

    # localCheckpoint PINS the range layout: repartitionByRange derives its
    # boundaries from a RANDOM sample, so two executions of the same lineage
    # can split the order at different rows — the totals pass and the cumsum
    # pass MUST observe the same __pid assignment or offsets are garbage
    # (measured: ~75% of rows off by one boundary's worth without this).
    # The same one-materialization-many-consumers pattern as the assembly
    # pipeline's gated-survivor checkpoint.
    ranged = (
        df.repartitionByRange(n, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # the window's exchange re-clusters by __pid: N parallel groups, never
    # a single global task
    w = Window.partitionBy("__pid").orderBy(*order)
    local = ranged.withColumn("__local", F.sum(value_col).over(w))

    # N-row total table: bounded by construction (≤ num_partitions rows),
    # so the driver-side prefix sum is the same class of collect as every
    # rule/centroid table in this repo — and Python ints are exact
    totals = {
        r["__pid"]: r["__t"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(value_col).alias("__t"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off bigint"
    )
    return (
        local.join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__pid", "__local", "__off")
    )


def token_budget_cut(
    df: DataFrame,
    order_cols: Sequence[str],
    token_col: str,
    budget: int,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Keep documents, in ``order_cols`` order, while the running token
    total BEFORE each document is under ``budget`` — the assembly
    pipeline's budget-cut semantics (``sum over preceding rows < budget``,
    so the document that crosses the line is the last one kept), computed
    with :func:`distributed_cumsum` instead of a single-task global
    window.  Output: the kept rows plus ``cum_tokens`` (inclusive running
    total) — deterministic under the total order, exact integers."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    cum = distributed_cumsum(
        df, order_cols, token_col, out_col="cum_tokens",
        num_partitions=num_partitions,
    )
    return cum.filter((F.col("cum_tokens") - F.col(token_col)) < budget)
