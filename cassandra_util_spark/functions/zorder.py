"""Z-order (Morton) interleaving for multi-dimensional data layout.

At 100 TB, parquet data-skipping prunes on per-row-group min/max statistics
— which only helps for columns the data is SORTED by.  A single-column sort
gives perfect pruning on that column and none on any other; Z-ORDERING the
layout (sort by the bit-interleave of several columns) gives partial but
simultaneous locality on EVERY interleaved dimension, so predicates on any
of them skip row groups (the Delta/Databricks OPTIMIZE ZORDER technique,
from Morton 1966).

The z-value is a pure integer expression — exact, engine-reproducible
(oracle-verifiable), and usable anywhere a sort key is: `repartitionByRange`
+ `sortWithinPartitions` before a parquet write, or a bucketed shard key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of each column — a bigint
    sort key with simultaneous locality in every input dimension.

    Inputs must be NON-NEGATIVE integers (rank, bucket, id, epoch-hour…);
    values ≥ 2^bits wrap into the same key space (callers wanting strict
    ordering on a dimension clamp or rank-normalize it first).  Dimension
    j's bit i lands at position ``i * n + j``: low-order bits of all
    dimensions cluster together, which is exactly what makes near rows in
    ANY dimension near in z-order.  ``n * bits`` must fit a signed 64-bit
    key (≤ 63).

    The unrolled bit expression is constant-folded per row inside codegen —
    no shuffle, no Python; the planner sees an ordinary deterministic
    bigint expression.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value needs at least 2 columns")
    if bits < 1 or n * bits > 63:
        raise ValueError(
            f"n_cols * bits must be in [2, 63], got {n} * {bits} = {n * bits}"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_value_sql(exprs: list[str], bits: int = 16) -> str:
    """DuckDB SQL computing exactly :func:`zorder_value` — generated from
    the same loop so the two cannot drift."""
    n = len(exprs)
    if n < 2 or bits < 1 or n * bits > 63:
        raise ValueError("n_cols * bits must be in [2, 63]")
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            terms.append(f"(((CAST({e} AS BIGINT) >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"
