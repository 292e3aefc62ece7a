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

# magic-number dilation cascades (Morton "Part1By1"/"Part1By2"): place a
# k-bit value's bits every Nth position; valid only on the listed domains
_SPREAD_CASCADES = {
    2: ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)),
    3: ((16, 0xFF0000FF), (8, 0x0300F00F), (4, 0x030C30C3), (2, 0x09249249)),
}
_CASCADE_MAX_BITS = {2: 16, 3: 10}


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

    The expression is pure bigint arithmetic inside codegen — no shuffle,
    no Python; the planner sees an ordinary deterministic expression.  For
    the common arities (2 columns ≤ 16 bits, 3 columns ≤ 10 bits) the
    interleave uses the classic magic-number shift-mask dilation cascade —
    ~4 ops per column instead of one term per bit (round 6; values
    identical, pinned against the per-bit form and a Python reference by
    ``test_zorder_key_matches_reference_interleave``); other shapes keep
    the general unrolled per-bit form.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value needs at least 2 columns")
    if bits < 1 or n * bits > 63:
        raise ValueError(
            f"n_cols * bits must be in [2, 63], got {n} * {bits} = {n * bits}"
        )
    cascade = _SPREAD_CASCADES.get(n) if bits <= _CASCADE_MAX_BITS.get(n, 0) else None
    if cascade is not None:
        mask = (1 << bits) - 1  # the per-bit form reads only the low bits
        z = F.lit(0).cast("long")
        for j, c in enumerate(cols):
            spread = c.cast("long").bitwiseAND(F.lit(mask))
            for shift, m in cascade:
                spread = (spread.bitwiseOR(F.shiftleft(spread, shift))).bitwiseAND(
                    F.lit(m)
                )
            z = z.bitwiseOR(F.shiftleft(spread, j))
        return z
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
