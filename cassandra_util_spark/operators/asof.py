"""As-of join — the classic time-series operator Spark's DataFrame API lacks
(pandas ``merge_asof`` / DuckDB ``ASOF JOIN``): for each left row, the single
right row with the greatest right timestamp <= the left timestamp, per key.

Implemented as the **union-and-carry** formulation rather than an inequality
join: tag both inputs, union them, and per key carry the latest right row
forward over the event-time order with ``last_value(ignoreNulls)``.  One
shuffle on (key), sort within partitions — the same cost as a sort-merge
join, but with NO range-condition fallback to broadcast-nested-loop, which is
what a naive ``l.ts >= r.ts`` join degenerates to.  Scales as a single
key-partitioned sort; skewed keys split by AQE.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at-or-before
    its timestamp (``strict=True``: strictly before).

    ``right_cols`` — right columns to carry (default: all non-key, non-ts).
    Right-side timestamp ties are resolved deterministically toward the
    largest carried tuple (struct ordering), matching a keyed dedup.
    """
    on = list(on)
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in on and c != right_ts]
    )

    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    rt = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.struct(F.col(right_ts).alias(f"{right_ts}{suffix}"), *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]).alias("__rv"),
    ).withColumn("__is_left", F.lit(0))

    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # order: time, then right-before-left at equal time (>= semantics) or
    # left-before-right (strict <); __rv tiebreak makes equal-ts right rows
    # collapse deterministically to the greatest value tuple
    side_order = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), side_order, F.col("__rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.withColumn("__carry", F.last(F.col("__rv"), ignorenulls=True).over(w))

    out = carried.filter(F.col("__is_left") == 1).drop("__t", "__is_left", "__rv")
    for i, c in enumerate([f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]):
        out = out.withColumn(c, F.col("__carry").getField(c))
    return out.drop("__carry")
