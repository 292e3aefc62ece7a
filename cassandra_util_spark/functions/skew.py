"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles skewed *joins*; a skewed *aggregation* key
(one tenant owning half the table) still lands on one reducer.  The classic
fix: salt the key, pre-aggregate per (key, salt), then finish per key — two
small shuffles instead of one hot one.  Only valid for algebraic aggregates
(sum/count/min/max — anything with a merge function); the helper takes the
partial and final forms explicitly so misuse is visible.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partial_aggs``: name -> aggregate over raw rows (phase 1, per
    (keys, salt)).  ``final_aggs``: name -> aggregate over the phase-1
    columns (phase 2, per keys) — e.g. partial ``count(*) as n`` finalizes
    as ``sum(n) as n``.

    >>> salted_agg(df, ["tenant"],
    ...     {"n": F.count(F.lit(1)), "total": F.sum("v")},
    ...     {"n": F.sum("n"), "total": F.sum("total")})
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, expr in partial_aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )
