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

from cassandra_util_spark.functions.windows import constant_partition_key


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

    The salt hashes ALL columns (deterministic — no ``rand()``, so retries
    and speculative tasks agree), which means rows that are full duplicates
    share a salt bucket.  Real skewed data has varying non-key values, so
    the hot key still fans out; a pathological all-columns-identical corpus
    would not spread, and that trade (determinism over a degenerate case)
    is deliberate.
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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Equi-join with a salted key: the scale fallback when one left-side key
    dominates AND the right side is too big to broadcast, so both AQE paths
    (broadcast conversion, skew split on sorted-merge) are unavailable or
    insufficient.

    Left rows get a deterministic salt in [0, buckets); the right side is
    replicated ``buckets``x with every salt value, so each left row still
    matches its right rows exactly once and the hot key spreads over
    ``buckets`` reducers.  Cost: right side shuffles buckets-times its size —
    pick ``buckets`` ~= (hot-key rows / average-key rows), not "big".

    Supports ``inner`` and ``left`` joins (semantics preserved for both:
    replication multiplies matches per (key, salt), and each left row carries
    exactly one salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets))
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return lhs.join(rhs, list(on) + ["__salt"], how).drop("__salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Heavy-hitter diagnostic for a shuffle key: the ``top_k`` heaviest
    key values with their row counts and share of the table, ranked.

    The measurement that decides skew strategy BEFORE a job burns a day:
    a top key holding >1/shuffle-partitions of the rows will straggle any
    groupBy/join on that key — route it to :func:`salted_agg` /
    :func:`salted_join` or AQE skew-split; a flat report means plain
    hash partitioning is fine.

    One partial-aggregate shuffle over the key (combiner-reduced, so the
    exchange carries |distinct keys| rows, not the table), then a global
    top-k that Spark executes as TakeOrderedAndProject — per-partition
    heaps of k rows, never a full sort.  The denominator is the SUM of the
    same counts aggregate, cross-joined as one broadcast row, so the base
    table is declared once and Catalyst reuses the exchange rather than
    scanning twice.  Output is driver-safe at any scale: exactly
    ``top_k`` rows; ``share`` is one rounded division of two exact
    counts, so the report is engine-exact and oracle-friendly.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    from pyspark.sql import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("bigint").alias("__total"))
    top = (
        counts.orderBy(F.col("n").desc(), F.col(key_col).asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.partitionBy(constant_partition_key(F.col(key_col))).orderBy(
        F.col("n").desc(), F.col(key_col).asc()
    )
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.col(key_col),
        F.col("n"),
        F.round(F.col("n") / F.col("__total").cast("double"), 6).alias("share"),
    )
