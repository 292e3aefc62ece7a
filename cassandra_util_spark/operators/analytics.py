"""Event-sequence analytics: ordered funnels and cohort retention.

Both are built from user-keyed partial aggregates — the shapes that stay
one-shuffle-per-stage at any event volume — with every comparison on exact
integer timestamps (epoch-µs / day indices), so results are reproducible
in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: Column,
    stages: list[str],
) -> DataFrame:
    """Ordered conversion funnel over arbitrary ``stages``: stage N counts
    users whose FIRST stage-N event is at-or-after their first stage-N-1
    event — the sequential dependency a flat per-type count gets wrong (a
    purchase before any view is not a conversion).

    ``ts_col`` must be an exact integer event time (epoch-µs).  Output:
    (stage, n_users), one row per stage, stage labels ``{i}_{name}``
    (1-based) so the rows sort in funnel order.

    Scale shape: each stage is one filter + user-keyed partial-min
    aggregate joined to the previous stage's frontier; frontiers only
    SHRINK stage over stage, so later joins are progressively cheaper.
    One user-keyed shuffle per stage.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    ev = df.select(
        F.col(user_col).alias("user"), F.col(type_col).alias("etype"), ts_col.alias("wt")
    )
    frontier: DataFrame | None = None
    out: DataFrame | None = None
    for i, name in enumerate(stages, start=1):
        cur = ev.filter(F.col("etype") == name)
        if frontier is None:
            frontier = cur.groupBy("user").agg(F.min("wt").alias("t"))
        else:
            frontier = (
                cur.join(frontier.select("user", F.col("t").alias("prev")), "user")
                .filter(F.col("wt") >= F.col("prev"))
                .groupBy("user")
                .agg(F.min("wt").alias("t"))
            )
        row = frontier.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(f"{i}_{name}").alias("stage"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: Column,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention table: users grouped by first-activity period,
    counted as active per (cohort_period, period_offset) — the table
    behind every retention curve.

    ``ts_col`` is an exact epoch-µs integer; periods are integer divisions
    (all values post-epoch, so truncate == floor in any engine).  One
    user-keyed aggregate assigns cohorts, one distinct bounds each user to
    one row per (cohort, offset), one counting aggregate emits the table —
    partial aggregation throughout, output bounded by cohorts × offsets.
    """
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    day_us = 86_400_000_000
    ev = df.select(
        F.col(user_col).alias("user"),
        (ts_col / F.lit(1)).cast("bigint").alias("wt"),
    ).select("user", F.expr(f"wt div {day_us}").alias("day"))
    first = ev.groupBy("user").agg(F.min("day").alias("d0"))
    activity = (
        ev.join(first, "user")
        .select(
            "user",
            F.expr(f"d0 div {period_days}").alias("cohort_period"),
            F.expr(f"(day - d0) div {period_days}").alias("period_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_period", "period_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


def activity_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    bucket: str = "hour",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-key activity anomalies: time buckets whose event count deviates
    ≥ ``z_threshold`` population standard deviations from that key's own
    mean — the burst/outage detector over any entity-keyed event stream.

    Determinism: the per-key moments come from EXACT integer aggregates
    (Σn, Σn², #buckets over the key's observed buckets), so mean, variance
    and every z-score are fixed double expressions over identical integers
    in any engine and any partitioning; no float sum ever crosses a shuffle.
    Keys with zero variance (perfectly uniform activity) produce no
    anomalies rather than a 0/0.

    Scale: two shuffles total — (key, bucket) count, then key moments; the
    moment table is |keys| rows and joins back by key (AQE broadcasts while
    small).  The z computation is map-only.

    Output: (key, bucket_start epoch-seconds, n_events, z 4dp) for
    anomalous buckets only.
    """
    counts = (
        events.select(
            F.col(key_col).alias("k"),
            F.date_trunc(bucket, F.col(ts_col)).alias("b"),
        )
        .groupBy("k", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    moments = counts.groupBy("k").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count(F.lit(1)).alias("h"),
    )
    mean = F.col("s1").cast("double") / F.col("h")
    var = F.col("s2").cast("double") / F.col("h") - mean * mean
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        counts.join(moments, "k")
        .filter((var > 0) & (F.abs(z) >= F.lit(z_threshold)))
        .select(
            F.col("k").alias(key_col),
            F.unix_timestamp("b").alias("bucket_start"),
            F.col("n").alias("n_events"),
            F.round(z, 4).alias("z"),
        )
    )
