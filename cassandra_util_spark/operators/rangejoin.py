"""Range join: points ⨝ intervals on containment (lo <= p <= hi).

Without an equi-key Spark plans a pure inequality join as
BroadcastNestedLoop/Cartesian — O(points x intervals).  The scalable
formulation buckets the domain: every interval explodes to the buckets it
overlaps, every point hashes to its one bucket, and the join becomes an
equi-join on the bucket id followed by the exact containment filter.  Cost:
one shuffle on the bucket id; fan-out = interval span / bucket width, so pick
``bucket_width`` near the typical interval length.

Each (point, interval) pair meets in exactly one bucket (the point's), so no
dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
    extra_on: Column | None = None,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    Numeric domain (use epoch seconds/micros for time).  ``extra_on`` adds an
    equi/boolean condition evaluated with the containment (e.g. same tenant).
    ``how='inner'`` or ``'left'`` (unmatched points kept with null interval
    columns).
    """
    b = F.lit(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b))
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    cond = (
        (pt["__bucket"] == iv["__bucket"])
        & (pt[point_col] >= iv[lo_col])
        & (pt[point_col] <= iv[hi_col])
    )
    if extra_on is not None:
        cond = cond & extra_on
    joined = pt.join(iv, cond, how)
    return joined.drop(pt["__bucket"]).drop(iv["__bucket"])
