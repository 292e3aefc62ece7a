"""Window helpers.

One job for now: a constant partition key that actually survives Catalyst.
Several operators rank a frame that is ≤k rows BY CONSTRUCTION (global
top-k after ``orderBy().limit(k)``, quantiles over a bottom-k sketch) — a
single-partition window is the correct plan there, but an empty partition
spec makes WindowExec log its "No Partition Defined … serious performance
degradation" WARN on every execution, which buries real warnings in
oracle/test logs.  ``Window.partitionBy(F.lit(0))`` does NOT fix it on
Spark 4.x: the foldable literal is optimized out of the partition spec and
WindowExec still sees it empty (measured — the r10 treatment of
``sample_quantiles`` was a silent no-op).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def constant_partition_key(col) -> Column:
    """A non-foldable expression that evaluates to 0 for EVERY row.

    ``pmod(hash(col), 1)`` is 0 for any input type (``hash`` is
    non-nullable, anything mod 1 is 0) but references a real column, so
    constant folding cannot remove it from the window's partition spec —
    WindowExec gets a genuine (single-group) spec and stays quiet.  Use
    ONLY on frames bounded to ≤k rows by construction; the docstring of
    each call site states that invariant.  Cost: one hash per ranked row,
    k rows total.
    """
    return F.pmod(F.hash(col), F.lit(1))
