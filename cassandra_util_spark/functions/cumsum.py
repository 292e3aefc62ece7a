"""Distributed exact cumulative sum — the scale path for the engine's
global-order operations (token-budget cuts, global sequence packing).

A global running sum is the one windowed shape Spark cannot parallelize
declaratively: ``Window.orderBy(...)`` with no partition spec moves EVERY
row into one task.  The corpus planners tolerate that on bounded frames;
the token-budget cut and global packing do not — their frames are
corpus-sized.  This module implements the classic two-phase prefix sum as
a composition of DataFrame ops, exact for integer values:

1. BUCKET: ~equi-depth boundaries of the leading order column (ONE
   ``approx_percentile`` aggregate, collected once) turn the total order
   into N ordered buckets via a PURE expression — ``pid = #{boundaries <
   key}``.  Purity is the load-bearing property: an earlier draft used
   ``repartitionByRange`` + ``spark_partition_id()``, whose boundaries
   come from a nondeterministic sample, so the totals pass and the cumsum
   pass could disagree on partition assignment (~75% of rows came back
   wrong; caught by the bit-equality test) unless the layout was pinned
   with a localCheckpoint.  A pure bucket function needs no pinning, no
   checkpoint I/O, and one less full-data exchange.
2. LOCAL: per-bucket running sum (window partitioned by bucket — N
   independent groups, parallel across the cluster; its exchange is the
   ONE full-data shuffle).
3. OFFSET: per-bucket totals (≤ N rows — bounded by construction)
   collected, prefix-summed on the driver with exact Python integers, and
   broadcast back; ``cumsum = local + offset`` is map-side.

Determinism contract: ``order_cols`` must be a TOTAL order (include a
unique tiebreak).  The leading order column must be numeric/temporal
(``approx_percentile``'s domain) and non-null.  Rows with EQUAL leading
keys always land in the same bucket (strict ``<`` against boundaries), so
a heavily repeated leading key serializes its own rows within one bucket
— supply a higher-cardinality leading column if that is your shape.
Approximate boundaries only skew bucket SIZES, never correctness: the
bucket function is evaluated identically in both passes.  The INPUT plan
must be deterministic too (ADVICE r12): the three passes (boundary
aggregate, bucket totals, local cumsum) re-execute the input
independently, so a nondeterministic source — ``rand()``-based sampling,
a non-deterministic UDF, ``shuffle()`` — can make the passes disagree
and silently corrupt the running sum.  ``localCheckpoint()`` (or
persist) such an input first; the assembly pipeline call site does
exactly that.  Inputs whose plan carries an Exchange are pinned here
automatically (r18): the scale-adaptive partition probe would otherwise
execute those shuffle stages as a hidden extra pass (ADVICE r17), and
re-running a shuffle-bearing chain three times costs more at every
scale than reading one materialization.

Exactness: integer values sum exactly under any grouping, so the result
is bit-identical to the single-task global window (test-pinned).  For
doubles the per-bucket regrouping changes addition order; use decimals if
cross-run bit-equality of float sums matters.
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
    for the exclusive form).

    Precondition (module determinism contract): ``df``'s plan must be
    deterministic — it is executed three times (boundaries, totals, local
    pass) and a nondeterministic source would let them disagree.
    Defense in depth (ADVICE r12): when Catalyst flags the analyzed plan
    nondeterministic (rand-based sampling, a non-deterministic UDF), the
    input is pinned with an eager ``localCheckpoint`` here so the three
    passes read one materialization; deterministic inputs pay nothing."""
    if not order_cols:
        raise ValueError("order_cols must name a total order")
    try:
        flagged_nondet = not df._jdf.queryExecution().analyzed().deterministic()
    except Exception:
        # internal-API surface (py4j): if the accessor ever moves, fall
        # back to the documented caller contract rather than failing
        flagged_nondet = False
    if flagged_nondet:
        df = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    # Scale-adaptive bucket count (r17, guide §2: derive partitioning from
    # the input, not a constant): the input plan's own partition count —
    # AQE-coalesced upstream, so ∝ actual bytes — capped by the session
    # setting.  A bench-sized input gets 1 bucket (the boundary pass and
    # its full input scan are skipped entirely; the single local window IS
    # the whole sum), a production-sized input keeps production
    # parallelism.  Bucket count never changes values: integer sums are
    # exact under any grouping (test-pinned bit-equality).
    if num_partitions is None:
        try:
            shuffles_in_plan = "Exchange" in (
                df._jdf.queryExecution().sparkPlan().toString()
            )
        except Exception:  # internal-API surface — assume the worst
            shuffles_in_plan = True
        if shuffles_in_plan:
            # the partition probe below finalizes the adaptive plan, which
            # EXECUTES any upstream shuffle stages — a hidden fourth pass
            # of the input (ADVICE r17).  Pin such inputs instead: the
            # probe is then free and the three documented passes read one
            # materialization rather than re-executing the shuffle chain
            # three times — strictly less I/O at any scale.
            df = df.localCheckpoint(eager=True)
        n = max(
            1,
            min(
                int(spark.conf.get("spark.sql.shuffle.partitions")),
                df.rdd.getNumPartitions(),
            ),
        )
    else:
        n = num_partitions
    first = order_cols[0]
    order = [F.col(c).asc() for c in order_cols]

    # one aggregate pass; boundaries become literals, so the bucket id is a
    # pure function of the row and both downstream passes agree by
    # construction (n == 1: no boundaries to estimate — skip the pass)
    qs = [i / n for i in range(1, n)]
    if qs:
        bounds_row = df.agg(
            F.percentile_approx(F.col(first), F.array(*[F.lit(q) for q in qs]),
                                F.lit(10_000)).alias("b")
        ).collect()[0]["b"]
    else:
        bounds_row = []
    bounds = sorted(set(bounds_row)) if bounds_row else []
    # a NULL leading key would silently land in bucket 0 (NULL comparisons
    # drop out of the filter) and corrupt the order — fail loudly instead;
    # the total-order contract requires non-null keys
    key = F.when(
        F.col(first).isNull(),
        F.raise_error(
            F.lit(f"distributed_cumsum: NULL in leading order column "
                  f"{first!r} — the total order must be non-null")
        ).cast(df.schema[first].dataType),
    ).otherwise(F.col(first))
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b < key))
    else:
        pid = F.when(key.isNotNull(), F.lit(0))
    tagged = df.withColumn("__pid", pid)

    w = Window.partitionBy("__pid").orderBy(*order)
    local = tagged.withColumn("__local", F.sum(value_col).over(w))

    if not bounds:
        # single bucket: every row is in bucket 0 at offset 0 — the totals
        # pass (a full input scan + collect) carries no information (r17)
        offsets: dict = {0: 0}
    else:
        # ≤ N+1-row total table: bounded by construction, the same class of
        # driver collect as every rule/centroid table in this repo — and
        # Python ints are exact
        totals = {
            r["__pid"]: r["__t"]
            for r in tagged.groupBy("__pid")
            .agg(F.sum(value_col).alias("__t"))
            .collect()
        }
        offsets, acc = {}, 0
        for bucket in sorted(totals):
            offsets[bucket] = acc
            acc += totals[bucket] or 0
        if not offsets:
            return df.withColumn(out_col, F.col(value_col))  # empty input
    offset_df = spark.createDataFrame(
        [(b, off) for b, off in offsets.items()], "__pid int, __off bigint"
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


def apply_token_budgets(
    df: DataFrame,
    budgets: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    token_col: str,
    dominant_share: float = 0.5,
) -> DataFrame:
    """Execute a per-group token-budget plan: within each group, keep
    documents in ``order_cols`` order while the group's running token
    total BEFORE each document is under its budget (same crossing rule as
    :func:`token_budget_cut`, per group).  ``budgets`` is a tiny plan
    table — ``(group_col, budget)``, one row per group, e.g. the output
    of the temperature-mixture planner times a total token target — and
    is broadcast.  Groups absent from the plan contribute nothing
    (inner join): an unplanned source is excluded, not unlimited.

    This is the planner → executor link for mixture building: the
    advisory (`mixture_temperature_plan`) says WHAT share each source
    gets; this materializes WHICH documents that is, deterministically.

    Scale shape: one shuffle on the group key; per-group running sums
    parallelize across groups (the per-group window).  A single group
    holding most of the corpus would serialize its own running sum inside
    the grouped window, so the executor AUTO-ROUTES (VERDICT r12 task 3):
    any planned group holding ≥ ``dominant_share`` of the input rows —
    measured by a bounded one-row-per-group count aggregate, the same
    class of driver collect as the plan table itself — is cut from the
    grouped window and computed through :func:`distributed_cumsum` on its
    slice instead (two-phase prefix sum, no single-task stage), then
    union'd back.  Routing requires a numeric/temporal leading order
    column (``distributed_cumsum``'s bucket domain); other dtypes keep
    the grouped window with its documented serialization.  Results are
    bit-identical either way (exact integer sums under any grouping); for
    balanced mixture plans (tens to thousands of sources, no group at
    50%) nothing routes and the plan is unchanged.  Output: the kept rows
    plus ``cum_tokens`` and ``budget``; exact integers, replays
    bit-identically in SQL."""
    # the plan table's one-row-per-group contract is load-bearing: a
    # duplicate group row would fan every document of that group out
    # through the join and silently over-realize its share.  The table is
    # |groups| rows by construction, so collecting it is one cheap job —
    # and the collected values double as the routed groups' budget
    # literals below.
    plan_rows = budgets.collect()
    seen: dict = {}
    dup = []
    for r in plan_rows:
        g = r[group_col]
        if g in seen and len(dup) < 3:
            dup.append(g)
        seen[g] = r["budget"]
    if dup:
        raise ValueError(
            "apply_token_budgets: budgets must have exactly one row per "
            f"group; duplicated: {dup}"
        )

    out_cols = (
        [group_col]
        + [c for c in df.columns if c != group_col]
        + ["cum_tokens", "budget"]
    )

    # dominant-group detection: one bounded count aggregate (≤ |groups|
    # rows).  Only planned groups matter — unplanned ones are dropped by
    # the inner join regardless of size — and routing needs a bucketable
    # leading order key.
    first = order_cols[0]
    routable = str(df.schema[first].dataType.typeName()) in (
        "byte", "short", "integer", "long", "float", "double",
        "decimal", "date", "timestamp", "timestamp_ntz",
    )
    dominant: list = []
    if routable and plan_rows:
        counts = {
            r[group_col]: r["__n"]
            for r in df.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        }
        total = sum(counts.values())
        if total:
            dominant = [
                g
                for g, c in counts.items()
                if g in seen and c / total >= dominant_share
            ]

    rest = df
    if dominant:
        rest = df.filter(~F.col(group_col).isin(dominant))
    w = Window.partitionBy(group_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    cum = rest.withColumn("cum_tokens", F.sum(token_col).over(w))
    result = (
        cum.join(F.broadcast(budgets), group_col)
        .filter((F.col("cum_tokens") - F.col(token_col)) < F.col("budget"))
        .select(*out_cols)
    )
    budget_type = budgets.schema["budget"].dataType
    for g in dominant:
        routed = distributed_cumsum(
            df.filter(F.col(group_col) == g),
            order_cols,
            token_col,
            out_col="cum_tokens",
        ).withColumn("budget", F.lit(seen[g]).cast(budget_type))
        routed = routed.filter(
            (F.col("cum_tokens") - F.col(token_col)) < F.col("budget")
        ).select(*out_cols)
        result = result.unionByName(routed)
    return result
