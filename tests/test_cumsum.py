"""Distributed exact cumsum / token-budget cut (the scale path for the
engine's global-order operations).

Pins: bit-equality with the single-task global window on integers, the
no-global-window plan property, partition-count invariance, the budget
cut's crossing-document semantics, and the bounded driver collect."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_util_spark.functions.cumsum import (
    distributed_cumsum,
    token_budget_cut,
)


def _toy(spark, n=5000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.hash(F.col("id")), F.lit(997)) + F.lit(1)).alias("toks"),
    )


def test_matches_single_task_global_window_exactly(spark):
    df = _toy(spark)
    got = {
        r["doc_id"]: r["cumsum"]
        for r in distributed_cumsum(df, ["doc_id"], "toks").collect()
    }
    w = Window.orderBy(F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["want"]
        for r in df.withColumn("want", F.sum("toks").over(w)).collect()
    }
    assert got == want and len(got) == 5000


def test_partition_count_invariance(spark):
    df = _toy(spark, 2000)
    a = {r["doc_id"]: r["cumsum"]
         for r in distributed_cumsum(df, ["doc_id"], "toks",
                                     num_partitions=3).collect()}
    b = {r["doc_id"]: r["cumsum"]
         for r in distributed_cumsum(df, ["doc_id"], "toks",
                                     num_partitions=17).collect()}
    assert a == b


def test_plan_has_no_single_task_global_window(spark):
    """The reason this module exists: the window in the plan must be
    partitioned (by __pid), never a no-partition-spec global sort."""
    df = _toy(spark, 100)
    plan = (
        distributed_cumsum(df, ["doc_id"], "toks")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Spark renders an unpartitioned window's exchange as
    # SinglePartition; the pid window hashes instead
    assert "SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(__pid" in plan, plan[:2000]


def test_budget_cut_keeps_the_crossing_document(spark):
    """sum-before < budget: the document that crosses the budget line is
    the LAST one kept (assembly semantics), and everything after it is
    cut."""
    rows = [(1, 10), (2, 10), (3, 10), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    kept = sorted(
        r["doc_id"]
        for r in token_budget_cut(df, ["doc_id"], "toks", budget=25).collect()
    )
    # cum before: doc1=0, doc2=10, doc3=20 (<25, kept, crosses), doc4=30
    assert kept == [1, 2, 3]
    # budget 0 keeps nothing; negative raises
    assert token_budget_cut(df, ["doc_id"], "toks", budget=0).count() == 0
    with pytest.raises(ValueError, match="non-negative"):
        token_budget_cut(df, ["doc_id"], "toks", budget=-1)
    with pytest.raises(ValueError, match="total order"):
        distributed_cumsum(df, [], "toks")


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, toks long")
    assert distributed_cumsum(df, ["doc_id"], "toks").count() == 0
    assert token_budget_cut(df, ["doc_id"], "toks", budget=10).count() == 0


def test_single_bucket_fast_path_bit_exact(spark):
    """r17: a single-partition input derives n=1 — the boundary/totals
    passes are skipped — and the result must still be bit-identical to
    the single-task global window (and the empty input must keep its
    schema through the same path)."""
    df = _toy(spark, 1500).coalesce(1).localCheckpoint()
    assert df.rdd.getNumPartitions() == 1
    got = {
        r["doc_id"]: r["cumsum"]
        for r in distributed_cumsum(df, ["doc_id"], "toks").collect()
    }
    w = Window.orderBy(F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["want"]
        for r in df.withColumn("want", F.sum("toks").over(w)).collect()
    }
    assert got == want and len(got) == 1500
    empty = (
        spark.createDataFrame([], "doc_id long, toks long")
        .coalesce(1)
        .localCheckpoint()
    )
    out = distributed_cumsum(empty, ["doc_id"], "toks")
    assert out.count() == 0
    assert out.columns == ["doc_id", "toks", "cumsum"]


def test_pack_sequences_distributed_matches_global_window(spark):
    """pack_sequences(distributed=True): the two-phase prefix sum yields
    bit-identical bins/offsets to the single-task global window it
    replaces, and rejects the shard_col combination (per-shard windows
    already parallelize)."""
    from cassandra_util_spark.operators.packing import pack_sequences

    df = _toy(spark, 3000).withColumnRenamed("toks", "n_tok")
    want = {
        r["doc_id"]: (r["bin"], r["bin_offset"])
        for r in pack_sequences(df, "doc_id", "n_tok", capacity=4096).collect()
    }
    got = {
        r["doc_id"]: (r["bin"], r["bin_offset"])
        for r in pack_sequences(
            df, "doc_id", "n_tok", capacity=4096, distributed=True
        ).collect()
    }
    assert got == want and len(got) == 3000
    with pytest.raises(ValueError, match="GLOBAL-stream"):
        pack_sequences(
            df.withColumn("shard", F.lit(1)), "doc_id", "n_tok",
            capacity=4096, shard_col="shard", distributed=True,
        )


def test_nondeterministic_input_is_pinned(spark):
    """ADVICE r12 defense in depth: a rand-based input plan is executed
    three times (boundaries, totals, local pass); without pinning, the
    passes can disagree on values and silently corrupt the running sum
    (historically ~75% of rows wrong under repartitionByRange).  The
    guard localCheckpoints a Catalyst-flagged nondeterministic input, so
    the running-sum recurrence must hold exactly over the output."""
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.rand(7) * 100).cast("long").alias("v"),
    )
    rows = sorted(
        (r["k"], r["v"], r["cumsum"])
        for r in distributed_cumsum(df, ["k"], "v", num_partitions=7).collect()
    )
    assert len(rows) == 2000
    acc = 0
    for _, v, c in rows:
        acc += v
        assert c == acc  # totals pass and local pass agreed on every row


def test_null_order_key_fails_loudly(spark):
    """A NULL leading key would silently land in bucket 0 and corrupt the
    order — the total-order contract requires non-null keys, enforced at
    eval."""
    df = spark.createDataFrame([(1, 5), (None, 7)], "doc_id long, toks long")
    with pytest.raises(Exception, match="NULL in leading order"):
        distributed_cumsum(df, ["doc_id"], "toks").collect()


@pytest.mark.slow
def test_cumsum_property_random_values(spark):
    """Hypothesis sweep: random (possibly negative) values and random key
    spacings match a plain Python prefix sum exactly — bucket-boundary
    placement can never change an integer sum."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-(10**6), max_value=10**6),
            min_size=1, max_size=80,
        ),
        gap=st.integers(min_value=1, max_value=1000),
        parts=st.sampled_from([2, 5, 13]),
    )
    def check(vals, gap, parts):
        rows = [(i * gap, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r["k"]: r["cumsum"]
            for r in distributed_cumsum(
                df, ["k"], "v", num_partitions=parts
            ).collect()
        }
        acc, want = 0, {}
        for k, v in rows:
            acc += v
            want[k] = acc
        assert got == want

    check()


def test_apply_token_budgets_per_group_semantics(spark):
    """Per-group budget execution: each group's crossing document is its
    last kept; unplanned groups are EXCLUDED (inner join), not unlimited;
    a zero budget keeps nothing from its group."""
    from cassandra_util_spark.functions.cumsum import apply_token_budgets

    rows = [
        ("a", 1, 10), ("a", 2, 10), ("a", 3, 10),
        ("b", 1, 5), ("b", 2, 5),
        ("c", 1, 7),  # no budget row -> excluded
        ("d", 1, 3),  # zero budget -> excluded
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, toks long")
    budgets = spark.createDataFrame(
        [("a", 15), ("b", 100), ("d", 0)], "src string, budget long"
    )
    kept = sorted(
        (r["src"], r["doc_id"])
        for r in apply_token_budgets(df, budgets, "src", ["doc_id"], "toks").collect()
    )
    # a: cum-before 0,10 (<15) keep docs 1,2; doc3 cum-before 20 cut
    # b: all kept; c: unplanned; d: zero budget
    assert kept == [("a", 1), ("a", 2), ("b", 1), ("b", 2)]


def test_apply_token_budgets_plans_broadcast_and_group_parallel(spark):
    from cassandra_util_spark.functions.cumsum import apply_token_budgets

    df = spark.createDataFrame(
        [("a", i, 5) for i in range(50)], "src string, doc_id long, toks long"
    )
    budgets = spark.createDataFrame([("a", 100)], "src string, budget long")
    plan = (
        apply_token_budgets(df, budgets, "src", ["doc_id"], "toks")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SinglePartition" not in plan, plan[:1500]


def test_apply_token_budgets_routes_dominant_group(spark):
    """VERDICT r12 task 3: a single group holding most of the corpus must
    not serialize its own running sum in the grouped window — the
    executor detects it (row share ≥ dominant_share) and routes its slice
    through the two-phase distributed_cumsum, union'd back.  Pins: under
    a 95%-one-group fixture the executed plan contains the __pid-bucketed
    window (the distributed path) and excludes the dominant group from
    the grouped window; results are bit-identical to the plain
    Python per-group prefix-sum reference; and the output includes
    cum_tokens + budget for routed rows exactly as for grouped ones."""
    from cassandra_util_spark.functions.cumsum import apply_token_budgets

    rows = [("big", i, 7) for i in range(95)] + [
        ("small", i, 7) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, toks long")
    budgets = spark.createDataFrame(
        [("big", 300), ("small", 20)], "src string, budget long"
    )
    out = apply_token_budgets(df, budgets, "src", ["doc_id"], "toks")

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__pid" in plan, plan[:2500]
    assert "SinglePartition" not in plan, plan[:2500]
    # the dominant group is cut from the grouped window's input
    assert "big" in plan and ("NOT" in plan or "isnotnull" in plan), plan[:2500]

    got = sorted(
        (r["src"], r["doc_id"], r["cum_tokens"], r["budget"])
        for r in out.collect()
    )
    want, run = [], {}
    lim = {"big": 300, "small": 20}
    for g, i, t in sorted(rows, key=lambda r: (r[0], r[1])):
        before = run.get(g, 0)
        run[g] = before + t
        if before < lim[g]:
            want.append((g, i, before + t, lim[g]))
    assert got == sorted(want)

    # a balanced plan routes nothing: the grouped-window plan is unchanged
    bal = spark.createDataFrame(
        [(g, i, 3) for g in ("a", "b", "c") for i in range(33)],
        "src string, doc_id long, toks long",
    )
    bal_plan = (
        apply_token_budgets(
            bal,
            spark.createDataFrame(
                [("a", 50), ("b", 50), ("c", 50)], "src string, budget long"
            ),
            "src", ["doc_id"], "toks",
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(__pid" not in bal_plan, bal_plan[:2000]

    # a non-bucketable (string) leading order key keeps the grouped window
    s = df.withColumn("doc_id", F.col("doc_id").cast("string"))
    s_plan = (
        apply_token_budgets(s, budgets, "src", ["doc_id"], "toks")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(__pid" not in s_plan, s_plan[:2000]


def test_apply_token_budgets_rejects_duplicate_plan_rows(spark):
    """r12 review: a duplicate group row in the plan table would fan the
    group's documents out through the join and silently over-realize its
    share — the one-row-per-group contract is enforced, not assumed."""
    from cassandra_util_spark.functions.cumsum import apply_token_budgets

    df = spark.createDataFrame([("a", 1, 5)], "src string, doc_id long, toks long")
    budgets = spark.createDataFrame(
        [("a", 10), ("a", 20)], "src string, budget long"
    )
    with pytest.raises(ValueError, match="one row per"):
        apply_token_budgets(df, budgets, "src", ["doc_id"], "toks")


@pytest.mark.slow
def test_apply_token_budgets_property_matches_python_reference(spark):
    """Hypothesis sweep: random groups, token lists, and budgets match a
    plain per-group Python prefix-sum cut exactly — the join/window
    composition introduces no group crosstalk at any shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_util_spark.functions.cumsum import apply_token_budgets

    @settings(max_examples=10, deadline=None)
    @given(
        data=st.lists(
            st.tuples(
                st.sampled_from(["g0", "g1", "g2", "g3"]),
                st.integers(min_value=1, max_value=200),
            ),
            min_size=1, max_size=60,
        ),
        budgets=st.fixed_dictionaries({
            "g0": st.integers(min_value=0, max_value=2000),
            "g1": st.integers(min_value=0, max_value=2000),
            "g2": st.integers(min_value=0, max_value=2000),
        }),
    )
    def check(data, budgets):
        rows = [(g, i, t) for i, (g, t) in enumerate(data)]
        df = spark.createDataFrame(rows, "src string, doc_id long, toks long")
        bdf = spark.createDataFrame(
            list(budgets.items()), "src string, budget long"
        )
        got = sorted(
            (r["src"], r["doc_id"])
            for r in apply_token_budgets(
                df, bdf, "src", ["doc_id"], "toks"
            ).collect()
        )
        want, run = [], {}
        for g, i, t in sorted(rows, key=lambda r: r[1]):
            if g not in budgets:
                continue  # unplanned group: excluded ("g3")
            before = run.get(g, 0)
            if before < budgets[g]:
                want.append((g, i))
            run[g] = before + t
        assert got == sorted(want)

    check()
