"""Semantic train/eval decontamination (operators/similarity.py): report
completeness, threshold flagging, rounded-score tie-breaks vs a plain
Python reference, and the map-side WindowGroupLimit plan pin (the 100 TB
property: shuffled rows ∝ |eval|, never ∝ |train|)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_util_spark.operators.similarity import semantic_decontamination


def _py_best(train, evals, digits=4):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return 0.0 if na * nb == 0 else d / (na * nb)

    out = {}
    for qid, qv in evals:
        best = min(
            ((-round(cos(qv, tv), digits), tid) for tid, tv in train),
        )
        out[qid] = (best[1], -best[0])
    return out

TRAIN = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [0.7, 0.7, 0.0]),
    (4, [0.0, 0.0, 0.0]),  # zero vector: cosine defined as 0
]
EVALS = [
    (100, [1.0, 0.05, 0.0]),   # near train 1 -> contaminated
    (101, [0.0, 0.0, 1.0]),    # orthogonal to everything -> clean
    (102, [0.5, 0.5, 0.0]),    # exactly along train 3
    (103, [0.0, 0.0, 0.0]),    # zero eval vector: all cosines 0
]


def test_report_matches_python_reference(spark):
    tr = spark.createDataFrame(TRAIN, "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(EVALS, "vec_id long, embedding array<float>")
    got = {
        r["eval_id"]: (r["best_train_id"], r["best_cosine"], r["contaminated"])
        for r in semantic_decontamination(
            tr, ev, threshold=0.9
        ).collect()
    }
    want = _py_best(TRAIN, EVALS)
    assert set(got) == {e[0] for e in EVALS}  # every eval row exactly once
    for qid, (tid, c) in want.items():
        assert got[qid][0] == tid, qid
        assert abs(got[qid][1] - c) < 1e-9, qid
        assert got[qid][2] == (c >= 0.9), qid
    # the zero eval vector ties every train row at 0 -> smallest id wins
    assert got[103] == (1, 0.0, False)


def test_null_vectors_excluded_both_sides(spark):
    """ADVICE r13: engines disagree on NULL-score ranking (Spark's
    when/otherwise folds a NULL norm product to 0.0, a SQL CASE leaves it
    NULL and ranks it last), so NULL-vector rows are excluded by
    construction — the report over an input WITH NULL rows must be
    byte-identical to the report over the same input without them."""
    tr_rows = TRAIN + [(9, None)]
    ev_rows = EVALS + [(109, None)]
    tr = spark.createDataFrame(tr_rows, "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(ev_rows, "vec_id long, embedding array<float>")
    got = sorted(
        tuple(r) for r in semantic_decontamination(tr, ev, threshold=0.9).collect()
    )
    clean = sorted(
        tuple(r)
        for r in semantic_decontamination(
            spark.createDataFrame(TRAIN, "vec_id long, embedding array<float>"),
            spark.createDataFrame(EVALS, "vec_id long, embedding array<float>"),
            threshold=0.9,
        ).collect()
    )
    assert got == clean
    assert all(r[0] != 109 and r[1] != 9 for r in got)


def test_empty_train_yields_empty_report(spark):
    tr = spark.createDataFrame([], "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(EVALS, "vec_id long, embedding array<float>")
    assert semantic_decontamination(tr, ev).count() == 0


def test_plan_is_map_side_group_limit_over_broadcast(spark):
    # rank-1 over the (eval_id)-keyed window must pre-prune map-side, and
    # the eval side must be the broadcast side of the join
    tr = spark.createDataFrame(TRAIN * 30, "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(EVALS, "vec_id long, embedding array<float>")
    out = semantic_decontamination(tr, ev)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        plan[:1500]
    )
