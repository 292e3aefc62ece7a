"""Trained quality classifier: fit/score determinism, learnability on a
held-out split, bounded model size, and the deterministic Pareto keep rule
(operators/classifier.py — the CCNet/GPT-3 quality-filter stage)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.operators.classifier import (
    classifier_confusion,
    fit_token_classifier,
    pareto_keep_expr,
    pareto_select,
    score_with_classifier,
)

B = 64


def _corpus(spark):
    """Two token dialects: 'signal'-heavy positives, 'noise'-heavy
    negatives, shared filler — learnable but not separable by one token."""
    rows = []
    for i in range(120):
        pos = i % 2 == 0
        if pos:
            body = "signal beacon flare " * (2 + i % 3) + "filler common words"
        else:
            body = "noise static crackle " * (2 + i % 3) + "filler common words"
        rows.append((i, body, pos))
    return spark.createDataFrame(rows, "id bigint, text string, y boolean")


def test_model_bounded_and_scores_deterministic(spark):
    d = _corpus(spark)
    model = fit_token_classifier(d, "id", "text", "y", num_buckets=B)
    assert model.count() <= B
    s1 = score_with_classifier(d, model, "id", "text", num_buckets=B)
    a = sorted(map(tuple, s1.collect()))
    b = sorted(map(tuple, s1.collect()))
    assert a == b


def test_classifier_learns_heldout_split(spark):
    d = _corpus(spark)
    seed = d.filter(F.col("id") < 80)
    held = d.filter(F.col("id") >= 80)
    model = fit_token_classifier(seed, "id", "text", "y", num_buckets=B)
    scored = score_with_classifier(held, model, "id", "text", num_buckets=B)
    joined = scored.join(held.select("id", "y"), "id").collect()
    assert len(joined) == held.count()
    correct = sum(1 for r in joined if r["predicted"] == r["y"])
    # dialects are strongly separable; the fit must generalize cleanly
    assert correct == len(joined)
    # positives sit above the boundary, negatives below
    for r in joined:
        assert (r["score"] >= 1.0) == r["y"]


def test_unseen_tokens_score_neutral(spark):
    seed = spark.createDataFrame(
        [(0, "alpha alpha beta", True), (1, "gamma gamma delta", False)],
        "id bigint, text string, y boolean",
    )
    model = fit_token_classifier(seed, "id", "text", "y", num_buckets=B)
    # tokens chosen to land in buckets the seed never touched (md5 % 64:
    # seed -> {35,48,23,56}, these -> {15,17,19,18})
    novel = spark.createDataFrame(
        [(9, "utterly unseen novel words")], "id bigint, text string"
    )
    [row] = score_with_classifier(novel, model, "id", "text", num_buckets=B).collect()
    # every bucket coalesces to the neutral ratio -> exactly 1.0, boundary-kept
    assert row["score"] == pytest.approx(1.0)
    assert row["predicted"]


def test_confusion_counts_partition_heldout(spark):
    d = _corpus(spark)
    seed = d.filter(F.col("id") < 80)
    held = d.filter(F.col("id") >= 80)
    model = fit_token_classifier(seed, "id", "text", "y", num_buckets=B)
    scored = score_with_classifier(held, model, "id", "text", num_buckets=B)
    conf = classifier_confusion(scored, held, "id", "y").collect()
    assert sum(r["n_docs"] for r in conf) == held.count()
    assert len(conf) <= 4


def _py_hash31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF


def _py_pareto_keep(doc_id: int, score: float, shape: int = 9) -> bool:
    """Independent integer replay of the documented rule."""
    u = _py_hash31(str(doc_id)) % 1_000_000
    a = max(int(round((2.0 - score) * 1000.0)), 0)
    return (1_000_000 - u) * a**shape < 10 ** (6 + 3 * shape)


def test_pareto_rule_matches_python_replay(spark):
    rows = [(i, 0.5 + (i % 160) * 0.01) for i in range(320)]
    df = spark.createDataFrame(rows, "id bigint, score double")
    kept = {r["id"] for r in pareto_select(df, "id", "score").collect()}
    expect = {i for i, s in rows if _py_pareto_keep(i, s)}
    assert kept == expect
    # sanity on the probability shape: scores >= 2 always keep, low scores thin out
    assert all(i in kept for i, s in rows if s >= 2.0)
    lo = [i for i, s in rows if s <= 0.8]
    assert 0 < len([i for i in lo if i in kept]) < len(lo)


def test_pareto_acceptance_monotone_in_score(spark):
    # same ids at two score levels: anything kept at the lower score is
    # kept at the higher one (the rule is monotone given a fixed uniform)
    ids = list(range(500))
    low = spark.createDataFrame([(i, 0.7) for i in ids], "id bigint, score double")
    high = spark.createDataFrame([(i, 1.2) for i in ids], "id bigint, score double")
    kept_low = {r["id"] for r in pareto_select(low, "id", "score").collect()}
    kept_high = {r["id"] for r in pareto_select(high, "id", "score").collect()}
    assert kept_low <= kept_high
    assert len(kept_low) < len(kept_high)


def test_skewed_model_score_exact_no_int64_wrap(spark):
    # lam9 can reach ~2N*1e9 on a skewed seed (a bucket with zero negatives);
    # a bigint num9 accumulator would wrap silently.  Synthetic model with
    # every bucket at lam9 = 6e18: a 2-token doc sums to 1.2e19 > int64 max.
    lam = 6_000_000_000_000_000_000
    model = spark.createDataFrame([(k, lam) for k in range(B)], "k int, lam9 bigint")
    doc = spark.createDataFrame([(1, "two tokens")], "id bigint, text string")
    [row] = score_with_classifier(doc, model, "id", "text", num_buckets=B).collect()
    assert row["n_toks"] == 2
    # exact: (2 * 6e18) / 2 / 1e9 = 6e9 — wrap would give a negative score
    assert row["score"] == pytest.approx(6.0e9)
    assert row["predicted"]


def test_pareto_shape_validation(spark):
    with pytest.raises(ValueError, match="shape"):
        pareto_keep_expr("id", "score", shape=10)
