"""Trained quality classifier over hashed token features — the CCNet /
GPT-3 "quality filter" pipeline stage: fit a two-class model on a labeled
SEED corpus, score every document map-side against a bounded broadcast
model, and select with a deterministic Pareto-style acceptance rule.

This is the supervised counterpart of :mod:`selection` (DSIR): DSIR weighs
documents toward a target *distribution*; the classifier here is fit
class-vs-class on explicit labels (curated-vs-crawl in the papers; any
boolean column here) and produces a calibrated-enough score for hard
thresholding, top-k, or the stochastic Pareto keep rule GPT-3 used
(Brown et al., 2020, App. A: keep iff ``pareto(9) > 1 - score``).

Model form — hashed-bucket Naive Bayes likelihood ratio, log-free:

    lambda_k = ((2*p_k + 1) * (2*N + B)) / ((2*n_k + 1) * (2*P + B))
    score    = ( sum_k c_k * round(lambda_k * 10^9) ) / n_toks / 10^9  (6dp)

p_k/n_k are positive/negative seed bucket counts, P/N their totals, B the
bucket count, c_k the scored document's bucket counts.  The textbook NB
decision sums log-ratios; libm logs differ across engines at the last ulp,
so — exactly like DSIR (see selection.py's module docstring) — the score is
the tf-weighted MEAN of per-bucket ratios: one correctly-rounded double
division per bucket, integer-scaled, then exact bigint products and sums
under any partitioning.  ``score >= 1`` is the decision boundary (the
document's token profile is more positive-like than negative-like).

Scale design (100 TB):
- the model is at most ``num_buckets`` rows (config constant, default 512)
  — it broadcasts by construction, unlike a vocabulary table;
- fitting touches only the SEED (the small labeled corpus); the big corpus
  is never read during training;
- scoring is one shuffle on (id, bucket) with map-side partial counts plus
  a broadcast join and a per-id exact sum — no vocabulary-sized state;
- the Pareto keep rule is map-only ALL-INTEGER arithmetic on (id hash,
  3dp score): no RNG state, reproducible under retries/speculation, and
  replayable bit-for-bit by any engine.

Reference anchor: the reference keeps its per-row keep/drop decision in the
convictor interface (AbstractClusterDeletingConvictor.java:31-47 —
``shouldKeepPartition``/``shouldKeepAtom``); this module is the trained
statistical analogue of that boolean gate for corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_util_spark.functions import portable_hash31
from cassandra_util_spark.operators.selection import _bucket_counts


def fit_token_classifier(
    seed: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n: int = 1,
    num_buckets: int = 512,
) -> DataFrame:
    """Fit the hashed-bucket likelihood-ratio model on a labeled seed.

    ``label_col`` is boolean (true = positive class, e.g. "curated").
    Returns the bounded model table ``(k, lam9)`` — one row per bucket hit
    by either class (at most ``num_buckets``), ``lam9`` the positive/negative
    likelihood ratio scaled to ``round(lambda * 1e9)`` as bigint.  Buckets
    unseen in the seed score as the neutral smoothed ratio at scoring time
    (coalesced in :func:`score_with_classifier`), so out-of-vocabulary mass
    neither inflates nor deflates a document.
    """
    c = _bucket_counts(seed, id_col, text_col, n, num_buckets)
    # _bucket_counts keys by id only; re-join the label from the seed side
    # (the seed is the small labeled corpus — broadcast by assumption)
    lab = seed.select(F.col(id_col).alias("id"), F.col(label_col).alias("_y"))
    per_class = (
        c.join(F.broadcast(lab), "id")
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("_y"), F.col("c")).otherwise(F.lit(0))).alias("p"),
            F.sum(F.when(~F.col("_y"), F.col("c")).otherwise(F.lit(0))).alias("ng"),
        )
    )
    totals = per_class.agg(
        F.coalesce(F.sum("p"), F.lit(0)).alias("tot_p"),
        F.coalesce(F.sum("ng"), F.lit(0)).alias("tot_n"),
    )
    return per_class.crossJoin(F.broadcast(totals)).select(
        "k",
        F.round(
            (
                (F.lit(2) * F.col("p") + F.lit(1))
                * (F.lit(2) * F.col("tot_n") + F.lit(num_buckets))
            ).cast("double")
            / (
                (F.lit(2) * F.col("ng") + F.lit(1))
                * (F.lit(2) * F.col("tot_p") + F.lit(num_buckets))
            ).cast("double")
            * F.lit(1.0e9)
        )
        .cast("bigint")
        .alias("lam9"),
    )


def score_with_classifier(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 1,
    num_buckets: int = 512,
) -> DataFrame:
    """Score every document against a fitted model: ``(id, n_toks, score,
    predicted)``, one row per document with at least one token ``n``-gram.

    ``score`` is the tf-weighted mean likelihood ratio (6dp); ``predicted``
    is ``score >= 1.0``.  Buckets absent from the model take the neutral
    ratio 1.0 (lam9 = 1e9): the seed said nothing about them, so they pull
    the document toward the decision boundary rather than either class.
    The model join is an explicit broadcast — bounded by ``num_buckets``.
    """
    c = _bucket_counts(df, id_col, text_col, n, num_buckets)
    return (
        c.join(F.broadcast(model), "k", "left")
        .withColumn("lam9", F.coalesce(F.col("lam9"), F.lit(1_000_000_000)))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_toks"),
            # lam9 can reach ~2N*1e9 when a bucket has zero negatives in a
            # skewed seed; a bigint accumulator would wrap SILENTLY in
            # non-ANSI mode while the DuckDB oracle's HUGEINT fails loudly.
            # decimal(38,0) makes the sum exact on both engines (the per-row
            # product c*lam9 <= n_toks * 2(N+1)*1e9 << 1e38, and any sum
            # that somehow exceeded 38 digits nulls out loudly, not wraps).
            F.sum(
                (F.col("c").cast("decimal(19,0)") * F.col("lam9")).cast(
                    "decimal(38,0)"
                )
            ).alias("num9"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_toks",
            F.round(
                F.col("num9").cast("double") / F.col("n_toks") / F.lit(1.0e9), 6
            ).alias("score"),
            (
                F.col("num9") >= F.col("n_toks") * F.lit(1_000_000_000)
            ).alias("predicted"),
        )
    )


def classifier_confusion(
    scored: DataFrame,
    truth: DataFrame,
    id_col: str,
    label_col: str,
) -> DataFrame:
    """Held-out confusion counts: ``(predicted, actual, n_docs)``.

    ``scored`` is :func:`score_with_classifier` output over a held-out
    slice; ``truth`` carries the reference labels.  At most 4 rows out —
    the aggregate is exact and the join is on the id key only.
    """
    t = truth.select(F.col(id_col), F.col(label_col).alias("actual"))
    return (
        scored.join(t, id_col)
        .groupBy("predicted", "actual")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def pareto_keep_expr(id_col: str, score_col: str, shape: int = 9):
    """Deterministic replay of GPT-3's Pareto acceptance rule as ONE
    all-integer boolean expression: keep document i iff

        pareto_shape_sample(u_i) > 1 - score_i

    where ``u_i`` is a hash-derived uniform.  With the Pareto(shape) inverse
    CDF ``x = (1-u)^(-1/shape) - 1`` the rule rearranges (for score < 2) to

        (10^6 - U) * A^shape < 10^(6 + 3*shape)
        U = portable_hash31(id) % 10^6          (the uniform, 6dp integer)
        A = greatest(round((2 - score) * 10^3), 0)   (3dp integer)

    — no pow(), no log(), no RNG: every term is integer (DECIMAL(38,0) for
    the power — A <= 2000 so A^9 <= 5.2e29, exact), so the accept/reject
    set is identical across engines, retries, and partitionings, while the
    acceptance probability in ``score`` matches np.random.pareto(9) to 3dp
    of the score.  score >= 2 accepts always (A clamps to 0).
    """
    if not (1 <= shape <= 9):
        raise ValueError(f"shape must be in [1, 9] for exact DECIMAL(38,0) powers, got {shape}")
    u = F.pmod(portable_hash31(F.col(id_col).cast("string")), F.lit(1_000_000))
    a = F.greatest(
        F.round((F.lit(2.0) - F.col(score_col)) * F.lit(1000.0)).cast("bigint"),
        F.lit(0),
    ).cast("decimal(38,0)")
    a_pow = a
    for _ in range(shape - 1):
        a_pow = (a_pow * a).cast("decimal(38,0)")
    # 10^(6+3*shape) exceeds int64 for shape >= 9 — ship it as a string
    # literal and let the engine parse the exact decimal
    bound = F.lit(str(10 ** (6 + 3 * shape))).cast("decimal(38,0)")
    return ((F.lit(1_000_000) - u).cast("decimal(38,0)") * a_pow) < bound


def pareto_select(
    scored: DataFrame, id_col: str, score_col: str = "score", shape: int = 9
) -> DataFrame:
    """Filter ``scored`` to the documents the deterministic Pareto rule
    keeps (map-only; see :func:`pareto_keep_expr`)."""
    return scored.filter(pareto_keep_expr(id_col, score_col, shape))
