"""Data-selection operators: hashed n-gram importance weighting (DSIR).

Implements the feature/weighting scheme of Data Selection via Importance
Resampling (Xie et al., NeurIPS 2023): documents are represented as counts
of word n-grams hashed into a fixed number of buckets; a document's
importance for a TARGET distribution (e.g. curated wiki/books text) relative
to the RAW crawl distribution is the likelihood ratio of its bucket counts
under the two fitted unigram-over-buckets models.  High-weight documents
"look like" the target domain and are preferentially selected.

Engine-exactness discipline (the tfidf_top_terms / commonness_score rule):
the textbook estimator is a sum of log-ratios, but libm logs are engine
specific at the last ulp.  The weight here is the LOG-FREE tf-weighted mean
of per-bucket likelihood ratios, each an all-integer rational with add-half
smoothing:

    lambda_k = ((2*t_k + 1) * (2*R + B)) / ((2*r_k + 1) * (2*T + B))
    weight   = ( sum_k c_k * round(lambda_k * 10^9) ) / n_grams / 10^9   (6dp)

t_k/r_k are target/raw bucket counts, T/R their totals, B the bucket count,
c_k the document's bucket counts.  Every input is an integer aggregate; the
per-bucket ratio is ONE double division, scaled to an integer by a
correctly-rounded double product and a half-away round (both identical in
any engine); products with c_k and their sum are EXACT bigint arithmetic —
order-free under any partitioning — so weights hash-match an independent
engine bit for bit after two final double divisions and a 6dp round.
(The ranking induced by the mean-ratio surrogate and the mean-log-ratio
differ only where ratios vary wildly within one document; both order "like
target" above "unlike target", which is the selection contract.)

Scale design (100 TB):
- the gram explode is map-only; bucket tables are bounded by ``num_buckets``
  (a config constant, default 256) regardless of corpus size — they
  BROADCAST by construction, unlike an unbounded vocabulary table;
- fitting = two groupBy(bucket) partial aggregates (target side is the
  small curated corpus; raw side is one pass over the big corpus);
- scoring = one shuffle on (id, bucket) with map-side partial counts, then
  a broadcast join against the B-row ratio table and a per-id sum.
- at extreme counts (2*R+B beyond ~2^62) move the two products to
  DECIMAL(38,0) before the division; the division and everything after is
  unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_util_spark.functions import portable_hash31
from cassandra_util_spark.operators.text import _norm_tokens


def hashed_gram_buckets(col: Column, n: int = 2, num_buckets: int = 256) -> Column:
    """Bucket ids (array<int>, WITH multiplicity) of the text's word
    ``n``-grams, hashed portably into ``num_buckets`` buckets.

    Multiplicity is the point — DSIR weights are tf-weighted, so repeated
    grams count repeatedly (word_shingles' array_distinct would flatten
    them).  The token array is let-bound through a single-element
    ``transform`` so normalize+split evaluates once per row (the
    word_shingles discipline; direct reference measured 12x slower there).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")

    def buckets_of(toks: Column) -> Column:
        count = F.size(toks) - F.lit(n - 1)
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(count, F.lit(1)) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
        grams = F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))
        return F.transform(
            grams, lambda g: F.pmod(portable_hash31(g), F.lit(num_buckets)).cast("int")
        )

    return F.transform(F.array(_norm_tokens(col)), buckets_of)[0]


def _bucket_counts(
    df: DataFrame, id_col: str, text_col: str, n: int, num_buckets: int
) -> DataFrame:
    """(id, k, c) — per-document hashed-gram bucket counts."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(hashed_gram_buckets(F.col(text_col), n, num_buckets)).alias("k"),
        )
        .groupBy("id", "k")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_buckets: int = 256,
) -> DataFrame:
    """Per-document DSIR importance weights of ``raw`` documents toward the
    ``target`` distribution: (id, n_grams, weight), one row per raw document
    with at least one word ``n``-gram.

    ``weight`` > 1 means the document's hashed-gram profile is more likely
    under the target model than under the raw model (select it); < 1 the
    opposite.  See the module docstring for the estimator and why it is
    log-free.  Selection policy is the caller's: threshold, top-k by
    weight, or Gumbel-noised resampling on top of these weights.
    """
    raw_c = _bucket_counts(raw, id_col, text_col, n, num_buckets)
    tgt_k = (
        _bucket_counts(target, id_col, text_col, n, num_buckets)
        .groupBy("k")
        .agg(F.sum("c").alias("t"))
    )
    # the raw per-doc table is the same aggregate the bucket fit needs —
    # materialize once, two consumers (fit + scoring join)
    raw_c = raw_c.localCheckpoint(eager=False)
    raw_k = raw_c.groupBy("k").agg(F.sum("c").alias("r"))

    # ratio table: one row per bucket hit by raw or target — at most B rows
    # by construction, so the driver-free outer join and the broadcast are
    # bounded by config, not data
    # totals named tot_r/tot_t: Spark resolution is case-insensitive, so
    # "R"/"T" would collide with the per-bucket r/t columns after the join.
    # COALESCE to 0: a target with no grams sums to NULL, which would NULL
    # every weight — the add-half smoothing is built to handle zero-count
    # distributions, so let it (hypothesis-found edge,
    # test_dsir_matches_reference_arithmetic)
    totals = (
        raw_k.agg(F.coalesce(F.sum("r"), F.lit(0)).alias("tot_r"))
        .crossJoin(tgt_k.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("tot_t")))
    )
    ratios = (
        raw_k.join(tgt_k, "k", "full_outer")
        .select(
            "k",
            F.coalesce(F.col("r"), F.lit(0)).alias("r"),
            F.coalesce(F.col("t"), F.lit(0)).alias("t"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "k",
            F.round(
                (
                    (F.lit(2) * F.col("t") + F.lit(1))
                    * (F.lit(2) * F.col("tot_r") + F.lit(num_buckets))
                ).cast("double")
                / (
                    (F.lit(2) * F.col("r") + F.lit(1))
                    * (F.lit(2) * F.col("tot_t") + F.lit(num_buckets))
                ).cast("double")
                * F.lit(1.0e9)
            )
            .cast("bigint")
            .alias("lam9"),
        )
    )
    return (
        raw_c.join(F.broadcast(ratios), "k")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("lam9")).alias("num9"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            F.round(
                F.col("num9").cast("double") / F.col("n_grams") / F.lit(1.0e9), 6
            ).alias("weight"),
        )
    )
