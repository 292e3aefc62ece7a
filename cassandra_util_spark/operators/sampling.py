"""Deterministic sampling and data mixing for training-corpus assembly.

Training pipelines need samples that are (a) reproducible run-to-run and
cluster-size-independent, (b) exact — auditable against an external engine,
and (c) map-only at 100 TB.  Spark's ``df.sample`` is none of these: it is
seeded per-partition, so the selected ROWS change with partitioning.

The primitive here is hash-gating: a row is in the sample iff a portable
32-bit hash of (seed, key) falls below ``fraction * 2^32``.  That decision
is a pure function of the row's key — no RNG state, no partition
dependence, no shuffle — and reproducible in any engine that has md5
(``functions.portable_hash32``).  Nested samples compose: the 10% sample
of the 50% sample is a fixed subset of both (hash < 0.1*2^32 implies
hash < 0.5*2^32), which gives free sample-size laddering.

``mixture_fractions`` solves the source-mixing problem: given per-source
row counts and target mixture weights, the largest total T satisfying
``w_s * T <= n_s`` for all sources is ``T = min(n_s / w_s)``; each source
then samples at ``w_s * T / n_s``.  The bottleneck source samples at 1.0
and everything else downsamples to match — no upsampling/duplication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_util_spark.functions import portable_hash32, portable_hash32_sql

_2_32 = 1 << 32


def sample_gate(key: Column, seed: str) -> Column:
    """Uniform [0, 2^32) gate value for (seed, key) — the decision hash."""
    return portable_hash32(F.concat(F.lit(seed), F.lit(":"), key.cast("string")))


def sample_gate_sql(key_expr: str, seed: str) -> str:
    """DuckDB SQL computing exactly :func:`sample_gate`."""
    return portable_hash32_sql(f"'{seed}:' || CAST({key_expr} AS VARCHAR)")


def gate_threshold(fraction: float) -> int:
    """The integer gate for a fraction — computed ONCE driver-side so both
    engines compare against the identical literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return int(round(fraction * _2_32))


def hash_sample(df: DataFrame, fraction: float, key_col: str, seed: str = "s1") -> DataFrame:
    """Deterministic ~``fraction`` sample keyed by ``key_col``.

    Map-only: the filter is a pure expression over the key, so it pushes
    into the scan stage and costs no shuffle at any scale.
    """
    return df.filter(sample_gate(F.col(key_col), seed) < F.lit(gate_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "s1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates).

    Strata absent from ``fractions`` sample at ``default_fraction``.
    Single map-only pass: the per-stratum threshold is a CASE expression,
    not a per-stratum job — one scan regardless of stratum count.
    """
    thr: Column = F.lit(gate_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(gate_threshold(frac))).otherwise(thr)
    return df.filter(sample_gate(F.col(key_col), seed) < thr)


def stratified_topk_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
    seed: str = "topk",
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (fewer if the stratum is smaller),
    chosen by hash order — a deterministic reservoir sample.

    Fraction-gating gives binomial sample sizes; eval-set construction and
    per-domain quotas need exact counts.  Ranking rows by the portable
    hash (ties broken by the key) makes the selection a pure function of
    the data: stable under repartitioning and incremental growth — a row
    only leaves the sample when a lower-hash row arrives in its stratum.

    One shuffle on the stratum (the window); for heavy strata Spark's
    WindowGroupLimit pushes the top-k before the exchange, so the shuffle
    carries ~k rows per stratum, not the stratum.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        sample_gate(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_fractions(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-source sampling fractions achieving the target mixture.

    The achievable total is limited by the scarcest source relative to its
    weight; that source is kept whole and the rest downsample.  Returns
    {source: fraction in (0, 1]} for every source in ``weights``.
    """
    if set(weights) - set(counts):
        raise ValueError(f"weights name unknown sources: {set(weights) - set(counts)}")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {s: w / wsum for s, w in weights.items() if w > 0}
    total = min(counts[s] / w for s, w in norm.items())
    return {s: (w * total) / counts[s] for s, w in norm.items()}


def stratified_repeat(
    df: DataFrame,
    strata_col: str,
    multiplicities: dict[str, float],
    key_col: str,
    seed: str = "rep",
) -> DataFrame:
    """Deterministic fractional UPSAMPLING: each row appears
    ``floor(m)`` times plus one more iff its hash gate clears ``frac(m)``
    — so a stratum with multiplicity 2.3 contributes every row twice and
    an exact, reproducible 30% of rows a third time.  Strata absent from
    ``multiplicities`` keep multiplicity 1.0.

    This is the epoch-mixing / temperature-resampling primitive (upweight
    scarce languages or high-quality sources across an epoch) that
    ``hash_sample`` (keep/drop only) cannot express.  Output adds a
    ``copy`` column (1..n) so downstream shuffles treat repeats as
    distinct rows.

    The per-stratum integer pair (base copies, extra-copy threshold) is
    computed driver-side, so both engines compare the same literals —
    no cross-engine float surface.  Map-side explode; no shuffle.
    """
    base: Column = F.lit(1)
    thr: Column = F.lit(0)
    for value, mult in sorted(multiplicities.items()):
        if mult < 0:
            raise ValueError(f"multiplicity must be >= 0, got {mult} for {value!r}")
        whole = int(mult)
        base = F.when(F.col(strata_col) == value, F.lit(whole)).otherwise(base)
        thr = F.when(
            F.col(strata_col) == value, F.lit(gate_threshold(mult - whole))
        ).otherwise(thr)
    n_copies = base + (sample_gate(F.col(key_col), seed) < thr).cast("int")
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1).cast("bigint"), n_copies.cast("bigint"))
    ).otherwise(F.array().cast("array<bigint>"))
    return df.withColumn("copy", F.explode(copies))


def deterministic_shards(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    seed: str = "shard",
) -> DataFrame:
    """Deterministic global corpus shuffle into ``num_shards`` training
    shards: each row gets a ``shard`` in [0, num_shards) and a ``pos``
    (1-based) within its shard, both pure functions of (seed, key).

    Training loaders need the corpus in a reproducible pseudo-random order
    that no sequential scan bias survives (sources are typically appended
    contiguously), yet a global ORDER BY over 100 TB is a full-range
    repartition + total sort.  Hash-order sharding avoids it: the shard is
    the low bits of a portable hash (so shard membership never changes with
    cluster size), and the within-shard order is an INDEPENDENT second hash
    word of the same md5 — one hash-partitioned shuffle with a per-shard
    sort, no global range exchange, no sampling-based skew estimation.
    Re-runs, repartitions, and engine swaps reproduce the identical
    (shard, pos) for every row; changing ``seed`` is a fresh epoch order.
    """
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    from pyspark.sql import Window

    gate = sample_gate(F.col(key_col), seed)
    order = portable_hash32(
        F.concat(F.lit(seed), F.lit(":"), F.col(key_col).cast("string")), offset=9
    )
    w = Window.partitionBy("shard").orderBy(F.col("__ord").asc(), F.col(key_col).asc())
    return (
        df.withColumn("shard", F.pmod(gate, F.lit(num_shards)).cast("int"))
        .withColumn("__ord", order)
        .withColumn("pos", F.row_number().over(w))
        .drop("__ord")
    )


def temperature_weights(counts: dict[str, int], alpha: float = 0.5) -> dict[str, float]:
    """Temperature-scaled mixture weights: w_s ∝ (n_s / N)^alpha.

    The multilingual/multi-source rebalancing rule (mT5/XLM-R style):
    alpha=1 keeps natural proportions, alpha=0 is uniform, and values in
    between upweight scarce sources without flattening the head.  Feed the
    result to :func:`mixture_fractions` / :func:`mixed_sample` to realize
    the mixture as deterministic per-source sampling rates.

    Driver-side math over one tiny dict (one entry per source) — the
    counts come from a partial-aggregate pass at any scale.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    total = sum(counts.values())
    if total <= 0:
        raise ValueError("counts must sum to a positive value")
    raw = {s: (n / total) ** alpha for s, n in counts.items() if n > 0}
    z = sum(raw.values())
    return {s: v / z for s, v in raw.items()}


def mixed_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: str = "mix",
) -> DataFrame:
    """Downsample each source so the result approximates the target mixture.

    Counts per source come from one aggregate pass (exact, not estimated);
    the sampling pass itself is map-only.  Two scans total — at warehouse
    scale the counts pass reads footer statistics / a catalog, not data.
    """
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fracs = mixture_fractions(counts, weights)
    return stratified_sample(df, source_col, fracs, key_col, seed, default_fraction=0.0)


def corpus_splits(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    partitioning the corpus into the named fractions — every row in
    exactly one split, membership a pure function of (seed, key).

    The eval-split contract a training pipeline needs: no row ever leaks
    between splits across re-runs, repartitions, cluster sizes, or engine
    swaps, and growing the corpus never moves an EXISTING row between
    splits (its gate value is fixed; only new keys land in new splits).
    Implemented as cumulative integer thresholds over the portable hash
    gate, computed driver-side in the given insertion order so both
    engines compare identical literals; the final split absorbs the
    rounding remainder, making the assignment exhaustive by construction.
    Map-only — the CASE folds into the scan at any scale.
    """
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    names = list(fractions)
    gate = sample_gate(F.col(key_col), seed)
    expr = F.lit(names[-1])  # last split absorbs rounding up to 2^32
    cum = 0.0
    bounds: list[tuple[str, int]] = []
    for name in names[:-1]:
        cum += fractions[name]
        bounds.append((name, gate_threshold(cum)))
    for name, thr in reversed(bounds):
        expr = F.when(gate < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
