"""Text-analysis operators for training-data pipelines.

Everything here is built-in-function expressions (JVM/codegen, no Python in
the hot path) — at 100 TB these run as map-only passes over the documents
table with full column pruning: the scan reads only (id, text).

Operators: normalization, tokenization, token counting (whitespace + BPE-ish
estimate), document fingerprinting, quality scoring, and n-gram/stopword
language ID.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small marker-stopword sets per language; ordered precedence for ties
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "y", "es", "una"),
}

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for")


def normalize_text(col: Column) -> Column:
    """lowercase, strip non-alphanumerics, collapse runs of spaces, trim —
    the canonical form used for fingerprinting and shingling."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """non-empty whitespace tokens of the raw text."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def whitespace_token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_estimate(col: Column) -> Column:
    """BPE-ish token-count estimate: ~4 chars/token (the industry rule of
    thumb); an upper bound mixing word and char signals."""
    return F.ceil(F.length(col) / F.lit(4)).cast("bigint")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Robust to case/punctuation/whitespace jitter — the 'same document,
    different formatting' dedup key."""
    return F.md5(normalize_text(col))


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, "[^a-zA-Z0-9 ]", "")
    # greatest(...,1): empty text is 0/1 = 0.0, not an ANSI divide-by-zero
    return (F.length(col) - F.length(stripped)) / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, natural stopword
    density, low punctuation noise.  Mirrors the shape of C4/Gopher-style
    filters; each term is a cheap expression."""
    n_tok = whitespace_token_count(col).cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_term + F.lit(0.3) * stop_term + F.lit(0.3) * punct_term, 6
    )


def lang_marker_hits(col: Column, lang: str) -> Column:
    toks = tokens(F.lower(col))
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(col: Column) -> Column:
    """Marker-stopword language ID: argmax of per-language marker hits with
    fixed precedence en>de>fr>es; no hits ⇒ 'und' (undetermined)."""
    en, de = lang_marker_hits(col, "en"), lang_marker_hits(col, "de")
    fr, es = lang_marker_hits(col, "fr"), lang_marker_hits(col, "es")
    return (
        F.when(en + de + fr + es == 0, F.lit("und"))
        .when((en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de >= fr) & (de >= es), F.lit("de"))
        .when(fr >= es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


# PII patterns, applied in THIS order (email first — its local part may look
# like a phone; IPv4 before phone — dotted digit runs would otherwise match
# the phone pattern).  Restricted to syntax shared verbatim by Java regex
# (Spark) and RE2 (DuckDB, 'g' flag): classes, bounded repeats, \b, (?:...).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Replace emails, SSNs, IPv4 addresses, and phone-shaped digit runs
    with typed placeholders — the standard pre-training scrub pass.

    A chain of regexp_replace expressions: map-only, whole-stage codegen,
    order-sensitive (see PII_PATTERNS).  This is pattern-based redaction —
    the deterministic floor every corpus gets; NER-based PII (names,
    addresses) is a model pass that layers on top via mapInPandas, outside
    this operator's scope."""
    c = col
    for _, pattern, replacement in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, replacement)
    return c


def _norm_tokens(col: Column) -> Column:
    """non-empty tokens of the normalized text (the repetition-stat basis)."""
    return F.filter(F.split(normalize_text(col), " "), lambda t: t != "")


def top_token_fraction(col: Column) -> Column:
    """Fraction of the document taken by its single most frequent token —
    the Gopher-style "most common word" repetition signal (a natural English
    page sits near the stopword ceiling ~0.06-0.1; templated/spammy pages
    spike far above).

    Pure expression: distinct-tokens × occurrence-count inside codegen,
    O(d·n) per row — the right trade for web-document lengths because it
    keeps the pass map-only.  For book-length documents the explode +
    groupBy(id, token) + max/sum formulation replaces it (one shuffle,
    linear per row); same output, swap at the caller.
    """

    def frac_of(toks: Column) -> Column:
        counts = F.transform(
            F.array_distinct(toks), lambda t: F.size(F.filter(toks, lambda x: x == t))
        )
        return F.when(
            F.size(toks) > 0, F.array_max(counts) / F.size(toks)
        ).otherwise(F.lit(0.0))

    return F.transform(F.array(_norm_tokens(col)), frac_of)[0]


def duplicate_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram
    (1 - distinct/total) — the Gopher "duplicate n-gram" boilerplate signal.
    0.0 for documents with fewer than n words."""

    def frac_of(toks: Column) -> Column:
        count = F.size(toks) - F.lit(n - 1)
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(count, F.lit(1)) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
        return F.when(
            count >= 1,
            F.lit(1.0) - F.size(F.array_distinct(grams)) / count,
        ).otherwise(F.lit(0.0))

    return F.transform(F.array(_norm_tokens(col)), frac_of)[0]


def repetition_profile(df: DataFrame, id_col: str, text_col: str,
                       top_token_max: float = 0.12,
                       dup_bigram_max: float = 0.06) -> DataFrame:
    """Per-document repetition stats + a combined boilerplate flag, one
    map-only pass (both signals fuse into the same codegen stage)."""
    t = F.col(text_col)
    top = F.round(top_token_fraction(t), 6)
    dup = F.round(duplicate_ngram_fraction(t, 2), 6)
    return df.select(
        F.col(id_col),
        top.alias("top_token_frac"),
        dup.alias("dup_bigram_frac"),
        ((top > top_token_max) | (dup > dup_bigram_max)).alias("repetitive"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·idf:
    (id, term, score, rank).

    idf is the BM25-style rational form ``(N - df + 0.5) / (df + 0.5)`` —
    deliberately log-free: every input is a small integer, so the double
    arithmetic is IEEE-exact and bit-identical across engines (libm ``ln``
    is only correct to ~1 ulp, which can flip a rank at a tie boundary).
    Ranking tiebreaks on the term itself, making the output total-ordered.

    Plan shape at scale: explode → groupBy(id, term) with map-side partial
    counts (one shuffle), materialized ONCE (localCheckpoint — three
    consumers follow: doc-frequency agg, corpus count, and the scored join;
    without it Catalyst re-runs the scan+explode per consumer, measured as
    a 3-scan / 10-exchange plan).  Document frequencies are a groupBy(term)
    over the tf table — partial aggregation keeps hot terms ('the')
    skew-safe, which a count-over-window-by-term would not.  The df-table
    join carries NO broadcast hint: the table is one row per distinct
    corpus term — an unbounded vocabulary at 100 TB — so the join strategy
    is left to AQE, which broadcasts while the measured size allows and
    shuffle-joins beyond (both sides key on the term).  N joins in as a
    broadcast 1-row aggregate; top-k is a per-id window.  At warehouse
    scale the checkpoint becomes a persisted tf table (same pattern as the
    MinHash signature table, dedup.py).
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(_norm_tokens(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "score", "rank")
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass profile: counts, fingerprint, quality, language."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        whitespace_token_count(t).alias("n_tokens"),
        bpe_token_estimate(t).alias("bpe_tokens"),
        fingerprint(t).alias("fingerprint"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
    )


def commonness_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document corpus-commonness — the exactly-reproducible surrogate
    for the LM-perplexity quality filter (CCNet's KenLM gate): documents of
    frequent, ordinary tokens score high; rare-token/garbage documents score
    low, and both tails are candidates for filtering.

    ``commonness = Σ_t tf(t)·df(t) / (n_tokens · N)`` where df(t) is the
    term's document frequency and N the corpus size.  The numerator and both
    denominator factors are INTEGER aggregates — the score is one final
    double division rounded to 6dp, so (like tfidf_top_terms' log-free idf)
    it is bit-identical across engines and partitionings; a mean of
    per-token log-probabilities would be neither (libm ulp + float summation
    order).

    Plan shape at scale: the same tf-table backbone as tfidf_top_terms —
    explode → groupBy(id, term) with map-side partial counts, materialized
    once; document frequencies via groupBy(term) (partial aggregation keeps
    'the'-scale hot terms skew-safe); N broadcasts as a 1-row aggregate.
    The df-table join is deliberately UNHINTED (one row per distinct corpus
    term — unbounded vocabulary; AQE broadcasts while small, shuffle-joins
    beyond).  Documents with zero tokens are excluded (no defined score).

    Output: (id, n_tokens, commonness); row order is not defined —
    aggregate outputs land in shuffle-partition order, so callers wanting a
    total order must sort.
    """
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_norm_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(dfreq, "term")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("df")).alias("num"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.round(F.col("num") / (F.col("n_tokens") * F.col("n_docs")), 6).alias(
                "commonness"
            ),
        )
    )
