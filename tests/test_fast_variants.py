"""Correctness contracts for the bench-only `_fast` variants (VERDICT r12
task 2).

The five `_fast` bench queries swap the leaf hash of an oracle-certified
contract query to xxhash64 — the production configuration at scale.  The
xxhash64 key has no DuckDB twin, so their contract is ENGINE-INTERNAL,
pinned here at oracle scale (sf0.01, where a 2^-64 hash collision is
impossible) against the exact/portable twin:

- `dedup_token_spans_fast` and `sketch_heavy_hitters_fast` are
  row-for-row EQUAL to the exact form by construction: the hash only
  relabels a join key (token spans) or re-randomizes a never-
  underestimating pre-gate whose false positives the exact second pass
  removes (heavy hitters).  A value difference at any scale without a
  64-bit collision is a bug.
- `dedup_minhash_lsh_fast` emits the SAME PAIR SET as the portable form
  on this corpus (pinned); its `est_jaccard` values differ by design —
  the base hash parameterizes the MinHash randomization, so the
  signature-fraction estimate is a different draw of the same estimator.
- `dedup_simhash_fast` / `dedup_winnowing_fast` re-randomize the
  similarity summary itself (bit vector / fingerprint sampling), so
  borderline pairs near the cutoff legitimately differ between hash
  families.  Their invariance contract is the structural one: documents
  with IDENTICAL normalized text have identical summaries under ANY
  hash (hamming 0; every fingerprint shared), so the exact-duplicate
  core must appear in the output of BOTH modes.

The adjudication lives in COVERAGE.md alongside the bench-only listing;
this is the same certified-oracle-vs-production-path split as
`bpe_learned_merges` batch=1 (certified) vs batch=16 (measured).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_token_spans_fast_equals_exact(docs):
    """hash_grams=True only relabels the gram join key (exact text →
    xxhash64 word); at any scale without a 64-bit collision the reported
    spans are identical."""
    from cassandra_util_spark.operators.dedup import duplicated_token_spans

    cols = ["doc_id", "span_start", "span_end", "span_tokens"]
    exact = _rows(duplicated_token_spans(docs, "doc_id", "text", n=8), cols)
    fast = _rows(
        duplicated_token_spans(docs, "doc_id", "text", n=8, hash_grams=True),
        cols,
    )
    assert fast == exact and exact  # equal AND non-trivial


def test_heavy_hitters_fast_equals_exact(docs):
    """The CM gate never underestimates, so no true heavy hitter is
    dropped under ANY hash family, and the exact second pass removes the
    gate's false positives — the hash changes the plan, never the
    answer."""
    from cassandra_util_spark.operators.sketches import heavy_hitters_exact
    from cassandra_util_spark.operators.text import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda t: t != ""
    )
    big = (
        docs.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat(t[i], ' ', t[i + 1]))"
                )
            ).alias("bigram")
        )
    )
    cols = ["bigram", "n"]
    exact = _rows(
        heavy_hitters_exact(big, "bigram", phi=0.001, depth=4, width=1024),
        cols,
    )
    fast = _rows(
        heavy_hitters_exact(
            big, "bigram", phi=0.001, depth=4, width=1024, hash_fn="xxhash64"
        ),
        cols,
    )
    assert fast == exact and exact


def test_minhash_fast_same_pair_set(docs):
    """The xxhash64 base hash draws a different MinHash randomization, so
    est_jaccard values differ — but on this corpus every true near-dup
    pair sits far from the 0.5 threshold and both modes emit the SAME
    pair set.  If this ever breaks, the corpus gained a borderline pair:
    adjudicate it, don't loosen the hash."""
    from cassandra_util_spark.operators.dedup import minhash_lsh_pairs

    cols = ["id_a", "id_b"]
    exact = _rows(
        minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.5), cols
    )
    fast = _rows(
        minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, hash_fn="xxhash64"
        ),
        cols,
    )
    assert fast == exact and exact


@pytest.fixture(scope="module")
def docs_with_dups(docs):
    """Real corpus plus exact copies of its 8 longest documents under
    shifted ids: the sf0.01 corpus holds NO identical-text pair (checked
    — 500 distinct fingerprints), so the exact-duplicate core the
    invariance contract needs is synthesized from the corpus' own text.
    Truth pairs: (doc_id, doc_id + 100000)."""
    base = docs.orderBy(F.col("n_chars").desc(), F.col("doc_id")).limit(8)
    copies = base.withColumn(
        "doc_id", (F.col("doc_id") + F.lit(100_000)).cast("long")
    )
    truth = {
        (r["doc_id"], r["doc_id"] + 100_000) for r in base.collect()
    }
    return docs.unionByName(copies), truth


def test_simhash_fast_recovers_exact_duplicate_core(docs_with_dups):
    """Identical text ⇒ identical simhash under any base hash ⇒ hamming
    0 ≤ max_hamming: the exact-duplicate core must be in BOTH modes'
    outputs.  The weak-signal tail differs by design — the bit vector is
    hash-parameterized, and this corpus' 31-word vocabulary makes
    low-similarity hamming a coarse draw (measured at sf0.01:
    portable 12 pairs vs xxhash64 17, sym-diff all below-threshold under
    the other family's hash; see COVERAGE.md adjudication)."""
    from cassandra_util_spark.operators.dedup import simhash_pairs

    d, truth = docs_with_dups
    cols = ["id_a", "id_b"]
    exact = set(_rows(simhash_pairs(d, "doc_id", "text", max_hamming=3), cols))
    fast = set(
        _rows(
            simhash_pairs(d, "doc_id", "text", max_hamming=3,
                          hash_fn="xxhash64"),
            cols,
        )
    )
    assert truth <= exact and truth <= fast


def test_winnowing_fast_recovers_exact_duplicate_core(docs_with_dups):
    """Identical text ⇒ identical winnowed fingerprint set under any
    hash (the winnowing guarantee is positional, not hash-dependent) ⇒
    all fingerprints shared ≥ min_shared: the exact-duplicate core must
    be in BOTH modes' outputs."""
    from cassandra_util_spark.operators.dedup import winnowing_pairs

    d, truth = docs_with_dups
    cols = ["id_a", "id_b"]
    exact = set(
        _rows(winnowing_pairs(d, "doc_id", "text", k=3, w=8, min_shared=2),
              cols)
    )
    fast = set(
        _rows(
            winnowing_pairs(d, "doc_id", "text", k=3, w=8, min_shared=2,
                            hash_fn="xxhash64"),
            cols,
        )
    )
    assert truth <= exact and truth <= fast
