"""BPE vocabulary learning (Sennrich et al., ACL 2016) as a distributed
iterative operator — the trainable half of the tokenizer family
(``text.bpe_token_estimate`` is the static regex estimator).

Algorithm: start from the word-frequency table with each word segmented
into characters plus a terminal ``</w>`` symbol; each merge step counts
adjacent symbol pairs weighted by word frequency, picks the global argmax
(count desc, then pair lexicographic — a total order), and re-segments
every word by greedily merging non-overlapping occurrences of that pair
left to right.  After N steps the per-word segmentation IS the learned
BPE tokenization, and token counts per document follow by joining words
back to their final segment counts.

Greedy-merge exactness: ``replace(' a b ', ...)`` string surgery silently
skips ADJACENT repeats (the replacement consumes the shared boundary
space — measured in both engines), so the merge here is an array fold:
append each symbol, merging it into the previous one when the pair
matches — which is exactly the reference implementation's left-to-right
non-overlapping semantics, including same-symbol runs (``a a a`` under
pair ``(a,a)`` -> ``aa a``).  The DuckDB oracle replays the same
semantics positionally (match positions -> gaps-and-islands -> keep
even offsets within each island); the equivalence of fold and parity
forms is pinned against a plain-Python reference in tests.

Scale design (100 TB):
- the working state is the WORD-frequency table (vocabulary-sized, not
  corpus-sized): one corpus scan builds it, and every merge iteration
  touches only this table — the standard trick that makes BPE training
  tractable on web corpora;
- each step = one pair-count shuffle (map-side partial sums) + a 1-row
  collect (the argmax) + a map-only fold re-segmentation, checkpointed
  so the plan does not grow with the step count;
- num_merges is a config constant; production vocab sizes (30k merges)
  run the same loop — per-step cost is flat in the merge index.

Reference anchor: iterative global-argmax maintenance is the shape of the
reference's repair/compaction loops (DeletingCompactionStrategy.java's
recompaction cycle); there is no tokenizer in the reference — this is
part of the training-data surface the brief adds.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_util_spark.operators.text import _norm_tokens

END = "</w>"


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, syms) — corpus word frequencies with each word's initial
    character segmentation (chars + terminal ``</w>``).  One corpus scan;
    everything after operates on this vocabulary-sized table."""
    return (
        df.select(F.explode(_norm_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "syms",
            F.concat(
                F.expr("regexp_extract_all(word, '.', 0)"),
                F.array(F.lit(END)),
            ),
        )
    )


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) in a
    symbol array, as one fold expression (no explode, no UDF)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    # fully-merged single-symbol words have no pairs; without the filter,
    # sequence(1, 0) yields the DESCENDING [1, 0] (not empty) and
    # element_at(syms, 2) faults on the 1-element array
    return (
        words.filter(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda j: F.struct(
                        F.element_at(F.col("syms"), j).alias("lhs"),
                        F.element_at(F.col("syms"), j + 1).alias("rhs"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("cnt").alias("c"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 10,
) -> Tuple[List[Tuple[int, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns ``(merges, words)``: merges as [(step, lhs, rhs, count)] in
    learned order, and the word table with its FINAL segmentation (word,
    cnt, syms) — the lookup table that tokenizes any text over this vocab.
    Each step's argmax is a bounded 1-row collect; the word table is
    eagerly checkpointed per step so lineage stays flat across merges."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    words = word_frequency_table(df, text_col).localCheckpoint()
    merges: List[Tuple[int, str, str, int]] = []
    for step in range(num_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("c").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # corpus exhausted (every word a single symbol)
        lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], top[0]["c"]
        merges.append((step, lhs, rhs, int(c)))
        words = words.withColumn(
            "syms", merge_pair_expr(F.col("syms"), lhs, rhs)
        ).localCheckpoint()
    return merges, words


def bpe_merge_table(spark: SparkSession, merges) -> DataFrame:
    """Learned merges as a DataFrame: (step, lhs, rhs, merged, cnt)."""
    return spark.createDataFrame(
        [(s, l, r, l + r, c) for (s, l, r, c) in merges],
        "step int, lhs string, rhs string, merged string, cnt bigint",
    )


def bpe_token_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    words: DataFrame,
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) — tokenize every document under the
    learned vocabulary by joining its words to their final segment counts
    (BPE is word-local, so the per-word segmentation IS the tokenizer).
    The join is broadcast when the vocab is small; at web scale it is a
    shuffle on the word key — either way no per-document re-segmentation
    runs, which is the point of training on the frequency table."""
    seg = words.select("word", F.size("syms").alias("n_seg"))
    doc_words = df.select(
        F.col(id_col).alias("id"),
        F.explode(_norm_tokens(F.col(text_col))).alias("word"),
    )
    return (
        doc_words.join(seg, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_seg").alias("n_bpe_tokens"),
        )
        .select(F.col("id").alias(id_col), "n_words", "n_bpe_tokens")
    )
