"""Quantify the batched-BPE approximation (VERDICT r8 task 5).

``bpe_train(batch=N)`` takes pairwise symbol-disjoint merges from each
round's argmax order and applies them as one composed fold — exact WITHIN a
round (pinned in tests/test_bpe.py), approximate ACROSS rounds: sequential
greedy could prefer a pair involving a symbol merged earlier in the same
round.  This script measures how far the approximation actually lands at a
real vocabulary size so a user can pick a batch on evidence instead of
folklore:

- trains the sequential (batch=1, the oracle-certified path) and batched
  vocabularies to the same merge count on the sf0.1 documents corpus;
- reports merge-SET overlap (order-insensitive — the tokenizer a vocab
  induces depends on the merge set and its word-local order of
  application), positional agreement (how long the two sequences stay
  literally identical), and the downstream effect: total corpus BPE token
  count under each vocabulary and the per-document token-count delta from
  ``bpe_token_profile``.

Usage: python scripts/bpe_divergence.py [--merges 1000] [--batch 16]
Prints a summary dict; SCALING.md is updated by hand from it.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cassandra_util_spark.core.session import get_spark
    from cassandra_util_spark.operators.bpe import bpe_token_profile, bpe_train

    spark = get_spark("bpe-divergence")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.cache().count()

    t0 = time.monotonic()
    seq_merges, seq_words = bpe_train(docs, "text", num_merges=args.merges, batch=1)
    t_seq = time.monotonic() - t0
    print(f"sequential: {len(seq_merges)} merges in {t_seq:.1f}s "
          f"({len(seq_merges) / t_seq:.1f}/s)"
          + (" [corpus exhausted]" if len(seq_merges) < args.merges else ""),
          file=sys.stderr)

    t0 = time.monotonic()
    bat_merges, bat_words = bpe_train(
        docs, "text", num_merges=args.merges, batch=args.batch
    )
    t_bat = time.monotonic() - t0
    print(f"batch={args.batch}: {len(bat_merges)} merges in {t_bat:.1f}s "
          f"({len(bat_merges) / t_bat:.1f}/s)", file=sys.stderr)

    n = min(len(seq_merges), len(bat_merges))
    seq_pairs = [(l, r) for (_, l, r, _) in seq_merges[:n]]
    bat_pairs = [(l, r) for (_, l, r, _) in bat_merges[:n]]
    set_overlap = len(set(seq_pairs) & set(bat_pairs)) / n
    prefix_same = 0
    for a, b in zip(seq_pairs, bat_pairs):
        if a != b:
            break
        prefix_same += 1
    positional = sum(a == b for a, b in zip(seq_pairs, bat_pairs)) / n

    def totals(words):
        prof = bpe_token_profile(docs, "doc_id", "text", words)
        r = prof.agg(
            F.sum("n_bpe_tokens").alias("toks"), F.count("*").alias("docs")
        ).collect()[0]
        return prof, int(r["toks"])

    seq_prof, seq_toks = totals(seq_words)
    bat_prof, bat_toks = totals(bat_words)
    joined = seq_prof.select("doc_id", F.col("n_bpe_tokens").alias("a")).join(
        bat_prof.select("doc_id", F.col("n_bpe_tokens").alias("b")), "doc_id"
    )
    r = joined.agg(
        F.sum(F.abs(F.col("a") - F.col("b"))).alias("abs_delta"),
        F.sum((F.col("a") != F.col("b")).cast("long")).alias("docs_differ"),
        F.count("*").alias("docs"),
    ).collect()[0]

    out = {
        "merges": n,
        "seq_merges_total": len(seq_merges),
        "batch_merges_total": len(bat_merges),
        "batch": args.batch,
        "seq_merges_per_sec": round(len(seq_merges) / t_seq, 2),
        "batch_merges_per_sec": round(len(bat_merges) / t_bat, 2),
        "merge_set_overlap": round(set_overlap, 4),
        "positional_agreement": round(positional, 4),
        "identical_prefix_len": prefix_same,
        "seq_corpus_tokens": seq_toks,
        "batch_corpus_tokens": bat_toks,
        "token_total_rel_delta": round(abs(seq_toks - bat_toks) / seq_toks, 6),
        "docs_with_any_token_delta": int(r["docs_differ"]),
        "docs": int(r["docs"]),
        "mean_abs_token_delta_per_doc": round(int(r["abs_delta"]) / int(r["docs"]), 4),
    }
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
