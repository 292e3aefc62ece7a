"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract: the LAST stdout line is a compact (<1 KB) JSON summary
{"metric", "value" (total sec), "unit", "queries" (12 slowest), "queries_timed",
"errors_count", "sf", "repeat"} that always fits a tail-capture window; the
full per-query map is printed on the line before it AND written to
BENCH_FULL.json.

Each query is materialized with the noop writer — full pipeline execution
(scan → compute → "write") without driver-side result transfer, the honest
proxy for cluster throughput.

Each query runs ``--repeat N`` times (default 3, env
SPARK_GRAFT_BENCH_REPEAT) and reports the per-query MEDIAN: single-shot
timings of sub-4s queries drifted 1.3-1.6x between rounds from JVM/GC
run-shape noise alone, which made noise indistinguishable from plan
regressions.  The median of 3 absorbs one-off GC pauses and first-run
codegen; "value" is the sum of medians.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the headline set: retention core + merge + analytics (+ pipeline ops as added)
BENCH_QUERIES = [
    "retention_rules_delete",
    "retention_ttl",
    "configurable_delete_json",
    "token_range_filter",
    "lww_merge",
    "counter_merge",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_orders_per_customer",
    "events_hourly_rollup",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_neardup",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "retention_rules_antijoin",
    "events_sessionize",
    "orders_status_rollup",
    "asof_join_clicks_purchases",
    "range_join_incidents",
    "q10_returned_items",
    "q4_order_priority",
    "q6_forecast_revenue",
    "orders_pivot_priority",
    "events_user_gaps",
    "acctbal_percentiles",
    "media_features",
    "media_frame_plan",
    "events_json_props",
    "salted_event_rollup",
    "bucketed_colocated_join",
    "corpus_clean_pipeline",
    "dedup_clusters",
    "dedup_clusters_star",
    "stratified_sample_docs",
    "doc_repetition_filter",
    "pii_redaction",
    "sequence_packing",
    "doc_top_terms",
    "doc_commonness",
    "weighted_repeat_docs",
    "corpus_lang_profile",
    "embedding_dedup_resolve",
    "semantic_dedup",
    "media_dedup",
    "embedding_quantize",
    "decontamination",
    "doc_chunks",
    "stratified_topk_docs",
    "training_corpus_assembly",
    "dedup_incremental",
    "dedup_incremental_bloom",
    "passage_dup_share",
    "dedup_span_removal",
    "gopher_quality_gate",
    "commonness_buckets",
    "dedup_ngram_containment",
    "dedup_fingerprint_longest",
    "dedup_within_doc_spans",
    "corpus_gate_report",
    "corpus_shard_plan",
    "mixture_temperature_plan",
    "adaptive_length_bounds",
    "dedup_cluster_sizes",
    "events_skew_report",
    "dedup_winnowing",
    "corpus_split_assignment",
    "corpus_token_budget",
    "q18_large_orders",
    "bm25_search",
    "dsir_select",
    "dedup_incremental_lsh",
    "embedding_prototypes",
    "hard_negatives",
    "q14_promo_revenue",
    "bm25_batch_search",
    "hybrid_retrieval_rrf",
    "retrieval_eval",
    "events_zorder_layout",
    "events_funnel",
    "events_cohort_retention",
    "orders_rollup_totals",
    "dedup_edit_distance",
    "passage_retrieval",
    "tombstone_compaction",
    "cdc_apply",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_idle_balances",
    "bigram_lm_quality",
    "embedding_rp_project",
    "ann_rp_rerank",
    "contamination_report",
    "dedup_soft_keep",
    "events_activity_anomalies",
    "retention_rule_impact",
    "events_cube_profile",
    "embedding_mean_pool",
    "sketch_count_min_users",
    "sketch_hll_registers",
    "sketch_hll_per_type",
    "runstore_compaction_view",
    "ivf_persisted_probe",
    "orders_ledger_reconciliation",
    "events_sliding_window_sum",
    "acctbal_histogram_percentiles",
    "pii_audit_report",
    "doc_length_histogram",
    "corpus_zipf_audit",
    "lang_confusion_matrix",
    "unicode_nfc_fingerprints",
    "q12_late_shipment_priority",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "runstore_leveled_view",
    "sketch_heavy_hitters",
    "events_incremental_rollup",
    "join_plan_advisory",
    "advised_join_exec",
    "counter_store_totals",
    "zorder_layout_key",
    "runstore_skipindex_view",
    "twcs_retention_view",
    # round 6: complete the sweep — every registered contract query is timed
    "parts_above_avg_price",
    "set_ops_except_intersect",
    "retention_ttl_mixed_keys",
    "odd_pk_filter",
    "writetime_projection",
    "dedup_fingerprint",
    "paged_fetch",
    "orders_profile",
    "token_count_regex",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_parts_supplier_relation",
    "q20_potential_promotion",
    "cluster_aware_split",
    # round 7: z-order-unified run store, scale-safe semantic dedup,
    # streaming TWCS life-cycle
    "runstore_zorder_2d",
    "semantic_dedup_scaled",
    "twcs_streaming_view",
    # round-7 tail additions (registered after r7's final sweep — VERDICT r7
    # item 1): PQ ANN, BPE training, trained quality classifier + Pareto,
    # prefix-filtered Jaccard, streaming LSH index / crawl pipeline /
    # stream-stream interval join
    "ann_pq_adc_topk",
    "ann_pq_rerank_topk",
    "bpe_learned_merges",
    "bpe_token_profile",
    "quality_classifier_scores",
    "quality_classifier_eval",
    "pareto_document_selection",
    "dedup_ngram_prefix",
    "dedup_streaming_lsh",
    "corpus_ingest_streaming",
    "stream_interval_join_view",
    "jaccard_route_advisory",
    "dedup_jaccard_routed",
    "ann_ivfpq_topk",
    "ivfpq_persisted_probe",
    "ivfpq_streaming_index",
    "bottomk_sample_docs",
    "bottomk_shard_merge",
    "quantile_sketch_doclen",
    "bottomk_streaming_sample",
    "quantile_sketch_by_lang",
    "ann_ivfpq_filtered",
    "weighted_sample_docs",
    "weighted_sample_logcost",
    "logcost_streaming_sample",
    "weighted_sample_by_lang",
    "corpus_budget_cut",
    "padding_waste_report",
    "mixture_budget_execution",
    "dedup_token_spans",
    "adaptive_length_bounds_sketch",
    "bpe_learned_merges_batched",
    "dedup_token_spans_cross_doc",
    "token_spans_streaming_view",
    "dedup_token_spans_excised",
    "token_spans_incremental_excision",
    "bpe_encode_corpus",
    "bpe_vocab_ids",
    "bpe_encode_ids_corpus",
    "tokenized_packing_plan",
    "packed_training_windows",
    "bpe_streaming_encode",
    "bpe_roundtrip_text",
    "semantic_decontamination",
    "packed_window_attribution",
    "packed_shard_manifest",
    "curriculum_stage_schedule",
    "fim_token_streams",
    "manifest_incremental_totals",
    "span_corruption_pairs",
    "windowed_loss_masks",
    "window_leak_audit",
    "windows_incremental_store",
    "windows_streaming_store",
    "sharded_training_windows",
    "windows_epoch_shuffle",
    "tokenizer_fertility_by_lang",
    "curriculum_packed_windows",
    "ann_recall_audit",
    "lsh_recall_audit",
    "simhash_recall_audit",
    "dataset_datasheet",
    "bpe_encode_oov_fallback",
    "ivfpq_recall_audit",
    "epoch_plan_from_store",
    "curriculum_windows_from_store",
    "tokenizer_persisted_encode",
    "bpe_roundtrip_oov",
    "tokenizer_streaming_encode",
    "windows_decode_roundtrip",
    "windows_store_decode_roundtrip",
    "tokenizer_coverage_by_lang",
    "windows_doc_lookup",
    "tokenizer_coverage_drift",
    # bench-only fast-path variants (EXTRA_QUERIES below): same pipelines as
    # the oracle-verified portable-hash contract queries, with the leaf hash
    # swapped to xxhash64 — the production configuration at scale
    "dedup_minhash_lsh_fast",
    "dedup_simhash_fast",
    "dedup_winnowing_fast",
    "sketch_heavy_hitters_fast",
    "dedup_token_spans_fast",
    "pack_bestfit_bins",
]

# Registered queries deliberately NOT benched (scripts/release_check.py
# requires every registry entry to be either in BENCH_QUERIES or here,
# with a reason).  Currently empty: the whole registry is timed.
BENCH_EXCLUDED: tuple = ()


def _pack_bestfit(spark, sf_dir):
    from pyspark.sql import functions as F

    from cassandra_util_spark.operators.packing import pack_bestfit
    from cassandra_util_spark.operators.text import bpe_token_estimate

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", bpe_token_estimate(F.col("text")).alias("n_tokens")
    )
    return pack_bestfit(d, "doc_id", "n_tokens", capacity=2048)


def _token_spans_fast(spark, sf_dir):
    from cassandra_util_spark.operators.dedup import duplicated_token_spans

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicated_token_spans(d, "doc_id", "text", n=8, hash_grams=True)


def _minhash_fast(spark, sf_dir):
    from pyspark.sql import functions as F

    from cassandra_util_spark.operators.dedup import minhash_lsh_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.5, hash_fn="xxhash64")


def _winnowing_fast(spark, sf_dir):
    from cassandra_util_spark.operators.dedup import winnowing_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnowing_pairs(d, "doc_id", "text", k=3, w=8, min_shared=2,
                           hash_fn="xxhash64")


def _heavy_hitters_fast(spark, sf_dir):
    from pyspark.sql import functions as F

    from cassandra_util_spark.operators.sketches import heavy_hitters_exact
    from cassandra_util_spark.operators.text import normalize_text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(normalize_text(F.col("text")), " "), lambda t: t != "")
    big = (
        d.select(toks.alias("t"))
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
    return heavy_hitters_exact(big, "bigram", phi=0.001, depth=4, width=1024,
                               hash_fn="xxhash64")


def _simhash_fast(spark, sf_dir):
    from cassandra_util_spark.operators.dedup import simhash_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3, hash_fn="xxhash64")


# timed alongside the contract queries but NOT part of queries()/oracle_sql():
# correctness of these pipelines is certified by the portable-hash twins
EXTRA_QUERIES = {
    "dedup_minhash_lsh_fast": _minhash_fast,
    "dedup_simhash_fast": _simhash_fast,
    "dedup_winnowing_fast": _winnowing_fast,
    "sketch_heavy_hitters_fast": _heavy_hitters_fast,
    "dedup_token_spans_fast": _token_spans_fast,
    "pack_bestfit_bins": _pack_bestfit,
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repeat", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")),
                    help="runs per query; the reported time is the median")
    ap.add_argument("--only", nargs="*", default=None,
                    help="time only these queries (skips BENCH_FULL.json write)")
    ap.add_argument("--merge", action="store_true",
                    help="with --only: fold the timings into BENCH_FULL.json "
                         "(prunes entries no longer in BENCH_QUERIES) instead "
                         "of discarding them — keeps the release gate current "
                         "after registering a new query without a full re-run")
    args = ap.parse_args()
    repeat = max(1, args.repeat)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cassandra_util_spark.core.session import get_spark
    from cassandra_util_spark.entry_queries import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths so query timings measure the engine, not startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    runnable = {**QUERIES, **EXTRA_QUERIES}
    names = [n for n in BENCH_QUERIES if n in runnable]
    if args.only is not None:
        unknown = [n for n in args.only if n not in runnable]
        if unknown:
            print(f"bench: unknown queries: {unknown}", file=sys.stderr)
            raise SystemExit(2)
        names = list(args.only)
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Per-query error isolation: one broken query must never erase the
    # performance signal of the other 50+ (BENCH_r02 lost every timing to a
    # single AnalysisException).  Record the error, keep timing the rest,
    # always print the JSON line; exit non-zero only at the end.
    for name in names:
        runs: list[float] = []
        for _ in range(repeat):
            t0 = time.monotonic()
            try:
                runnable[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.monotonic() - t0)
            except Exception as exc:  # noqa: BLE001 — isolate ANY per-query failure
                msg = f"{type(exc).__name__}: {exc}"
                errors[name] = msg.splitlines()[0][:300]
                print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
                # discard partial timings: a 1-run "median" labeled as an
                # N-run median would reintroduce exactly the single-shot
                # drift the repeat feature exists to remove
                runs = []
                break
        if runs:
            timings[name] = round(statistics.median(runs), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "repeat": repeat,
    }
    if errors:
        out["errors"] = errors

    # The FULL record (all ~130 per-query medians) goes to a side file and to
    # an early stdout line; the LAST stdout line is a compact summary
    # guaranteed well under 1 KB.  Round 4's official bench record came back
    # "parsed": null because the single JSON line carrying every per-query
    # entry (~4 KB) overflowed the driver's tail-capture window (VERDICT r4,
    # task 1) — the driver only reliably sees the tail of stdout, so the line
    # it parses must stay small no matter how many queries the suite grows to.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    if args.only is None:  # a partial --only run must not clobber the record
        try:
            with open(full_path, "w") as f:
                json.dump(out, f, indent=1)
                f.write("\n")
        except OSError as exc:  # read-only checkout: the stdout copy still exists
            print(f"bench: could not write {full_path}: {exc}", file=sys.stderr)
    elif args.merge:
        # incremental update: fold this subset's medians into the committed
        # record so BENCH_FULL.json tracks the live bench set (same contract
        # as check_oracle.py --merge); value stays the sum of all medians
        try:
            with open(full_path) as f:
                full = json.load(f)
            merged = {n: t for n, t in full["queries"].items() if n in BENCH_QUERIES}
            merged.update(timings)
            full["queries"] = merged
            full["value"] = round(sum(merged.values()), 3)
            # dedup + prune: repeated merges must not accumulate duplicate
            # names, and names dropped from BENCH_QUERIES must leave the
            # merged_only record too (ADVICE r9)
            full["merged_only"] = sorted(
                (set(full.get("merged_only", [])) | set(timings))
                & set(BENCH_QUERIES)
            )
            with open(full_path, "w") as f:
                json.dump(full, f, indent=1)
                f.write("\n")
            print(f"bench: merged {len(timings)} timing(s) into {full_path} "
                  f"({len(merged)} total)", file=sys.stderr)
        except OSError as exc:
            print(f"bench: could not merge into {full_path}: {exc}", file=sys.stderr)
    print(json.dumps(out))

    # Bounded by construction: start from the 12 slowest queries and DROP
    # entries until the serialized line fits under 1 KB (an assert here would
    # abort AFTER the oversized line already printed — the exact failure the
    # compact line exists to prevent; ADVICE r5).
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:12]
    while True:
        compact = {
            "metric": out["metric"],
            "value": out["value"],
            "unit": "sec",
            "queries": dict(slowest),  # full map: line above + BENCH_FULL.json
            "queries_timed": len(timings),
            "errors_count": len(errors),
            "sf": out["sf"],
            "repeat": repeat,
            "full": "BENCH_FULL.json",
        }
        line = json.dumps(compact)
        if len(line) < 1024 or not slowest:
            break
        slowest = slowest[:-1]
    print(line)
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
