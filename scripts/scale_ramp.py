"""Scale-ramp measurement for the top-5 pipelines (VERDICT r5, task 4).

Every 100 TB claim in this repo is a plan inspection plus an O() argument;
this script adds MEASURED scaling curves.  It materializes seeded 1x/3x/10x
replicas of the sf0.1 ``documents`` and ``embeddings`` tables, runs each
headline pipeline at each scale, and reports wall time plus the executor-
measured shuffle write bytes per run, so superlinear stages show up as a
bend in either curve.

Replica construction (deterministic, no RNG):

- Replica k of a document keeps its statistical shape (same lengths, same
  intra-replica duplicate structure, and — crucially — the same stopword
  and language-marker profile, so content-dependent gates keep passing)
  but moves its CONTENT tokens into a disjoint token space: every token
  whose normalized form is not a stopword/marker is prefixed ``r<k>``;
  doc_ids shift by k * 10^9.  Cross-replica 3-gram shingles almost all
  contain a content token, so cross-replica Jaccard sits far below the
  0.5 dedup thresholds — scaling input 10x scales the true
  duplicate-pair count ~10x (each replica contains the original's
  internal duplicates), which is the honest linear-work regime.  Naively
  concatenating identical copies would instead grow duplicate GROUPS to
  size 10 and pair counts quadratically, and prefixing EVERY token (the
  first version of this script) silently deletes the replicas at the
  quality/language gates — both data artifacts, not engine properties.
- Replica k of an embedding rotates the vector by k positions (norm and
  component distribution preserved; cosine to the original drops to
  ~random), and vec_ids shift the same way — same reasoning for the
  cosine near-dup graph.

Shuffle bytes come from the Spark UI's REST status API (the session runs
with ``spark.ui.enabled=true`` and a raised stage-retention limit): each
run sums ``shuffleWriteBytes`` over stages newer than a per-run stage-id
watermark, which isolates the query's traffic and survives UI store
eviction (a cumulative before/after delta goes negative once old stages
are evicted).

Usage: python scripts/scale_ramp.py [--scales 1,3,10] [--repeat 2]
Writes SCALING.md at the repo root.  Each (pipeline-set, scales) run owns a
marker-delimited block (``<!-- scale_ramp:begin <key> -->``) that reruns
REPLACE in place — regenerating twice is a no-op diff, never an appended
duplicate header (VERDICT r9 task 4 / r10 task 5; the keyed-section pattern
from plan_audit --only).  Narrative sections written by hand live outside
the markers and are never touched.
"""

from __future__ import annotations

import argparse
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
RAMP_ROOT = "/tmp/scale_ramp"

PIPELINES = [
    "sketch_heavy_hitters",
    "dedup_minhash_lsh",
    "training_corpus_assembly",
    "dedup_clusters_star",
    "semantic_dedup",
    "semantic_dedup_scaled",
    "dedup_ngram_jaccard",
    "dedup_ngram_prefix",
    # streaming stores (r8 task 7): each replays the ramped corpus through
    # a FIXED 3-micro-batch stream into fresh run stores, so the ramp holds
    # batch count constant while shard size (and admitted history) scale
    "corpus_ingest_streaming",
    "dedup_streaming_lsh",
    # bottom-k sketch family (r9): the claim is O(k) output and
    # per-partition O(k) heap work — wall and shuffle should stay ~flat
    "bottomk_sample_docs",
    "quantile_sketch_by_lang",
    # weighted sampler (r9): priority cost is ~ sum(weights) map-side;
    # wall should ramp near-linearly in corpus bytes, shuffle stays k rows
    "weighted_sample_docs",
    # log-cost weighted sampler (r12): realistic token-count weights
    # (n_chars*1811 ≈ 10^5-10^6) at O(log²w) per row — wall should stay
    # flat-in-weights and near-flat in corpus bytes, shuffle stays k rows
    "weighted_sample_logcost",
    # distributed prefix sum (r12): the two-phase budget cut — wall should
    # ramp ~linearly in corpus bytes with NO single-task stage; the naive
    # global-window form it replaces serializes the whole corpus
    "corpus_budget_cut",
    # stratified weighted sampler (r12): per-language E-S winners at
    # log-cost priority — map-side WindowGroupLimit pre-prune, so shuffle
    # stays ~groups·maps·k rows and wall near-flat
    "weighted_sample_by_lang",
    # mixture executor (r12): per-source budget cut — one group-key
    # shuffle, per-group windows parallel across sources; wall ~linear
    # in corpus bytes, budgets table broadcast
    "mixture_budget_execution",
    # token-granular span detector (r12): gram explode into a combiner-
    # reduced count, anchors ∝ duplicated volume, per-doc islands — wall
    # and shuffle should ramp ~linearly in corpus bytes
    "dedup_token_spans",
    # excision (r13): detection + one span join + a map-side array pass —
    # the delta over dedup_token_spans should stay ~flat in scale
    "dedup_token_spans_excised",
    # streamed gram-count index (r13): 3 fixed micro-batches of additive
    # deltas + full-corpus store probe — per-batch delta cost ∝ shard
    # grams, probe ∝ corpus grams + bounded count-run merge
    "token_spans_streaming_view",
    # batched BPE (r13): per-ROUND pair-count shuffle over the
    # vocabulary-sized word table — wall near-flat in corpus bytes after
    # the one corpus scan that builds the frequency table
    "bpe_learned_merges_batched",
    # tokenizer family (r13): encode is vocab-local segmentation + one
    # (id)-keyed assembly shuffle ∝ corpus tokens; the packing composition
    # adds the distributed prefix sum — both should ramp ~linearly in
    # corpus bytes with shuffle ∝ tokens
    "bpe_encode_corpus",
    "tokenized_packing_plan",
    # materialized windows pay the token-linear shuffle twice (stream
    # assembly + bin regroup); streaming encode adds the per-shard store
    # appends — both should stay ∝ corpus tokens with no quadratic term
    "packed_training_windows",
    "bpe_streaming_encode",
    # r14 trainer-facing surface: attribution rides the windows' own
    # slice-piece shuffle; FIM and span corruption are map-only expression
    # passes over the encode chain; the incremental manifest adds counter
    # deltas; curriculum is one (stage, shard) exchange -- all should ramp
    # ~linearly in corpus tokens with no new superlinear term
    "packed_window_attribution",
    "fim_token_streams",
    "span_corruption_pairs",
    "manifest_incremental_totals",
    "curriculum_stage_schedule",
    "windowed_loss_masks",
    # r14 tail: the incremental/sharded window forms, the leak audit, and
    # the datasheet -- the first two share the windows chain (expect the
    # same token-linear shuffle), the audit is spans-sized, the datasheet
    # is one partial-aggregated scan with |sources| output rows
    "windows_incremental_store",
    # r15: the STREAMED window store -- same carry protocol as the
    # incremental form, run through 3 fixed micro-batches with the carry
    # read back from the store; expect the incremental form's token-linear
    # shuffle plus the fixed streaming session cost
    "windows_streaming_store",
    "sharded_training_windows",
    # r15: epoch-shuffle plan (|epochs|x|windows| map-only rows + one
    # (epoch, shard) exchange) and per-lang fertility (one encode pass +
    # |langs| output rows) -- both ride the certified token-linear chain
    "windows_epoch_shuffle",
    "tokenizer_fertility_by_lang",
    # r15: curriculum-ordered windows -- the one-shot window chain with a
    # different order column; expect the same token-linear shuffle plus
    # the quality-scan join
    "curriculum_packed_windows",
    # r15: IVF recall audit -- exact side O(N x |queries|) with |queries|
    # fixed (the sampled-query-set production shape); expect near-flat
    # wall and tiny shuffle
    "ann_recall_audit",
    # r15: LSH recall/precision vs exact Jaccard -- both sides already
    # ramped; the audit adds one pair-set join and a 1-row aggregate
    "lsh_recall_audit",
    "simhash_recall_audit",
    "window_leak_audit",
    "dataset_datasheet",
    # r16: loader plan over the PERSISTED window store -- the streaming
    # store build (token-linear, fixed 3 micro-batches) plus a
    # metadata-only plan read (token arrays pruned out of ReadSchema);
    # the plan itself is |epochs|x|windows| rows
    "epoch_plan_from_store",
    # r16: streamed frozen-artifact encode -- bpe_streaming_encode's
    # shape (3 fixed micro-batches + store appends) over the byte-
    # fallback encode; expect that family's token-linear curve
    "tokenizer_streaming_encode",
    # r16: byte-fallback round trip -- encode + decode chains, both
    # token-linear; expect ~2x the fallback encode's curve
    "bpe_roundtrip_oov",
    # r16: persisted-tokenizer encode -- the byte-fallback encode shape
    # plus a bounded artifact write/read (vocabulary-sized tables);
    # expect bpe_encode_oov_fallback's token-linear curve
    "tokenizer_persisted_encode",
    # r16: curriculum windows persisted as ingest waves -- the streaming
    # store build keyed on the curriculum order (one micro-batch per
    # stage); expect the streaming-store shape (token-linear shuffle,
    # fixed per-batch constants)
    "curriculum_windows_from_store",
    # r16: IVFADC recall audit -- same sampled-query shape as
    # ann_recall_audit (exact side O(N x |queries|), |queries| fixed);
    # the approximate side reads codes, expect tiny shuffle
    "ivfpq_recall_audit",
    # r16: frozen-vocab encode with byte fallback -- the twin's shape plus
    # one bounded vocab collect and a map-only inline byte expansion on
    # the un-covered join side; expect token-linear shuffle like the twin
    "bpe_encode_oov_fallback",
    # r17: the full-circle inversion -- OOV encode + windows + the inverse
    # (doc)-keyed slice-piece shuffle + decode; every stage token-linear,
    # so expect ~the windows curve plus one more token-linear exchange
    "windows_decode_roundtrip",
    # r17: frozen-artifact coverage audit -- one map-only explode, one
    # broadcast join against the CAPPED word table, |languages| output
    # rows; expect near-flat shuffle and wall ~linear in corpus bytes
    "tokenizer_coverage_by_lang",
    # r17: per-batch coverage drift off the persisted encode store --
    # the streamed encode build (token-linear, 3 fixed micro-batches)
    # plus one aggregate emitting |batches| rows
    "tokenizer_coverage_drift",
    # r17: random-access lookup -- store build (token-linear) + a
    # key-BOUNDED read of only the runs holding the requested doc range;
    # the lookup's own cost should stay ~flat as the corpus scales
    "windows_doc_lookup",
    # r17: the same inversion over the PERSISTED store's merged read --
    # the streaming-store build (fixed 3 micro-batches) plus the inverse
    # shuffle; expect windows_streaming_store's curve + the inversion term
    "windows_store_decode_roundtrip",
]


def build_ramp(spark, scale: int) -> str:
    """Materialize the <scale>x replica set (idempotent per scale)."""
    from pyspark.sql import functions as F

    out = os.path.join(RAMP_ROOT, f"x{scale}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    from cassandra_util_spark.operators.text import (
        EN_STOPWORDS,
        GOPHER_STOPWORDS,
        LANG_MARKERS,
    )

    preserve = sorted(
        set(EN_STOPWORDS)
        | set(GOPHER_STOPWORDS)
        | {m for ms in LANG_MARKERS.values() for m in ms}
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = []
    for k in range(scale):
        if k == 0:
            parts.append(docs)
            continue
        tag = F.lit(f"r{k}")
        retok = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.when(
                    F.lower(F.regexp_replace(w, "[^a-zA-Z0-9]", "")).isin(*preserve),
                    w,
                ).otherwise(F.concat(tag, w)),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 1_000_000_000)).alias("doc_id"),
                retok.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    ramped_docs = parts[0]
    for p in parts[1:]:
        ramped_docs = ramped_docs.unionByName(p)
    ramped_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    eparts = []
    for k in range(scale):
        if k == 0:
            eparts.append(emb)
            continue
        dim = F.size("embedding")
        rot = F.concat(
            F.slice(F.col("embedding"), F.lit(k % 16 + 1), dim),
            F.slice(F.col("embedding"), F.lit(1), F.lit(k % 16)),
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * 1_000_000_000)).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    ramped_emb = eparts[0]
    for p in eparts[1:]:
        ramped_emb = ramped_emb.unionByName(p)
    ramped_emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # pipelines above only read documents/embeddings; link the rest so the
    # ramp dir is a drop-in sf_dir
    for t in os.listdir(SF_DIR):
        dst = os.path.join(out, t)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, t), dst)
    open(marker, "w").close()
    return out


def _stages(spark) -> list:
    import json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        return json.load(r)


def max_stage_id(spark) -> int:
    return max((s["stageId"] for s in _stages(spark)), default=-1)


def shuffle_bytes_after(spark, stage_watermark: int) -> int:
    """Shuffle-write bytes of stages newer than ``stage_watermark``.

    A cumulative before/after delta breaks once the UI store evicts old
    stages (the total DROPS and deltas go negative/frozen); summing only
    stages above a per-run id watermark is eviction-safe as long as the
    run's own stages fit the retention window (raised via
    spark.ui.retainedStages)."""
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in _stages(spark)
        if s["stageId"] > stage_watermark
    )


SCALING_H1 = [
    "# SCALING — measured ramp curves (sf0.1 base, seeded replicas)",
    "",
    "Generated by `scripts/scale_ramp.py` (see its docstring for the",
    "replica construction that keeps duplicate structure linear); shuffle =",
    "executor-reported shuffle-write bytes for the run's stages.  Ramp",
    "tables are marker-keyed: re-running the same pipeline set replaces its",
    "block in place.  Hand-written analysis sections live between blocks.",
    "",
]


def ramp_key(pipelines: list, scales: list) -> str:
    return ",".join(pipelines) + "@" + ",".join(str(s) for s in scales)


def ratio_cell(num: float, den: float, floor: float) -> str:
    """`n/a` when the denominator underflows measurement resolution — a
    0.0 MB x1 shuffle would otherwise print a 1e8x 'ratio' that reads as
    a blow-up when the truth is 'k rows in, k rows out' (VERDICT r9)."""
    if den < floor:
        return "n/a"
    return f"{num / den:.1f}x"


def upsert_block(text: str, key: str, block: str) -> str:
    """Replace the marker-delimited block for ``key`` in ``text``, or
    append it.  Callable replacement — measured content must never be
    parsed as a regex template."""
    begin = f"<!-- scale_ramp:begin {key} -->"
    end = f"<!-- scale_ramp:end {key} -->"
    payload = f"{begin}\n{block.rstrip()}\n{end}"
    if begin in text:
        pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.DOTALL)
        return pat.sub(lambda m: payload, text)
    return text.rstrip("\n") + "\n\n" + payload + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated subset of PIPELINES to ramp (upserts its keyed block in SCALING.md)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    pipelines = PIPELINES
    if args.only:
        pipelines = [q.strip() for q in args.only.split(",")]
        unknown = [q for q in pipelines if q not in PIPELINES]
        if unknown:
            raise SystemExit(f"--only names not in PIPELINES: {unknown}")

    from cassandra_util_spark.core.session import get_spark
    from cassandra_util_spark.entry_queries import QUERIES

    spark = get_spark(
        "scale-ramp",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {}
    for s in scales:
        t0 = time.monotonic()
        dirs[s] = build_ramp(spark, s)
        print(f"ramp x{s} ready in {time.monotonic() - t0:.1f}s", file=sys.stderr)

    results: dict[str, dict[int, dict]] = {q: {} for q in pipelines}
    for q in pipelines:
        for s in scales:
            times, shuffles = [], []
            for _ in range(args.repeat):
                watermark = max_stage_id(spark)
                t0 = time.monotonic()
                QUERIES[q](spark, dirs[s]).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.monotonic() - t0)
                shuffles.append(shuffle_bytes_after(spark, watermark))
            results[q][s] = {
                "sec": round(statistics.median(times), 2),
                "shuffle_mb": round(statistics.median(shuffles) / 1e6, 1),
            }
            print(f"{q} x{s}: {results[q][s]}", file=sys.stderr)

    lines = [
        f"### Ramp: {', '.join(pipelines)} "
        f"(scales {', '.join(f'x{s}' for s in scales)}; "
        f"medians of {args.repeat} runs on local[32])",
        "",
        "| pipeline | " + " | ".join(f"x{s} sec" for s in scales)
        + " | " + " | ".join(f"x{s} shuffle MB" for s in scales)
        + " | time x{}/x1 | shuffle x{}/x1 |".format(scales[-1], scales[-1]),
        "|---|" + "---|" * (2 * len(scales) + 2),
    ]
    for q in pipelines:
        r = results[q]
        lines.append(
            "| " + q + " | "
            + " | ".join(str(r[s]["sec"]) for s in scales) + " | "
            + " | ".join(str(r[s]["shuffle_mb"]) for s in scales)
            + " | "
            + ratio_cell(r[scales[-1]]["sec"], r[scales[0]]["sec"], 0.05)
            + " | "
            + ratio_cell(
                r[scales[-1]]["shuffle_mb"], r[scales[0]]["shuffle_mb"], 0.05
            )
            + " |"
        )
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    try:
        with open(out_path) as f:
            text = f.read()
    except FileNotFoundError:
        text = "\n".join(SCALING_H1)
    text = upsert_block(text, ramp_key(pipelines, scales), "\n".join(lines))
    with open(out_path, "w") as f:
        f.write(text.rstrip("\n") + "\n")
    print(f"upserted block {ramp_key(pipelines, scales)!r} in {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
