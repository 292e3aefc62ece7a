"""The incremental crawl pipeline: stream → quality gate → exact dedup
(within-batch and against everything ever admitted) → near-dup probe
against the maintained LSH index → admit survivors to the corpus store
and index them, one micro-batch at a time.

This is the STREAMING counterpart of `training_corpus_assembly`: where
that query re-derives the whole corpus per run, this pipeline admits
documents incrementally with per-batch cost independent of history
length — the only historical state consulted is the bounded index table
(one row per admitted doc: content digest + ``num_perm`` MinHash
bigints), never admitted CONTENT.  At 100 TB that difference is the
whole ballgame: each arriving crawl shard does one gate scan of itself,
one digest anti-join and one band-key probe against the index, and two
clustered run appends.

Admission semantics (deterministic, oracle-replayable):

1. quality gate — raw whitespace token count ≥ ``min_tokens`` (or a
   caller ``keep_expr``);
2. within-batch exact dedup — lowest id per identical text survives;
3. exact-vs-history — digest anti-join against the index (drops
   re-crawled byte-copies of anything ever admitted);
4. near-dup-vs-history — banded MinHash probe against the index
   (``est_jaccard ≥ threshold`` against ANY admitted doc drops the
   newcomer).  Within-batch NEAR-dups are deliberately not collapsed —
   both land and the next batch dedups against both, matching
   ``lsh_dedup_against``'s documented contract; run
   ``minhash_lsh_pairs`` + ``resolve_duplicates`` over the admitted
   corpus when intra-batch collapse is wanted.

Admitted docs that are too short to shingle (< n words after
normalization) carry a NULL signature in the index: they still block
exact re-crawls by digest, and a null band bucket can never join, so
they are transparent to the near-dup probe on both sides.

Exactly-once: the corpus store's ``_INGEST_HWM`` carries the txn
identity + batch high-water mark (the ``stream_to_runstore`` protocol);
both appends are idempotent named runs, so a replay after a crash
between the two appends re-derives byte-stable runs and no-ops into the
manifest.  Document ids are assumed unique across the stream — same-id
re-crawl UPDATE semantics belong to :func:`stream_lsh_index`'s LWW
index, not to an admission pipeline (an edited re-crawl is usually a
near-dup of its own predecessor and would be dropped here by rule 4).

Reference anchor: the reference's write path batches mutations and
consults per-sstable summaries before reads (CQLBatch concurrent
sub-batches; SSTableReader key-range metadata); this composes those
disciplines into the corpus-building workload the engine targets.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cassandra_util_spark.operators.dedup import (
    _digest_for,
    _lsh_probe_dup_ids,
    exact_dedup,
    minhash_signatures,
)
from cassandra_util_spark.operators.text import (
    _norm_tokens,
    whitespace_token_count,
)
from cassandra_util_spark.sources.runs import RunStore, maintain
from cassandra_util_spark.streaming.ingest import (
    _advance_batch_hwm,
    _read_hwm,
    resolve_txn_app_id,
    run_name_for_batch,
)


def stream_corpus_ingest(
    stream: DataFrame,
    corpus_store: RunStore,
    index_store: RunStore,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 30,
    keep_expr: Optional[Callable[[DataFrame], DataFrame]] = None,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    hash_fn: str = "portable",
    available_now: bool = True,
    query_name: str = "corpus-ingest",
    txn_app_id: Optional[str] = None,
    maintain_every: Optional[int] = None,
    min_threshold: int = 4,
) -> StreamingQuery:
    """Run the admission pipeline over a document stream.

    ``corpus_store`` receives the admitted documents (plus ``writetime``
    = batch id); ``index_store`` receives one (id, digest, sig,
    writetime) row per admitted doc and must be keyed on ``('id',)``
    with writetime ``'writetime'``.  ``keep_expr(batch_df) -> DataFrame``
    replaces the default token-count gate when given.

    ``maintain_every=N`` compacts BOTH stores after every N-th
    micro-batch (STCS, threshold ``min_threshold``) — without it a
    long-running crawl accretes one run per batch per store and the
    per-batch index read degrades with run count, the exact failure mode
    ``stream_to_runstore`` documents.  Admission results are unaffected:
    compaction only folds runs, and since ids are unique across the
    stream the LWW fold is a pure concatenation.
    """
    if maintain_every is not None and maintain_every < 1:
        raise ValueError(f"maintain_every must be >= 1, got {maintain_every}")
    if index_store.meta.partition_keys != ("id",) or (
        index_store.meta.writetime_col != "writetime"
    ):
        raise ValueError(
            "corpus index stores are keyed on ('id',) with writetime "
            f"'writetime'; got keys={index_store.meta.partition_keys} "
            f"writetime={index_store.meta.writetime_col}"
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        app_id = txn_app_id or resolve_txn_app_id(checkpoint_dir, query_name)
        stored_app, hwm = _read_hwm(corpus_store)
        if stored_app is not None and stored_app != app_id:
            raise RuntimeError(
                f"corpus store {corpus_store.root} was written by stream "
                f"{stored_app!r}; this stream is {app_id!r} — refusing to "
                "compare batch ids across streams. Pass txn_app_id="
                f"{stored_app!r} to continue that sequence deliberately."
            )
        if batch_id <= hwm:
            return
        kept = keep_expr(batch_df) if keep_expr is not None else batch_df.filter(
            whitespace_token_count(F.col(text_col)) >= min_tokens
        )
        kept = exact_dedup(kept, id_col, [text_col])
        idx = None
        idx_runs = index_store.live_runs()
        if idx_runs:
            # the index is read as a RAW union of its live runs, not
            # through read_merged: ids are unique across the stream (the
            # module contract above — same-id re-crawls are
            # stream_lsh_index's LWW problem, not admission's), so the
            # general view's LWW window is a pure concatenation that
            # still paid a full index shuffle EVERY batch (r18).  The
            # raw read also lets each probe column-prune its own scan —
            # the digest anti-join reads one column, the sig probe two —
            # where the old persist() materialized every column once to
            # amortize the merge that no longer exists
            idx = spark.read.parquet(
                *(os.path.join(index_store.root, r) for r in idx_runs)
            )
            kept = (
                kept.withColumn("__digest", _digest_for(kept, [text_col]))
                .join(
                    # no distinct: digests are unique per admitted doc
                    # (exact dedup gates admission), and a left_anti join
                    # is insensitive to right-side duplicates anyway —
                    # the distinct was one more full index shuffle per
                    # batch (r18)
                    idx.select(F.col("digest").alias("__digest")),
                    "__digest",
                    "left_anti",
                )
                .drop("__digest")
            )
            # computed on the exact-surviving superset and reused below for
            # the index rows (dropped candidates filter out by the id join)
            sig_new = minhash_signatures(
                kept, id_col, text_col, n, num_perm, hash_fn
            ).localCheckpoint(eager=False)
            dup_ids = _lsh_probe_dup_ids(
                sig_new, idx.select("id", "sig"), num_perm, bands, threshold, hash_fn
            )
            kept = kept.join(dup_ids, F.col(id_col) == F.col("__dup_id"), "left_anti")
        else:
            sig_new = minhash_signatures(kept, id_col, text_col, n, num_perm, hash_fn)
        # freeze the survivors once: two store appends consume them, and the
        # lineage above reads the index store's CURRENT manifest, which the
        # second append is about to advance.  LAZY (r18): the corpus append
        # — the first consumer, a full write — materializes the pin inside
        # its own job, so the admission lineage still runs exactly once but
        # the eager pin's separate pass over the survivors (one extra
        # driver-blocking job + one extra read of the pinned blocks per
        # trigger) is gone; the index append reads the pinned blocks.
        kept = kept.localCheckpoint(eager=False)
        corpus_store.append_run(
            kept.withColumn("writetime", F.lit(batch_id).cast("long")),
            name=run_name_for_batch(batch_id),
        )
        idx_rows = (
            kept.select(
                F.col(id_col).alias("id"),
                _digest_for(kept, [text_col]).alias("digest"),
            )
            # LEFT join: sub-n-word docs have no signature but must still
            # hold their digest slot in the index
            .join(sig_new, "id", "left")
            .withColumn("writetime", F.lit(batch_id).cast("long"))
        )
        index_store.append_run(idx_rows, name=run_name_for_batch(batch_id))
        _advance_batch_hwm(corpus_store, batch_id, app_id)
        if maintain_every is not None and (batch_id + 1) % maintain_every == 0:
            for store in (corpus_store, index_store):
                maintain(
                    store,
                    spark,
                    min_threshold=min_threshold,
                    vacuum_min_age_s=0.0,
                )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_encode(
    stream: DataFrame,
    store: RunStore,
    checkpoint_dir: str,
    words: DataFrame,
    vocab: DataFrame,
    merges=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = -1,
    merge_batch: int = 16,
    oov: str = "raise",
    maintain_every: Optional[int] = None,
    min_threshold: int = 4,
    available_now: bool = True,
    query_name: str = "bpe-encode-ingest",
    txn_app_id: Optional[str] = None,
) -> StreamingQuery:
    """Tokenize arriving documents under a FROZEN vocabulary and append
    their token-id streams to a persisted RunStore — the streaming member
    of the tokenizer family (`streaming/ann.py` is the same pattern for
    PQ codes): production pipelines tokenize shard-by-shard as a crawl
    lands, they never re-encode history, and the tokenizer model (trained
    word table + merge list + id vocab) is trained once on a bootstrap
    corpus and held fixed — retraining changes every document's stream,
    so it is an offline rebuild by construction.

    Encoding is word-local under the frozen model, so the streamed store
    converges to byte-identical contents with one batch encode over the
    same rows regardless of batch boundaries (hash-certified:
    `bpe_streaming_encode` shares `bpe_encode_ids_corpus`'s oracle).
    Per batch: the shard's out-of-vocabulary words (if ``merges`` is
    given) segment via the in-order merge replay
    (:func:`~cassandra_util_spark.operators.bpe.segment_words` —
    vocabulary-sized, map-only folds), then
    :func:`~cassandra_util_spark.operators.bpe.bpe_encode_ids` assembles
    the shard's streams; symbols outside the id vocab (unseen characters)
    map to ``unk_id``, never dropped.  ``oov="bytes"`` (requires a
    byte-fallback vocabulary and no ``merges`` — the replay combo is
    rejected as in :func:`~cassandra_util_spark.operators.bpe.bpe_encode`)
    degrades words outside the frozen word table to their UTF-8 byte
    tokens inline — the streaming half of the r16 byte-fallback contract:
    new crawl encodes against the shipped artifact without a job kill.
    The transform is a pure function
    of (batch contents, frozen model), so a replayed batch re-derives the
    same run and the idempotent named append no-ops — the
    ``stream_to_runstore`` replay guard.

    ``store`` must key on ``(id_col,)`` with writetime ``'writetime'``:
    LWW keeps the newest stream per document across re-deliveries."""
    from cassandra_util_spark.operators.bpe import (
        bpe_encode_ids,
        byte_block_bounds,
        segment_words,
    )
    from cassandra_util_spark.streaming.ingest import stream_to_runstore

    if store.meta.partition_keys != (id_col,) or (
        store.meta.writetime_col != "writetime"
    ):
        raise ValueError(
            f"encode stores are keyed ({id_col!r},) with writetime "
            f"'writetime'; got keys={store.meta.partition_keys} "
            f"writetime={store.meta.writetime_col!r}"
        )
    if oov not in ("raise", "bytes"):
        raise ValueError(f"oov must be 'raise' or 'bytes', got {oov!r}")
    if oov == "bytes" and merges is not None:
        raise ValueError(
            "oov='bytes' with merges= is ambiguous — the merge replay "
            "already segments unseen words; pass the frozen word table "
            "alone for the byte-fallback shape"
        )
    words = words.select("word", "syms").localCheckpoint()
    # keep `kind` when present: bpe_encode_ids' oov='bytes' validation
    # reads the byte block from it
    vcols = ["sym", "id"] + (["kind"] if "kind" in vocab.columns else [])
    vocab = vocab.select(*vcols).localCheckpoint()
    byte_bounds = None
    if oov == "bytes":
        # fail-fast (ADVICE r16): run the byte-block/END contiguity
        # check against the checkpointed vocab NOW, matching the merges
        # check above — a vocab built without byte_fallback=True should
        # refuse at setup, not start successfully and die later as a
        # wrapped StreamingQueryException inside the first foreachBatch.
        # The bounds feed every batch's encode (the vocab is frozen), so
        # the per-trigger re-collect of the byte block is gone (r18)
        byte_bounds = byte_block_bounds(vocab)

    def encode_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        # Intra-batch dedup (the streaming/ann.py ADVICE-r8 contract):
        # writetime is the batch id, so two deliveries of the same doc_id
        # WITHIN one micro-batch would interleave into one garbled stream
        # in the per-id collect AND tie on writetime in the store's LWW
        # merge.  Collapse to one row per id first — lexicographic max of
        # the text is a stable pick independent of partition order.
        # NOTE (ADVICE r13): within one micro-batch there is NO version
        # order — the source hands us an unordered set, so "newest" is
        # undefined at this granularity and max(text) is an arbitrary but
        # deterministic tie-break, NOT a recency rule.  Across batches the
        # store's writetime LWW still picks the newest batch.  A source
        # that carries its own version/offset column should dedup on that
        # column upstream (max_by(text, version)) before reaching here.
        batch_df = batch_df.groupBy(id_col).agg(
            F.max(F.col(text_col)).alias(text_col)
        )
        # Per-batch work must be ∝ BATCH vocabulary, not the frozen global
        # table: restrict the segmentation join to the shard's distinct
        # words, and replay the merge folds only when the shard actually
        # carries out-of-vocabulary words (the common steady-state shard
        # has none, and the replay's composed folds + checkpoint jobs are
        # merge-list-sized — a per-trigger fixed cost worth one tiny
        # isEmpty probe on the anti-join to avoid).
        batch_vocab = batch_df.select(
            F.explode(_norm_tokens(F.col(text_col))).alias("word")
        ).distinct()
        seg = words.join(batch_vocab, "word", "left_semi")
        if merges is not None:
            unseen = batch_vocab.join(
                words.select("word"), "word", "left_anti"
            )
            if not unseen.isEmpty():
                seg = seg.unionByName(
                    segment_words(unseen, merges, batch=merge_batch)
                )
        return bpe_encode_ids(
            batch_df, id_col, text_col, seg, vocab, unk_id=unk_id, oov=oov,
            byte_bounds=byte_bounds,
        ).withColumn("writetime", F.lit(batch_id).cast("long"))

    return stream_to_runstore(
        stream,
        store,
        checkpoint_dir,
        maintain_every=maintain_every,
        min_threshold=min_threshold,
        available_now=available_now,
        query_name=query_name,
        txn_app_id=txn_app_id,
        transform=encode_batch,
    )


def _prior_max_bin_runs(store: RunStore, batch_id: int):
    """``(key_lower,)`` when ``store`` holds rows written BEFORE
    ``batch_id``, else None — the driver-side (stats-only, no scan)
    preamble of ``stream_windows``'s carry read.  ``key_lower`` is the
    global max bin across those runs from the per-run skip index, so the
    carry read prunes to the run(s) actually holding the boundary window;
    it degrades to None (unbounded read) when a run lacks bin stats —
    pruning is an optimization, never a correctness bet.  A run whose
    writetime-min equals ``batch_id`` is this batch's own run from a
    crashed attempt (every appended run carries one batch's constant
    writetime; compaction only ever folds hwm-passed batches, which are
    strictly older than a replaying one) and is excluded on both counts."""
    stats = store.run_stats()
    hi = None
    have_prior = False
    missing = False
    for r in store.live_runs():
        st = stats.get(r)
        wt = ((st or {}).get("columns") or {}).get("writetime")
        wt_min_usable = wt is not None and isinstance(wt.get("min"), int)
        if wt_min_usable and wt["min"] > batch_id - 1:
            continue  # this batch's own crashed-attempt run
        b = st if st is not None and st.get("column") == "bin" else None
        if b is not None and b.get("min") is None and b.get("max") is None:
            continue  # empty run (an empty micro-batch): no rows to read
        have_prior = True
        if not wt_min_usable or b is None or b.get("max") is None:
            # Unusable writetime stats (absent, or stringified by a
            # default=str json dump) mean the run COULD be this batch's
            # own crashed attempt: folding its bin max into the prune
            # bound while the writetime-bounded read then drops its rows
            # would return no prior rows and silently re-base bins at 0.
            # Treat the run as missing for key_lower — degrade to the
            # unbounded read, which the writetime extra_bound keeps
            # correct (ADVICE r16).
            missing = True
        elif hi is None or b["max"] > hi:
            hi = b["max"]
    if not have_prior:
        return None
    return (None if missing else hi,)


def _boundary_row(store: RunStore, spark, key_lower, batch_id: int):
    """The store's max-bin row as of the previous batch (the carry
    boundary), or None when the prior view is empty.

    When the per-run skip index pinned the max bin (``key_lower`` not
    None — every prior run had usable stats, so ``key_lower`` IS the
    global max), the row is read DIRECTLY: scan only the run(s) that may
    hold that bin, filter to it, and pick the newest writetime
    driver-side — one collect with no exchange, replacing the LWW window
    merge + TakeOrdered of the general read (r18).  The driver-side max
    is the merge's winner because the protocol yields one row per
    (bin, writetime): each batch appends one run under its batch id as
    the constant writetime, replays no-op, and compaction folds to
    per-bin LWW winners keeping original writetimes.  Degraded stats
    (``key_lower`` None) or an unexpectedly empty direct read fall back
    to the bounded LWW read — pruning stays an optimization, never a
    correctness bet."""
    if key_lower is not None:
        runs = store.prune_runs(key_lower, None)
        wt_keep = set(store.prune_runs(None, batch_id - 1, column="writetime"))
        runs = [r for r in runs if r in wt_keep]
        if runs:
            rows = (
                spark.read.parquet(
                    *(os.path.join(store.root, r) for r in runs)
                )
                .filter(
                    (F.col("bin") >= key_lower)
                    & (F.col("writetime") <= batch_id - 1)
                )
                .collect()
            )
            if rows:
                return max(rows, key=lambda r: r["writetime"])
    prior = store.read_merged(
        spark,
        key_lower=key_lower,
        extra_bounds={"writetime": (None, batch_id - 1)},
    )
    top = prior.orderBy(F.col("bin").desc()).limit(1).collect()
    return top[0] if top else None


def stream_windows(
    stream: DataFrame,
    store: RunStore,
    checkpoint_dir: str,
    capacity: int,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    maintain_every: Optional[int] = None,
    min_threshold: int = 4,
    available_now: bool = True,
    query_name: str = "window-ingest",
    txn_app_id: Optional[str] = None,
) -> StreamingQuery:
    """Materialize arriving encoded documents into fixed-``capacity``
    training windows appended to a persisted RunStore — the STREAMING
    member of the window family, closing the last batch/streaming
    asymmetry: `materialize_windows_incremental` proves the carry-forward
    protocol shard-by-shard in one job; this runs the SAME protocol one
    micro-batch at a time under the locked idempotent-ingest contract,
    so a 100 TB corpus windows as the crawl lands, with already-emitted
    full windows IMMUTABLE and per-batch cost ∝ the batch.

    The carry (the boundary partial window, ≤ ``capacity`` tokens with
    doc attribution) is NOT driver memory — it is reconstructed each
    batch FROM THE STORE's own max-bin row, read as of the previous
    batch (``read_merged(extra_bounds={'writetime': (None, batch_id-1)})``
    — a PRE-merge bound, so a crash-replayed batch that already published
    its run recomputes from the exact prior state and the named append
    no-ops; the protocol is restart-safe with zero extra state files).
    Each batch's run holds its full windows plus the new boundary
    partial; the superseded partial (same bin, older writetime) loses
    the store's LWW merge, so the read view is always a consistent
    window set — hash-certified against the one-shot
    `packed_training_windows` oracle by `windows_streaming_store`.

    Preconditions (the incremental protocol's, enforced fail-loud):
    ids must cast to non-negative bigints (the carry orders at negative
    ``__ord``), and batches must arrive in ascending id order — each
    batch's minimum id must exceed every carried document's (guarded
    with a one-row aggregate when a carry exists; a violation would
    silently re-pack history).  Intra-batch duplicate deliveries of one
    id collapse to the lexicographically greatest stream first — the
    same arbitrary-but-deterministic tie-break as ``stream_encode``
    (within one micro-batch there is no version order).

    ``store`` must key on ``('bin',)`` with writetime ``'writetime'``."""
    from cassandra_util_spark.operators.packing import (
        _windows_shard_step,
        carry_from_window_row,
    )
    from cassandra_util_spark.streaming.ingest import stream_to_runstore

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if store.meta.partition_keys != ("bin",) or (
        store.meta.writetime_col != "writetime"
    ):
        raise ValueError(
            "window stores are keyed ('bin',) with writetime "
            f"'writetime'; got keys={store.meta.partition_keys} "
            f"writetime={store.meta.writetime_col!r}"
        )

    def window_batch(batch_df: DataFrame, batch_id: int) -> DataFrame:
        spark = batch_df.sparkSession
        id_type = dict(batch_df.dtypes)[id_col]
        elem = batch_df.schema[ids_col].dataType.elementType.simpleString()
        # intra-batch dedup, NOT pinned here: the shard step's input
        # checkpoint materializes it exactly once (r18 — the r17 eager
        # batch pin double-cached the same rows as the shard step's own
        # pin and leaked checkpoint blocks for the stream's lifetime;
        # ADVICE r17), and the append-order guard's min-id now rides the
        # shard step's strategy-count job instead of running its own
        batch_df = batch_df.groupBy(id_col).agg(
            F.max(F.col(ids_col)).alias(ids_col)
        )
        carry: list = []
        bin_base = 0
        hi: "int | None" = None  # highest already-windowed doc id
        prior_runs = _prior_max_bin_runs(store, batch_id)
        if prior_runs is not None:
            # the stats-pinned boundary read: one bounded collect, no
            # exchange on the fast path — per-batch carry cost is
            # O(capacity), NOT an LWW merge of the whole store
            p = _boundary_row(store, spark, prior_runs[0], batch_id)
            if p is not None:
                # the max-bin row's spans hold the globally LAST document
                # whether the boundary tiled exactly or not — the guard
                # below must fire in BOTH cases (review r15: a full
                # boundary used to skip it, so an out-of-order batch one
                # token after an exact tiling corrupted silently)
                hi = max(int(s["doc"]) for s in p["doc_spans"])
                if int(p["n_tokens"]) < capacity:
                    bin_base = int(p["bin"])
                    carry = carry_from_window_row(p)
                else:
                    bin_base = int(p["bin"]) + 1
        win, _, _, mn = _windows_shard_step(
            spark, carry, batch_df, id_col, ids_col, capacity, id_type, elem,
            with_min_id=True,
        )
        if hi is not None and mn is not None and mn <= hi:
            # append-order guard: a batch id at or below an already-
            # windowed doc's would re-pack emitted history, not extend
            # it.  Checked AFTER the shard step computes (its fused
            # aggregate supplies the min id) but BEFORE anything is
            # appended — a violating batch still fails loudly with
            # nothing published, it just wastes its own windowing work
            raise ValueError(
                f"stream_windows: batch {batch_id} carries id {mn} ≤ "
                f"already-windowed id {hi} — batches must arrive in "
                "ascending id order (the carry-forward precondition); "
                "re-deliveries of windowed documents cannot be "
                "re-packed without rewriting emitted windows"
            )
        return win.select(
            (F.col("bin") + F.lit(bin_base)).cast("bigint").alias("bin"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "token_ids",
            "doc_spans",
        ).withColumn("writetime", F.lit(batch_id).cast("long"))

    return stream_to_runstore(
        stream,
        store,
        checkpoint_dir,
        maintain_every=maintain_every,
        min_threshold=min_threshold,
        available_now=available_now,
        query_name=query_name,
        txn_app_id=txn_app_id,
        transform=window_batch,
    )
