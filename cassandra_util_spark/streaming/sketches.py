"""Streaming sketch maintenance: fold each micro-batch's Count-Min / HLL
sketch into a persisted sketch table — the mergeability story of
``operators.sketches`` made real on a stream.

This is the 100 TB frequency/cardinality pattern: the raw stream is never
re-scanned; each micro-batch contributes a bounded sketch (≤ depth × width
rows for CM, ≤ 2^p for HLL) that MERGES algebraically into the persisted
state (counter addition for CM, register max for HLL — the same laws the
batch operators' union-merge tests pin).  Downstream consumers read the
persisted table for point estimates (``count_min_query``), heavy-hitter
gates, join-size estimates (``cm_join_size_estimate``/``plan_join``), or
cardinality (``hll_estimate``) without touching events at all.

Exactly-once: the applied micro-batch id rides in the snapshot pointer
write (``SnapshotStore.commit(tag="app_id:batch_id")`` — the same protocol
as ``streaming_apply_changelog`` and the run store's ``_INGEST_HWM``), so
an at-least-once ``foreachBatch`` replay after a crash skips instead of
double-counting.  Double-counting is the failure mode that matters here:
CM counters are additive, so a replayed merge would silently inflate every
estimate — there is no LWW to absorb it.

The tag carries a transaction identity (Delta's ``txnAppId`` +
``txnVersion`` pattern; by default the checkpoint's persisted query id) so
batch ids are only ever compared within one logical stream.  A fresh
checkpoint (ids reset to 0) against an existing store FAILS LOUDLY —
without the identity it would silently freeze the sketch (every batch
reads as already-applied).  A foreign or unparsable tag likewise raises
instead of degrading to "never applied", which would re-merge and
double-count CM counters on replay (ADVICE r5).

Store growth: each micro-batch commits a new version; after a successful
commit the store is vacuumed down to ``retain_versions`` so a long-running
stream's version count — not just its per-batch compute — stays bounded.

Reference anchor: the reference keeps per-sstable key-count estimates
maintained incrementally as sstables flush (SSTableReader estimated keys);
this generalizes that to full frequency/cardinality sketches maintained
per micro-batch flush.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from typing import Optional

from cassandra_util_spark.operators.sketches import count_min_build, hll_build
from cassandra_util_spark.sources.snapshots import SnapshotStore
from cassandra_util_spark.streaming.ingest import resolve_txn_app_id


def _pin_sampler_identity(store: SnapshotStore, identity: dict) -> None:
    """Record the resolved sampler identity in the store root (sidecar
    ``_SAMPLER``, atomic write like ``_META``) and fail loudly when an
    existing store was built under a different one.

    Why (ADVICE r10): the seed default became per-mode in round 10 —
    ``'wbk'`` for weighted stores, ``'bk'`` for uniform.  A weighted store
    built under the OLD default (``'bk'`` even with ``weight_col`` set)
    would otherwise silently merge ``'wbk'``-seeded batch deltas into
    ``'bk'``-seeded persisted state: mixed-seed priorities are not
    comparable, so the merged "sample" is statistically invalid with no
    error.  The same applies to any drift in hash function, key column,
    weight column, or k across the store's life.

    Migration for pre-change stores (versions exist, no ``_SAMPLER``):
    the identity is adopted and pinned with a warning.  The sidecar only
    prevents FUTURE mixing — it cannot detect whether mixed-seed batches
    were already merged before identity recording existed, so the warning
    tells the operator to rebuild; adoption merely stops the bleeding.

    Concurrency (ADVICE r11, mechanism revised per ADVICE r12): creation
    is first-writer-wins ATOMIC — ``os.open(path, O_CREAT|O_EXCL)``
    fails with ``FileExistsError`` instead of overwriting, and the loser
    re-reads the winner's identity and runs the mismatch check.  The old
    check-then-``os.replace`` form let two streams first-using a fresh
    store both observe "no sidecar" and pin DIFFERENT identities, last
    write silently winning — exactly the corruption the sidecar exists
    to prevent.  ``O_EXCL`` rather than the previous ``os.link`` trick:
    hard links are unsupported on some filesystems (certain NFS/FUSE/
    object-store mounts) while exclusive create is universal.  The one
    property ``os.link`` had that ``O_EXCL`` lacks — the sidecar
    appearing with its content already complete — is recovered on the
    read side: the payload lands in a single small ``write`` and a
    reader that catches the in-flight window (``JSONDecodeError``)
    simply re-reads, bounded so a genuinely corrupt sidecar still
    raises."""
    import json
    import time as _time
    import warnings as _warnings

    path = os.path.join(store.root, "_SAMPLER")
    decode_retries = 0
    while True:
        try:
            with open(path) as f:
                existing = json.load(f)
        except FileNotFoundError:
            existing = None
        except json.JSONDecodeError:
            # a concurrent winner created the sidecar but its single
            # small write is still in flight; re-read after a beat
            decode_retries += 1
            if decode_retries > 100:
                raise
            _time.sleep(0.01)
            continue
        if existing is not None:
            if existing != identity:
                diff = {
                    key: (existing.get(key), identity.get(key))
                    for key in sorted(set(existing) | set(identity))
                    if existing.get(key) != identity.get(key)
                }
                raise RuntimeError(
                    f"sketch store {store.root} was built with a different "
                    f"sampler identity; refusing to merge incompatible "
                    f"priorities (stored vs requested): {diff}"
                )
            return
        if store.current_version() is not None:
            _warnings.warn(
                f"sketch store {store.root} predates sampler-identity "
                f"recording; adopting and pinning {identity}. This pin "
                "prevents future seed mixing but CANNOT detect past "
                "mixing: if this store may have merged batches under "
                "more than one identity before recording existed (in "
                "particular a WEIGHTED store continued across the "
                "per-mode seed-default change), REBUILD it from source — "
                "an already-mixed sample is statistically invalid and "
                "nothing can repair it in place. To continue a "
                "pre-change weighted store that was consistently built "
                "with seed='bk', pass seed='bk' explicitly.",
                stacklevel=3,
            )
        try:
            # atomic exclusive create; EEXIST = lost the race
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue  # re-read the winner's identity and mismatch-check it
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(identity, sort_keys=True))  # one small write
        return


def _last_applied(store: SnapshotStore, app_id: str) -> int:
    """Batch id of the last commit by the stream ``app_id`` (-1 if none).

    Raises on an identity mismatch or an unparsable tag: both mean the
    store's version history is NOT this stream's — skipping would freeze
    the sketch, re-merging would double-count, and only failing is safe.
    """
    tag = store.current_tag()
    if tag is None:
        return -1
    stored_app, sep, version = tag.rpartition(":")
    if sep and stored_app != app_id:
        raise RuntimeError(
            f"sketch store {store.root} is maintained by stream "
            f"{stored_app!r}; this stream is {app_id!r} — refusing to "
            "compare batch ids across streams. Pass txn_app_id="
            f"{stored_app!r} to continue that sequence deliberately."
        )
    try:
        return int(version)
    except ValueError:
        raise RuntimeError(
            f"sketch store {store.root} has a foreign snapshot tag "
            f"{tag!r} — not this module's 'app_id:batch_id' protocol; "
            "treating it as 'never applied' would double-count on replay."
        ) from None


def stream_count_min_to_store(
    stream: DataFrame,
    store: SnapshotStore,
    checkpoint_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: str = "cm",
    hash_fn: str = "portable",
    available_now: bool = True,
    query_name: str = "cm-sketch-ingest",
    txn_app_id: Optional[str] = None,
    retain_versions: int = 2,
) -> StreamingQuery:
    """Maintain a persisted Count-Min sketch table over a stream.

    Per micro-batch: one bounded sketch build over the batch, one
    (row, idx) counter-addition merge against the persisted table (itself
    ≤ depth × width rows — both merge inputs are sketch-sized, so the
    per-batch cost is independent of history length), one atomic snapshot
    commit carrying the batch id.  The persisted sketch after draining N
    batches is IDENTICAL to ``count_min_build`` over their union — counter
    addition is exactly how CM composes.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        app_id = txn_app_id or resolve_txn_app_id(checkpoint_dir, query_name)
        if batch_id <= _last_applied(store, app_id):
            return  # replay: merging again would double-count every key
        delta = count_min_build(batch_df, key_col, depth, width, seed, hash_fn)
        current = store.current_path()
        if current is not None:
            state = batch_df.sparkSession.read.parquet(current)
            delta = (
                state.unionByName(delta)
                .groupBy("row", "idx")
                .agg(F.sum("c").alias("c"))
            )
        store.commit(delta, tag=f"{app_id}:{batch_id}")
        store.vacuum(keep_last=retain_versions)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hll_to_store(
    stream: DataFrame,
    store: SnapshotStore,
    checkpoint_dir: str,
    key_col: str,
    p: int = 9,
    seed: str = "hll",
    available_now: bool = True,
    query_name: str = "hll-sketch-ingest",
    txn_app_id: Optional[str] = None,
    retain_versions: int = 2,
) -> StreamingQuery:
    """Maintain a persisted HLL register table over a stream.

    Register MAX is idempotent, so unlike CM this merge would tolerate a
    replayed batch — the tag skip is kept anyway for one uniform protocol
    (and to spare the no-op snapshot commit).
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        app_id = txn_app_id or resolve_txn_app_id(checkpoint_dir, query_name)
        if batch_id <= _last_applied(store, app_id):
            return
        delta = hll_build(batch_df, key_col, p, seed)
        current = store.current_path()
        if current is not None:
            state = batch_df.sparkSession.read.parquet(current)
            delta = (
                state.unionByName(delta)
                .groupBy("bucket")
                .agg(F.max("register").alias("register"))
            )
        store.commit(delta, tag=f"{app_id}:{batch_id}")
        store.vacuum(keep_last=retain_versions)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_bottomk_to_store(
    stream: DataFrame,
    store: SnapshotStore,
    checkpoint_dir: str,
    key_col: str,
    k: int = 256,
    payload: tuple = (),
    seed: Optional[str] = None,
    hash_fn: str = "portable",
    weight_col: Optional[str] = None,
    weight_form: str = "replica",
    available_now: bool = True,
    query_name: str = "bottomk-sketch-ingest",
    txn_app_id: Optional[str] = None,
    retain_versions: int = 2,
) -> StreamingQuery:
    """Maintain a persisted bottom-k (KMV) row sample over a stream — the
    distribution-shape member of the streaming sketch family.

    ``weight_col`` switches the per-batch sample (and the store's merge)
    to the WEIGHTED form (:func:`weighted_bottomk_sample` — exact integer
    Efraimidis-Spirakis priorities): a crawl stream maintaining a
    length- or quality-weighted training sample without ever rescanning
    admitted history.  Both priorities are pure per-key functions, so the
    k-vs-k merge closure is identical.

    ``weight_form="logcost"`` swaps the per-batch sampler to
    :func:`weighted_bottomk_sample_logcost` — the same E-S distribution
    at O(log²w) per row, for realistic token-count weights (10^4-10^6)
    that the replica form's guard rejects.  The two forms draw from
    DIFFERENT priority streams (replica: min of w keyed hash words;
    logcost: binary-block sqrt chain), so the form is part of the pinned
    sampler identity and a store never mixes them.

    Per micro-batch: one TakeOrderedAndProject over the batch (per-partition
    O(k) heaps), one k-vs-k merge against the persisted sample (both inputs
    sketch-sized — per-batch cost independent of history), one atomic
    snapshot commit.  Bottom-k's merge is idempotent (dropDuplicates + keep
    the k smallest absorbs a replayed batch, like HLL's register max), but
    the tag skip is kept for the one uniform exactly-once protocol.  The
    drained store is IDENTICAL to :func:`bottomk_sample` over the batches'
    union — the closure property `bottomk_shard_merge` hash-certifies.

    ``seed=None`` (the default) resolves per mode to the matching batch
    sampler's own default — ``'wbk'`` when ``weight_col`` is set
    (:func:`weighted_bottomk_sample`), else ``'bk'``
    (:func:`bottomk_sample`) — so a store built with defaults hash-matches
    a batch run with defaults in BOTH modes (ADVICE r9: a fixed ``'bk'``
    silently broke the weighted closure unless callers passed the seed).

    The resolved identity (seed, mode, hash, key/weight columns, k) is
    pinned in the store's ``_SAMPLER`` sidecar on first use and re-checked
    every batch: continuing a store under a DIFFERENT identity raises
    instead of silently merging incomparable priorities (ADVICE r10 — see
    :func:`_pin_sampler_identity` for the pre-change-store migration)."""
    from cassandra_util_spark.operators.sketches import (
        bottomk_merge,
        bottomk_sample,
        weighted_bottomk_sample,
        weighted_bottomk_sample_logcost,
    )

    if weight_form not in ("replica", "logcost"):
        raise ValueError(f"unknown weight_form {weight_form!r}")
    if weight_form == "logcost" and weight_col is None:
        raise ValueError("weight_form='logcost' requires weight_col")
    if seed is None:
        seed = "wbk" if weight_col is not None else "bk"
    if weight_col is None:
        mode = "uniform"
    elif weight_form == "logcost":
        mode = "weighted_logcost"
    else:
        mode = "weighted"
    sampler_identity = {
        "kind": "bottomk",
        "mode": mode,
        "seed": seed,
        "hash_fn": hash_fn if weight_col is None else None,
        "key_col": key_col,
        "weight_col": weight_col,
        "k": k,
    }

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        app_id = txn_app_id or resolve_txn_app_id(checkpoint_dir, query_name)
        _pin_sampler_identity(store, sampler_identity)
        if batch_id <= _last_applied(store, app_id):
            return
        if weight_col is not None:
            sampler = (
                weighted_bottomk_sample_logcost
                if weight_form == "logcost"
                else weighted_bottomk_sample
            )
            delta = sampler(batch_df, key_col, weight_col, k, payload, seed)
            pri = "pri"
        else:
            delta = bottomk_sample(batch_df, key_col, k, payload, seed, hash_fn)
            pri = "h"
        current = store.current_path()
        if current is not None:
            state = batch_df.sparkSession.read.parquet(current)
            delta = bottomk_merge(
                state, delta, k=k, key_col=key_col, priority_col=pri
            )
        store.commit(delta, tag=f"{app_id}:{batch_id}")
        store.vacuum(keep_last=retain_versions)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
