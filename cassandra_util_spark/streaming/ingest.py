"""Streaming ingestion into the LSM run store — the memtable-flush analog.

Cassandra's write path accumulates writes in a memtable and flushes it as a
new SSTable; compaction later folds overlapping SSTables together, and that
is where the reference's deleting strategy filters rows
(DeletingCompactionStrategy.java:102-126).  The Structured Streaming
re-expression: each micro-batch IS a flush — ``foreachBatch`` appends the
batch as one new L0 run (cheap, no merge; exactly Cassandra's
flush-then-compact cost model), and the same ``maintain`` loop the batch
side uses runs every N batches with the retention keep-expression applied
during merges.

Delivery semantics: ``foreachBatch`` is at-least-once on recovery — after a
crash the last micro-batch can replay with the SAME batch id.  Runs are
named by batch id (``b<id>``), and :meth:`RunStore.append_run` treats an
already-published name as a no-op and overwrites a half-written directory
from a crashed attempt.  Manifest membership alone is NOT a sufficient
replay guard, though: once an interleaved ``maintain`` cycle COMPACTS
``b<id>`` away, the name leaves the live manifest, and a replayed batch
would re-append it — resurrecting rows the in-merge ``keep_expr`` already
convicted.  Applied batch ids are therefore tracked independently of the
manifest by a high-water-mark file (``_INGEST_HWM``, atomic-rename updated
immediately after the run publishes, the same tag discipline as
``streaming_apply_changelog``); batches at or below it are skipped, so the
store converges to exactly-once run content across compaction boundaries.

Batch ids are only meaningful WITHIN one logical stream: a restart from a
FRESH checkpoint resets ids to 0, and a bare ``batch_id <= hwm`` guard
would then silently no-op every batch — data loss, not idempotence.  The
HWM therefore records a transaction identity alongside the id (Delta's
``txnAppId`` + ``txnVersion`` pattern): by default the streaming query id
Spark persists in the checkpoint's ``metadata`` file, which is stable
across restarts of the same checkpoint and regenerates exactly when the
checkpoint is wiped.  An identity mismatch FAILS LOUDLY instead of
skipping.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from cassandra_util_spark.sources.runs import RunStore, maintain


def run_name_for_batch(batch_id: int) -> str:
    """Deterministic run name for a micro-batch — the idempotence key."""
    return f"b{batch_id:010d}"


def resolve_txn_app_id(checkpoint_dir: str, fallback: str) -> str:
    """Stable identity for the logical stream writing through a checkpoint.

    Structured Streaming persists the query id in ``<checkpoint>/metadata``
    (JSON, key ``id``) at start; it survives restarts of the same
    checkpoint and is regenerated iff the checkpoint is wiped or replaced —
    exactly the lifetime a replay guard's identity needs.  Resolved lazily
    INSIDE the first micro-batch (the file exists by then).  ``fallback``
    covers non-local checkpoints this process can't read directly.
    """
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            qid = json.load(f).get("id")
        if qid:
            return str(qid)
    except (OSError, ValueError):
        pass
    return fallback


def _hwm_path(store: RunStore) -> str:
    return os.path.join(store.root, "_INGEST_HWM")


def _read_hwm(store: RunStore) -> Tuple[Optional[str], int]:
    """(txn_app_id, batch hwm) from the store; (None, -1) if absent.

    Legacy single-line files (pre-identity) parse as (None, hwm) — the
    identity is adopted on the next advance.
    """
    try:
        with open(_hwm_path(store)) as f:
            content = f.read().strip()
    except FileNotFoundError:
        return None, -1
    parts = content.split("\n")
    try:
        if len(parts) >= 2:
            return parts[0] or None, int(parts[1])
        return None, int(parts[0])
    except ValueError:
        return None, -1


def applied_batch_hwm(store: RunStore) -> int:
    """Highest micro-batch id already applied to ``store`` (-1 if none)."""
    return _read_hwm(store)[1]


def applied_txn_app_id(store: RunStore) -> Optional[str]:
    """Transaction identity recorded with the HWM (None if legacy/absent)."""
    return _read_hwm(store)[0]


def _advance_batch_hwm(store: RunStore, batch_id: int, app_id: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=store.root, prefix="_HWM.")
    with os.fdopen(fd, "w") as f:
        f.write(f"{app_id}\n{batch_id}")
    os.replace(tmp, _hwm_path(store))  # atomic on POSIX


def stream_to_runstore(
    stream: DataFrame,
    store: RunStore,
    checkpoint_dir: str,
    maintain_every: Optional[int] = None,
    keep_expr: Optional[Callable[[DataFrame], DataFrame]] = None,
    strategy: str = "stcs",
    min_threshold: int = 4,
    run_target_bytes: int = 128 << 20,
    available_now: bool = True,
    query_name: str = "runstore-ingest",
    txn_app_id: Optional[str] = None,
    time_col: Optional[str] = None,
    window_us: int = 86_400_000_000,
    retention_us: Optional[int] = None,
    transform: Optional[Callable[[DataFrame, int], DataFrame]] = None,
) -> StreamingQuery:
    """Continuously flush a stream into ``store`` as L0 runs.

    ``transform(batch_df, batch_id)``, when given, maps each micro-batch
    BEFORE it is appended — inside ``foreachBatch`` the batch is a plain
    DataFrame, so aggregations are allowed (the hook that lets derived
    tables — signatures, fingerprints, per-key rollups — ride this
    function's replay guard and maintenance cadence instead of
    re-implementing them).  The transform must be deterministic per
    (batch contents, batch_id): a replayed batch re-derives the same run,
    which the idempotent named append then no-ops.

    ``strategy="twcs"`` (requires ``time_col``) is the time-series
    production shape: maintenance compacts each closed time window with
    its contemporaries, and with ``retention_us`` set the expiry cutoff
    TRACKS EVENT TIME — each cycle computes ``max(time_col over run
    stats) − retention_us`` from the per-run skip index (driver-side
    metadata, no scan) and drops fully-aged windows manifest-only.  The
    whole retention life-cycle of an old window is therefore one pointer
    swap, never a rewrite — Cassandra's TWCS + fully-expired-sstable drop
    under the reference's deleting wrapper.

    ``txn_app_id`` names the logical stream for the replay guard (default:
    the checkpoint's persisted query id via :func:`resolve_txn_app_id`).
    Pass it explicitly to let a REPLACEMENT stream (fresh checkpoint)
    intentionally continue an existing store's id sequence; otherwise a
    fresh checkpoint against a written store raises instead of silently
    skipping every batch.

    ``maintain_every=N`` interleaves a maintenance cycle after every N-th
    micro-batch (strategy/threshold/target forwarded to
    :func:`~cassandra_util_spark.sources.runs.maintain`, with ``keep_expr``
    as the in-merge retention hook) — write amplification happens in the
    background cadence the operator chose, never on the ingest hot path's
    every batch.  ``available_now=True`` drains what exists then stops (the
    test/backfill trigger); ``False`` runs continuously.

    Scale shape: the per-batch work is one clustered parquet write plus a
    column-pruned stats read-back — no merge, no read of existing runs.
    Compaction cost is bounded per cycle by the strategy's plan (one
    bucket / one victim job at a time), so ingest latency stays flat as
    the store grows.
    """
    if maintain_every is not None and maintain_every < 1:
        raise ValueError(f"maintain_every must be >= 1, got {maintain_every}")
    if strategy == "twcs" and time_col is None:
        raise ValueError("strategy='twcs' requires time_col")

    def _event_time_cutoff() -> Optional[int]:
        if retention_us is None:
            return None
        highs = [
            s["max"]
            for s in (
                (st.get("columns") or {}).get(time_col)
                for st in store.run_stats().values()
            )
            if s is not None and isinstance(s.get("max"), int)
        ]
        return max(highs) - retention_us if highs else None

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        app_id = txn_app_id or resolve_txn_app_id(checkpoint_dir, query_name)
        stored_app, hwm = _read_hwm(store)
        if stored_app is not None and stored_app != app_id:
            # a DIFFERENT stream's ids are incomparable with ours — batch 0
            # of a fresh checkpoint would read as "already applied" and the
            # guard below would silently drop every batch (ADVICE r5)
            raise RuntimeError(
                f"run store {store.root} was written by stream "
                f"{stored_app!r}; this stream is {app_id!r} — refusing to "
                "compare batch ids across streams. Pass txn_app_id="
                f"{stored_app!r} to continue that sequence deliberately."
            )
        if batch_id <= hwm:
            # replay of an already-applied batch whose run compaction may
            # have folded away — re-appending would resurrect convicted rows
            return
        if transform is not None:
            batch_df = transform(batch_df, batch_id)
        store.append_run(batch_df, name=run_name_for_batch(batch_id))
        # advance the mark BEFORE maintenance: a crash between append and
        # this write replays into append_run's manifest no-op (the run is
        # still live — maintenance below hasn't run); a crash after it
        # skips the replay outright, compacted or not
        _advance_batch_hwm(store, batch_id, app_id)
        if maintain_every is not None and (batch_id + 1) % maintain_every == 0:
            maintain(
                store,
                batch_df.sparkSession,
                keep_expr=keep_expr,
                strategy=strategy,
                min_threshold=min_threshold,
                run_target_bytes=run_target_bytes,
                vacuum_min_age_s=0.0,
                time_col=time_col,
                window_us=window_us,
                expire_before=_event_time_cutoff(),
            )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_counter_deltas(
    stream: DataFrame,
    counters,
    checkpoint_dir: str,
    compact_every: Optional[int] = None,
    available_now: bool = True,
    query_name: str = "counter-delta-ingest",
    txn_app_id: Optional[str] = None,
    transform=None,
) -> StreamingQuery:
    """Continuously fold a stream of counter INCREMENTS into a
    :class:`~cassandra_util_spark.operators.counters.CounterStore`.

    Each micro-batch appends one additive delta run — the streaming face
    of the multi-writer counter path (reference: Cassandra counter batches
    ship deltas merged server-side, CQLBatch.scala:284-336; here the merge
    happens at read/compact time).  ``transform(batch_df, batch_id)``, when
    given, derives the increments from the raw batch (the
    :func:`stream_to_runstore` hook, same contract: a pure function of the
    batch content and parameters, so a replayed batch re-derives the same
    delta).  Otherwise the batch DataFrame must already carry
    the store's key and counter columns (pre-aggregate in the stream if
    the raw events need rolling up first).

    Exactly-once under at-least-once replay uses BOTH run-store guards:
    the run name is the batch id (an in-manifest replay is append_run's
    no-op) and the ``_INGEST_HWM`` (txn identity + batch id, same protocol
    as :func:`stream_to_runstore`) skips replays whose run a compaction
    already FOLDED AWAY — for counters that replay would not merely
    resurrect rows, it would double-count every increment in the batch,
    the failure additive state cannot absorb.

    ``compact_every=N`` folds the live delta runs after every N-th batch;
    addition's associativity makes the fold invisible to ``totals()``, so
    the cadence is purely a read-amplification knob.
    """
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, got {compact_every}")
    store = counters.store

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        app_id = txn_app_id or resolve_txn_app_id(checkpoint_dir, query_name)
        stored_app, hwm = _read_hwm(store)
        if stored_app is not None and stored_app != app_id:
            raise RuntimeError(
                f"counter store {store.root} was written by stream "
                f"{stored_app!r}; this stream is {app_id!r} — refusing to "
                "compare batch ids across streams. Pass txn_app_id="
                f"{stored_app!r} to continue that sequence deliberately."
            )
        if batch_id <= hwm:
            return  # replay after compaction: appending would double-count
        if transform is not None:
            batch_df = transform(batch_df, batch_id)
        counters.append_increments(batch_df, name=run_name_for_batch(batch_id))
        _advance_batch_hwm(store, batch_id, app_id)
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            counters.compact(batch_df.sparkSession)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
