"""LSM-style run store: overlapping sorted runs + size-tiered compaction.

The reference's retention engine runs INSIDE a real compaction strategy —
``DeletingCompactionStrategy`` wraps an underlying strategy (size-tiered by
default) and filters rows while that strategy merges overlapping SSTables
(DeletingCompactionStrategy.java:102-126 builds the scanner list the
underlying strategy chose).  ``SnapshotStore`` models the atomic-swap side
of that world; this module models the other half: a table as a SET of
overlapping runs, readable without merging eagerly, with a maintenance
``compact()`` that applies Cassandra's size-tiered bucketing
(SizeTieredCompactionStrategy semantics: bucket runs of similar size, merge
buckets that reach ``min_threshold``) — and optionally the retention
filter, which is exactly where the reference hooks its convictors.

Scale notes: planning is O(#runs) driver-side file metadata — never data.
A merge reads only the bucket's runs (multi-file scan) and shuffles once on
the primary key (the LWW window).  Readers always see a consistent run set:
the live-run manifest swaps atomically via the same rename protocol as
``_CURRENT``.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from cassandra_util_spark.core.table import KeyedTable, TableMeta


def size_tiered_plan(
    run_sizes: dict[str, int],
    min_threshold: int = 4,
    max_threshold: int = 32,
    bucket_low: float = 0.5,
    bucket_high: float = 1.5,
) -> list[list[str]]:
    """Cassandra STCS bucketing over (run → size-bytes): sort by size, grow
    a bucket while each next run is within ``[avg*bucket_low,
    avg*bucket_high]`` of the bucket's running average; buckets with at
    least ``min_threshold`` members become merge jobs, capped at
    ``max_threshold`` runs per job (largest buckets of small files first —
    the hottest write-amplification debt).

    Pure metadata arithmetic — deterministic, testable without Spark.
    """
    if min_threshold < 2:
        raise ValueError(f"min_threshold must be >= 2, got {min_threshold}")
    ordered = sorted(run_sizes.items(), key=lambda kv: (kv[1], kv[0]))
    buckets: list[tuple[list[str], float]] = []
    for name, size in ordered:
        if buckets:
            members, avg = buckets[-1]
            if avg * bucket_low <= size <= avg * bucket_high:
                members.append(name)
                buckets[-1] = (members, (avg * (len(members) - 1) + size) / len(members))
                continue
        buckets.append(([name], float(size)))
    jobs = [m for m, _ in buckets if len(m) >= min_threshold]
    # smallest-size buckets first: most files per byte merged
    return [m[:max_threshold] for m in jobs]


class RunStore:
    """A table as a set of overlapping parquet runs with an atomic live-run
    manifest.  ``append_run`` is the write path (cheap, no merge);
    ``read_merged`` is the query view (LWW across live runs); ``compact``
    is the maintenance loop."""

    def __init__(self, root: str, meta: TableMeta) -> None:
        self.root = root
        self.meta = meta
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "_RUNS")

    def live_runs(self) -> list[str]:
        try:
            with open(self._manifest) as f:
                return [ln for ln in f.read().split("\n") if ln]
        except FileNotFoundError:
            return []

    def _swap_manifest(self, runs: list[str]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_RUNS.")
        with os.fdopen(fd, "w") as f:
            f.write("\n".join(runs))
        os.replace(tmp, self._manifest)  # atomic on POSIX

    def _next_run(self) -> str:
        existing = [
            d for d in os.listdir(self.root) if d.startswith("r") and d[1:].isdigit()
        ]
        n = max((int(d[1:]) for d in existing), default=0) + 1
        return f"r{n:05d}"

    def run_sizes(self) -> dict[str, int]:
        out = {}
        for r in self.live_runs():
            total = 0
            d = os.path.join(self.root, r)
            for fn in os.listdir(d):
                if fn.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(d, fn))
            out[r] = total
        return out

    def append_run(self, df: DataFrame) -> str:
        """Write a new run (clustered by the key layout) and publish it.
        The write is invisible until the manifest swap — a failed job
        leaves a dead directory, never a half-visible run."""
        run = self._next_run()
        KeyedTable(df, self.meta).clustered().write.parquet(
            os.path.join(self.root, run)
        )
        self._swap_manifest([*self.live_runs(), run])
        return run

    def read_merged(
        self, spark: SparkSession, allow_schema_evolution: bool = False
    ) -> DataFrame:
        """The table view: LWW across all live runs (newest writetime per
        key; the lazy merge every LSM read path performs).
        ``allow_schema_evolution``: runs written before an ALTER-style
        column addition read with nulls for the new column."""
        from cassandra_util_spark.operators.merge import merge_snapshots

        runs = self.live_runs()
        if not runs:
            raise ValueError(f"run store at {self.root} has no runs")
        dfs = [spark.read.parquet(os.path.join(self.root, r)) for r in runs]
        return merge_snapshots(
            dfs, self.meta, allow_schema_evolution=allow_schema_evolution
        )

    def compact(
        self,
        spark: SparkSession,
        min_threshold: int = 4,
        max_threshold: int = 32,
        keep_expr: Optional[Callable[[DataFrame], DataFrame]] = None,
    ) -> list[str]:
        """One round of size-tiered compaction: merge each planned bucket
        into a single run (LWW winners only) and atomically replace the
        inputs in the manifest.  ``keep_expr`` is the retention hook — the
        deleting-compaction integration point: rows it filters out vanish
        from the merged run exactly as the reference's convictors drop rows
        during the underlying strategy's merge.

        Returns the new run names (empty when no bucket qualifies).
        The read view is invariant under compaction (minus convicted rows).
        """
        from cassandra_util_spark.operators.merge import merge_snapshots

        plan = size_tiered_plan(
            self.run_sizes(), min_threshold=min_threshold, max_threshold=max_threshold
        )
        new_runs: list[str] = []
        for bucket in plan:
            dfs = [spark.read.parquet(os.path.join(self.root, r)) for r in bucket]
            merged = merge_snapshots(dfs, self.meta, allow_schema_evolution=True)
            if keep_expr is not None:
                merged = keep_expr(merged)
            run = self._next_run()
            KeyedTable(merged, self.meta).clustered().write.parquet(
                os.path.join(self.root, run)
            )
            live = [r for r in self.live_runs() if r not in bucket]
            self._swap_manifest([*live, run])
            new_runs.append(run)
        return new_runs


def _dir_mtime(path: str) -> float:
    return os.path.getmtime(path)


def vacuum_dead_runs(store: RunStore, min_age_s: float = 3600.0) -> list[str]:
    """Garbage-collect run directories absent from the live manifest —
    compaction inputs already replaced, and the debris of failed appends
    (which write their directory BEFORE the manifest swap publishes it).

    ``min_age_s`` is the in-flight guard: a directory younger than this may
    be an append that has not swapped its manifest yet, so it is left
    alone — the same reasoning as SnapshotStore.vacuum keeping the current
    pointer's version.  Returns the removed run names.
    """
    import shutil

    live = set(store.live_runs())
    removed: list[str] = []
    now = __import__("time").time()
    for d in sorted(os.listdir(store.root)):
        if not (d.startswith("r") and d[1:].isdigit()) or d in live:
            continue
        path = os.path.join(store.root, d)
        if now - _dir_mtime(path) < min_age_s:
            continue
        shutil.rmtree(path)
        removed.append(d)
    return removed


def maintain(
    store: RunStore,
    spark: SparkSession,
    keep_expr: Optional[Callable[[DataFrame], DataFrame]] = None,
    min_threshold: int = 4,
    max_threshold: int = 32,
    max_rounds: int = 8,
    vacuum_min_age_s: float = 3600.0,
) -> dict:
    """One maintenance cycle — the ops loop the reference runs inside
    Cassandra's compaction daemon: repeat size-tiered compaction (with the
    retention ``keep_expr`` applied during each merge, exactly where the
    reference's convictors run) until no bucket qualifies, then vacuum
    dead runs.  ``max_rounds`` bounds the loop — STCS converges because
    every merge strictly reduces the run count, but a bound beats a proof
    in an ops loop.

    Returns a summary dict: rounds run, runs merged, runs before/after,
    dead runs vacuumed.
    """
    before = len(store.live_runs())
    rounds = 0
    merged: list[str] = []
    for _ in range(max_rounds):
        new = store.compact(
            spark,
            min_threshold=min_threshold,
            max_threshold=max_threshold,
            keep_expr=keep_expr,
        )
        if not new:
            break
        merged.extend(new)
        rounds += 1
    vacuumed = vacuum_dead_runs(store, min_age_s=vacuum_min_age_s)
    return {
        "rounds": rounds,
        "merged_runs": merged,
        "runs_before": before,
        "runs_after": len(store.live_runs()),
        "vacuumed": vacuumed,
    }
