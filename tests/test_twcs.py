"""Time-window compaction (TWCS) on the run store — the strategy the
reference's deleting compaction wraps for time-series retention
(DeletingCompactionStrategy delegates bucketing to an underlying strategy;
Cassandra operators pair it with TimeWindowCompactionStrategy so windows
compact with their contemporaries and aged-out windows DROP without a
scan)."""

from pyspark.sql import functions as F

from cassandra_util_spark.core.table import TableMeta
from cassandra_util_spark.sources.runs import (
    RunStore,
    compact_time_windowed,
    drop_expired_windows,
    maintain,
    time_window_plan,
)

HOUR = 3_600_000_000  # µs


def _run_df(spark, lo_user, hi_user, hour, n=50):
    base = hour * HOUR
    return spark.range(lo_user, hi_user).selectExpr(
        "id as user_id",
        f"id + {hour * 10000} as event_id",
        f"cast(id % 2 as string) as event_type",
        f"{base} + id as writetime",
    )


def _store(spark, tmp_path, hours):
    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    for h in hours:
        store.append_run(_run_df(spark, 0, 50, h))
    return store


def test_windows_compact_only_with_contemporaries(spark, tmp_path):
    # hours 0,0,1,1,2 -> windows {0: 2 runs, 1: 2 runs, 2: 1 run (newest)}
    store = _store(spark, tmp_path, [0, 0, 1, 1, 2])
    before = {tuple(r) for r in store.read_merged(spark).collect()}

    plan = time_window_plan(
        store.run_stats(), store.live_runs(), "writetime", HOUR
    )
    assert len(plan) == 2 and all(len(b) == 2 for b in plan)

    new = compact_time_windowed(store, spark, "writetime", HOUR)
    assert len(new) == 2
    # each old window now holds ONE run; the newest window is untouched
    assert len(store.live_runs()) == 3
    assert {tuple(r) for r in store.read_merged(spark).collect()} == before

    # convergence: a second round finds nothing to do
    assert compact_time_windowed(store, spark, "writetime", HOUR) == []


def test_retention_applies_in_window_merge(spark, tmp_path):
    store = _store(spark, tmp_path, [0, 0, 5])
    keep = lambda df: df.filter(F.col("event_type") != "1")  # noqa: E731
    compact_time_windowed(store, spark, "writetime", HOUR, keep_expr=keep)
    view = store.read_merged(spark)
    # window-0 rows lost their convicted half; the untouched newest window
    # (hour 5) still carries both types until ITS window compacts
    w0 = view.filter(F.col("writetime") < HOUR)
    assert w0.filter(F.col("event_type") == "1").count() == 0
    assert view.filter(F.col("writetime") >= 5 * HOUR).count() == 50


def test_fully_expired_windows_drop_without_scan(spark, tmp_path):
    store = _store(spark, tmp_path, [0, 1, 5])
    runs_before = set(store.live_runs())
    dropped = drop_expired_windows(store, "writetime", cutoff=2 * HOUR)
    # hours 0 and 1 are entirely before the cutoff; hour 5 survives
    assert len(dropped) == 2
    assert set(store.live_runs()) == runs_before - set(dropped)
    view = store.read_merged(spark)
    assert view.count() == 50
    assert view.agg(F.min("writetime")).collect()[0][0] >= 5 * HOUR
    # the data directories still exist for readers holding the old
    # manifest — vacuum_dead_runs owns their removal
    import os

    assert all(os.path.isdir(os.path.join(store.root, r)) for r in dropped)

    # a PARTIALLY expired run is never dropped (stats straddle the cutoff)
    assert drop_expired_windows(store, "writetime", cutoff=5 * HOUR + 10) == []


def test_maintain_twcs_cycle(spark, tmp_path):
    store = _store(spark, tmp_path, [0, 0, 1, 1, 2, 8])
    summary = maintain(
        store,
        spark,
        strategy="twcs",
        time_col="writetime",
        window_us=HOUR,
        min_threshold=2,
        expire_before=HOUR,  # window 0 ages out entirely
        vacuum_min_age_s=0.0,
    )
    assert len(summary["expired_dropped"]) == 2  # both hour-0 runs
    assert summary["runs_after"] < summary["runs_before"]
    view = store.read_merged(spark)
    assert view.agg(F.min("writetime")).collect()[0][0] >= HOUR
    # hour-1 window compacted to one run; hours 2 and 8 untouched
    assert len(store.live_runs()) == 3

    import pytest

    with pytest.raises(ValueError, match="requires time_col"):
        maintain(store, spark, strategy="twcs")
    with pytest.raises(ValueError, match="stcs | leveled | twcs"):
        maintain(store, spark, strategy="nope")


def test_streaming_twcs_event_time_retention(spark, tmp_path):
    """The streaming production shape: micro-batches flush in event-time
    order, TWCS maintenance interleaves, and the expiry cutoff follows
    max-event-time − retention from the skip-index stats — old windows
    leave by manifest swap with zero rows scanned."""
    import os

    from cassandra_util_spark.streaming.ingest import stream_to_runstore

    src = str(tmp_path / "src")
    for h in (0, 1, 2, 7):  # four hourly batches, the last far ahead
        _run_df(spark, 0, 40, h).coalesce(1).write.mode("append").parquet(src)

    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    stream = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, event_type string, writetime bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_to_runstore(
        stream, store, str(tmp_path / "cp"),
        maintain_every=2, strategy="twcs", min_threshold=2,
        time_col="writetime", window_us=HOUR, retention_us=3 * HOUR,
    )
    q.awaitTermination(180)

    # after the batch-7 cycle: cutoff = (7*HOUR + 39) - 3*HOUR -> hours
    # 0..3 fully aged; hours 0,1,2 runs dropped without scan
    view = store.read_merged(spark)
    assert view.agg(F.min("writetime")).collect()[0][0] >= 7 * HOUR
    assert view.count() == 40

    import pytest

    with pytest.raises(ValueError, match="requires time_col"):
        stream_to_runstore(stream, store, str(tmp_path / "cp2"), strategy="twcs")
