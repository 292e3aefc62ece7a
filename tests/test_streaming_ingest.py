"""Streaming ingestion into the run store — the memtable-flush analog.

Cassandra's write path flushes memtables as new SSTables and compacts in
the background; the reference filters rows during those compactions.  These
tests pin the Structured Streaming equivalent: each micro-batch appends one
L0 run, replayed batch ids are idempotent, interleaved maintenance keeps
the run count bounded with retention applied in-merge, and the final LWW
view equals the batch answer.
"""

import os

from pyspark.sql import functions as F

from cassandra_util_spark.core.table import TableMeta
from cassandra_util_spark.sources.runs import RunStore
from cassandra_util_spark.streaming.ingest import (
    run_name_for_batch,
    stream_to_runstore,
)


def _events(spark, n=2000):
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("writetime", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("user_id", "event_id", "event_type", "writetime")
        .limit(n)
    )


def test_stream_ingest_matches_batch_view(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    # three files -> three micro-batches (maxFilesPerTrigger=1)
    ev.filter(F.col("user_id") <= 30).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("user_id").between(20, 60)).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("user_id") > 50).coalesce(1).write.mode("append").parquet(src)

    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_to_runstore(stream, store, str(tmp_path / "cp"))
    q.awaitTermination(120)
    assert len(store.live_runs()) == 3
    assert all(r.startswith("b") for r in store.live_runs())
    got = {tuple(r) for r in store.read_merged(spark).collect()}
    want = {tuple(r) for r in ev.collect()}
    assert got == want


def test_replayed_batch_is_idempotent(spark, tmp_path):
    ev = _events(spark, 500)
    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    name = run_name_for_batch(7)
    store.append_run(ev, name=name)
    before = store.read_merged(spark).count()
    # the at-least-once replay: same batch id arrives again
    store.append_run(ev, name=name)
    assert store.live_runs().count(name) == 1
    assert store.read_merged(spark).count() == before
    # a crashed first attempt (dir exists, not in manifest) is overwritten
    store2 = RunStore(str(tmp_path / "runs2"), meta)
    ev.limit(10).write.parquet(os.path.join(store2.root, name))
    store2.append_run(ev, name=name)
    assert store2.read_merged(spark).count() == ev.count()


def test_interleaved_maintenance_compacts_and_retains(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    for lo, hi in [(0, 25), (26, 50), (51, 75), (76, 10**9)]:
        ev.filter(F.col("user_id").between(lo, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_to_runstore(
        stream, store, str(tmp_path / "cp"),
        maintain_every=4, strategy="leveled", min_threshold=2,
        run_target_bytes=16 << 10,
        keep_expr=lambda df: df.filter(F.col("event_type") != "click"),
    )
    q.awaitTermination(180)
    levels = store.live_levels()
    assert levels and all(lv >= 1 for lv in levels.values())  # L0 drained
    view = store.read_merged(spark)
    assert view.filter(F.col("event_type") == "click").count() == 0
    want = ev.filter(F.col("event_type") != "click")
    assert view.count() == want.count()


def test_replay_after_compaction_does_not_resurrect(spark, tmp_path):
    """ADVICE r4: once maintenance compacts run b<id> away, its name leaves
    the live manifest — a replayed micro-batch with the same id used to
    re-append it, resurrecting keep_expr-convicted rows until the next
    compaction.  The _INGEST_HWM high-water mark now skips the replay
    regardless of manifest membership."""
    from cassandra_util_spark.sources.runs import maintain
    from cassandra_util_spark.streaming.ingest import (
        applied_batch_hwm,
        stream_to_runstore,
    )

    ev = _events(spark, 1000)
    src = str(tmp_path / "src")
    halves = [ev.filter(F.col("user_id") % 2 == 0),
              ev.filter(F.col("user_id") % 2 == 1)]
    for h in halves:
        h.coalesce(1).write.mode("append").parquet(src)

    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    keep = lambda df: df.filter(F.col("event_type") != "click")  # noqa: E731
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_to_runstore(
        stream, store, str(tmp_path / "cp"),
        maintain_every=2, strategy="stcs", min_threshold=2, keep_expr=keep,
    )
    q.awaitTermination(120)
    assert applied_batch_hwm(store) == 1
    # maintenance folded the b* runs into a compacted run: convicted rows gone
    live = store.live_runs()
    assert run_name_for_batch(1) not in live, live
    assert store.read_merged(spark).filter(F.col("event_type") == "click").count() == 0

    # the crash-replay: foreachBatch re-delivers the LAST batch with the
    # same id.  Simulate it by calling the store path the way a restarted
    # query would — before the fix this re-appended b0000000001 and
    # resurrected the convicted click rows.
    replay_id = 1
    if replay_id > applied_batch_hwm(store):  # what process_batch now checks
        store.append_run(halves[1], name=run_name_for_batch(replay_id))
    assert run_name_for_batch(replay_id) not in store.live_runs()
    assert store.read_merged(spark).filter(F.col("event_type") == "click").count() == 0


def test_streaming_count_min_equals_batch_sketch(spark, tmp_path):
    """The persisted CM sketch after draining N micro-batches must be
    BIT-IDENTICAL to count_min_build over their union (counter addition is
    CM's composition law), and the applied-batch tag must block replay
    double-counting — the failure mode additive sketches cannot absorb."""
    from cassandra_util_spark.operators.sketches import count_min_build
    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.sketches import stream_count_min_to_store

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id"
    )
    src = str(tmp_path / "src")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = SnapshotStore(str(tmp_path / "cm"))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_count_min_to_store(
        stream, store, str(tmp_path / "cp"), "user_id", depth=4, width=64
    )
    q.awaitTermination(120)

    got = {tuple(r) for r in store.read(spark).collect()}
    want = {
        tuple(r)
        for r in count_min_build(ev, "user_id", depth=4, width=64).collect()
    }
    assert got == want and got
    # tag = txn identity (the checkpoint's query id) + last applied batch id
    from cassandra_util_spark.streaming.ingest import resolve_txn_app_id

    app = resolve_txn_app_id(str(tmp_path / "cp"), "cm-sketch-ingest")
    assert store.current_tag() == f"{app}:2"  # three batches applied: 0, 1, 2

    # replayed batch id must be a no-op (no new version, no inflation)
    versions_before = store.versions()
    from cassandra_util_spark.streaming import sketches as sk_mod

    assert sk_mod._last_applied(store, app) == 2
    # what process_batch does on replay: batch_id 2 <= last applied -> skip
    assert 2 <= sk_mod._last_applied(store, app)
    assert store.versions() == versions_before
    # per-batch vacuum keeps the version COUNT bounded for long streams
    assert len(versions_before) <= 2, versions_before


def test_streaming_hll_equals_batch_registers(spark, tmp_path):
    from cassandra_util_spark.operators.sketches import hll_build
    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.sketches import stream_hll_to_store

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id"
    )
    src = str(tmp_path / "src")
    for i in range(2):
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = SnapshotStore(str(tmp_path / "hll"))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_hll_to_store(stream, store, str(tmp_path / "cp"), "user_id", p=8)
    q.awaitTermination(120)
    got = {tuple(r) for r in store.read(spark).collect()}
    want = {tuple(r) for r in hll_build(ev, "user_id", p=8).collect()}
    assert got == want and got


def test_fresh_checkpoint_against_written_store_fails_loudly(spark, tmp_path):
    """ADVICE r5 (medium): the replay guard is keyed on (txn identity,
    batch id), not batch id alone.  Restarting with a FRESH checkpoint
    resets batch ids to 0; a bare `batch_id <= hwm` guard would read every
    batch as already-applied and silently no-op — data loss in the run
    store, a frozen sketch in the sketch store.  Both must now RAISE."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.ingest import applied_txn_app_id
    from cassandra_util_spark.streaming.sketches import stream_count_min_to_store

    ev = _events(spark, 400)
    src = str(tmp_path / "src")
    ev.coalesce(1).write.mode("append").parquet(src)

    def fresh_stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # -- run store ----------------------------------------------------------
    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    q = stream_to_runstore(fresh_stream(), store, str(tmp_path / "cp1"))
    q.awaitTermination(120)
    n_runs = len(store.live_runs())
    assert n_runs >= 1 and applied_txn_app_id(store) is not None

    q2 = stream_to_runstore(fresh_stream(), store, str(tmp_path / "cp2"))
    with pytest.raises(StreamingQueryException, match="refusing to compare"):
        q2.awaitTermination(120)
        raise AssertionError("fresh-checkpoint restart silently succeeded")
    assert len(store.live_runs()) == n_runs  # nothing appended, nothing lost

    # explicit txn_app_id opts back into the Delta-style idempotent skip
    q3 = stream_to_runstore(
        fresh_stream(), store, str(tmp_path / "cp3"),
        txn_app_id=applied_txn_app_id(store),
    )
    q3.awaitTermination(120)
    assert len(store.live_runs()) == n_runs  # batch 0 <= hwm: skipped, no dup

    # -- sketch store (CM is additive: a silent skip freezes it) ------------
    cm = SnapshotStore(str(tmp_path / "cm"))
    q4 = stream_count_min_to_store(
        fresh_stream(), cm, str(tmp_path / "cp4"), "user_id", depth=2, width=16
    )
    q4.awaitTermination(120)
    tag_before = cm.current_tag()
    q5 = stream_count_min_to_store(
        fresh_stream(), cm, str(tmp_path / "cp5"), "user_id", depth=2, width=16
    )
    with pytest.raises(StreamingQueryException, match="refusing to compare"):
        q5.awaitTermination(120)
        raise AssertionError("fresh-checkpoint sketch restart silently succeeded")
    assert cm.current_tag() == tag_before  # no double-count commit happened


def test_foreign_or_legacy_sketch_tags(spark, tmp_path):
    """A foreign (unparsable) snapshot tag used to degrade to 'never
    applied' — a replay would then re-merge and double-count CM counters.
    It must raise.  A legacy bare-integer tag still parses (adopted into
    the new format on the next commit)."""
    import pytest

    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.sketches import _last_applied

    df = spark.range(3)
    foreign = SnapshotStore(str(tmp_path / "foreign"))
    foreign.commit(df, tag="some-other-module-tag")
    with pytest.raises(RuntimeError, match="foreign snapshot tag"):
        _last_applied(foreign, "me")

    legacy = SnapshotStore(str(tmp_path / "legacy"))
    legacy.commit(df, tag="5")
    assert _last_applied(legacy, "me") == 5

    other = SnapshotStore(str(tmp_path / "other"))
    other.commit(df, tag="someone-else:3")
    with pytest.raises(RuntimeError, match="refusing to compare"):
        _last_applied(other, "me")
    assert _last_applied(other, "someone-else") == 3


def test_heavy_hitters_from_store_equals_rebuild(spark, tmp_path):
    """VERDICT r5 task 7: heavy hitters gated by the STREAM-MAINTAINED CM
    sketch must equal the gate-from-rebuild answer over the drained stream
    — the sketch build pass (a second full input scan) disappears for
    consumers.  A parameter-shape mismatch must raise, not mis-hash."""
    import pytest

    from cassandra_util_spark.operators.sketches import (
        heavy_hitters_exact,
        heavy_hitters_from_store,
    )
    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.sketches import stream_count_min_to_store

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id"
    )
    src = str(tmp_path / "src")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = SnapshotStore(str(tmp_path / "cm"))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_count_min_to_store(
        stream, store, str(tmp_path / "cp"), "user_id", depth=4, width=64
    )
    q.awaitTermination(120)

    phi = 0.004
    got = {
        tuple(r)
        for r in heavy_hitters_from_store(
            store, ev, "user_id", phi, depth=4, width=64
        ).collect()
    }
    want = {
        tuple(r)
        for r in heavy_hitters_exact(ev, "user_id", phi, depth=4, width=64).collect()
    }
    assert got == want and got

    with pytest.raises(ValueError, match="different parameters"):
        heavy_hitters_from_store(store, ev, "user_id", phi, depth=4, width=32)


def test_plan_join_from_stores_equals_plan_join(spark, tmp_path):
    """The zero-scan advisory: plan_join computed from two STREAM-MAINTAINED
    sketch stores must equal plan_join over the raw tables (same sketch
    params) — the join decision for a pipeline run costs two bounded store
    reads, not a pass over either table."""
    from cassandra_util_spark.operators.sketches import (
        plan_join,
        plan_join_from_stores,
    )
    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.sketches import stream_count_min_to_store

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_custkey").alias("k")
    )
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        F.col("c_custkey").alias("k")
    )
    stores = {}
    for name, df in [("o", o), ("c", c)]:
        src = str(tmp_path / f"src-{name}")
        df.coalesce(1).write.parquet(src)
        store = SnapshotStore(str(tmp_path / f"cm-{name}"))
        q = stream_count_min_to_store(
            spark.readStream.schema(df.schema).parquet(src),
            store,
            str(tmp_path / f"cp-{name}"),
            "k",
            depth=4,
            width=256,
        )
        q.awaitTermination(120)
        stores[name] = store

    want = plan_join(o, c, "k", depth=4, width=256, seed="cm").collect()[0]
    got = plan_join_from_stores(spark, stores["o"], stores["c"]).collect()[0]
    assert tuple(got) == tuple(want) and got.advice == "broadcast_b"


def test_store_backed_executor_and_hll_estimate(spark, tmp_path):
    """advised_join_from_stores routes the join from persisted sketches
    with rows identical to the plain join; hll_estimate_from_store equals
    the estimate over the freshly-built registers."""
    from cassandra_util_spark.operators.sketches import (
        advised_join_from_stores,
        hll_build,
        hll_estimate,
        hll_estimate_from_store,
    )
    from cassandra_util_spark.sources.snapshots import SnapshotStore
    from cassandra_util_spark.streaming.sketches import (
        stream_count_min_to_store,
        stream_hll_to_store,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("price")
    )
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    stores = {}
    for name, df in [("o", o), ("c", c)]:
        src = str(tmp_path / f"src-{name}")
        df.select("k").coalesce(1).write.parquet(src)
        store = SnapshotStore(str(tmp_path / f"cm-{name}"))
        stream_count_min_to_store(
            spark.readStream.schema("k bigint").parquet(src),
            store, str(tmp_path / f"cp-{name}"), "k", depth=4, width=256,
        ).awaitTermination(120)
        stores[name] = store

    got = {
        tuple(r)
        for r in advised_join_from_stores(o, c, "k", stores["o"], stores["c"]).collect()
    }
    want = {
        tuple(r)
        for r in o.join(c, "k").select("k", "price", "c_mktsegment").collect()
    }
    assert got == want and got

    hll_store = SnapshotStore(str(tmp_path / "hll"))
    stream_hll_to_store(
        spark.readStream.schema("k bigint").parquet(str(tmp_path / "src-o")),
        hll_store, str(tmp_path / "cp-hll"), "k", p=8,
    ).awaitTermination(120)
    got_est = hll_estimate_from_store(hll_store, spark, p=8).collect()[0]
    want_est = hll_estimate(hll_build(o, "k", p=8), p=8).collect()[0]
    assert tuple(got_est) == tuple(want_est)
