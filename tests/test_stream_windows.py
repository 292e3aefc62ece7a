"""Streaming window materialization (streaming/corpus.py stream_windows):
the streamed store's merged view must equal the one-shot batch windows
regardless of micro-batch boundaries — including documents spanning batch
AND window boundaries — and the carry protocol must be restart-safe (the
carry is reconstructed from the store, never driver memory)."""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import TableMeta
from cassandra_util_spark.operators.packing import materialize_packed_windows
from cassandra_util_spark.sources.runs import RunStore
from cassandra_util_spark.streaming.corpus import stream_windows

# Document streams sized so several span window boundaries at capacity=8
# (doc 3 alone is three windows long) and the final window is partial.
DOCS = [
    (0, [1, 2, 3]),
    (1, [4, 5, 6, 7, 8]),
    (2, [9]),
    (3, list(range(10, 35))),   # 25 tokens: spans many windows
    (4, []),                    # empty stream
    (5, [35, 36, 37, 38, 39, 40, 41]),
    (6, [42, 43]),
    (7, list(range(44, 57))),   # 13 tokens
    (8, [57, 58, 59]),
]
CAPACITY = 8


def _write_shards(d, cuts):
    """Ascending doc-id range shards as separate files with pinned mtimes
    so the file source delivers them in append order."""
    src = tempfile.mkdtemp(prefix="win-stream-src-")
    lo = None
    now = time.time()
    for k, hi in enumerate(cuts + [None]):
        sh = d
        if lo is not None:
            sh = sh.filter(F.col("doc_id") > lo)
        if hi is not None:
            sh = sh.filter(F.col("doc_id") <= hi)
        sub = os.path.join(src, f"shard-{k:02d}")
        sh.coalesce(1).write.parquet(sub)
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (now + k, now + k))
        lo = hi
    return [os.path.join(src, p) for p in sorted(os.listdir(src))], src


def _new_store():
    return RunStore(
        tempfile.mkdtemp(prefix="win-store-"),
        TableMeta(("bin",), (), "writetime"),
    )


def _drain(spark, paths, store, cp, **kw):
    stream = (
        spark.readStream.schema("doc_id bigint, token_ids array<int>")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(*paths) if len(paths) == 1 else None
    )
    if stream is None:  # glob over the parent dir
        parent = os.path.dirname(paths[0])
        stream = (
            spark.readStream.schema("doc_id bigint, token_ids array<int>")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(os.path.join(parent, "shard-*"))
        )
    q = stream_windows(stream, store, cp, CAPACITY, **kw)
    q.awaitTermination(300)


def _view(spark, store):
    return {
        int(r["bin"]): (int(r["n_docs"]), int(r["n_tokens"]),
                        list(r["token_ids"]))
        for r in store.read_merged(spark)
        .select("bin", "n_docs", "n_tokens", "token_ids")
        .collect()
    }


def _want(spark, d):
    return {
        int(r["bin"]): (int(r["n_docs"]), int(r["n_tokens"]),
                        list(r["token_ids"]))
        for r in materialize_packed_windows(
            d, "doc_id", "token_ids", CAPACITY
        ).collect()
    }


def test_streamed_windows_equal_one_shot(spark):
    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, _ = _write_shards(d, cuts=[2, 5])
    store = _new_store()
    _drain(spark, paths, store, tempfile.mkdtemp(prefix="win-cp-"))
    assert _view(spark, store) == _want(spark, d)
    # attribution rides along: spans tile every window exactly
    for r in store.read_merged(spark).collect():
        spans = sorted(
            (int(s["off"]), int(s["len"])) for s in r["doc_spans"]
        )
        pos = 0
        for off, ln in spans:
            assert off == pos
            pos += ln
        assert pos == int(r["n_tokens"])


def test_restart_continues_from_store_carry(spark):
    """Drain shards 0-1, stop, then RESTART the same checkpoint after
    shard 2 lands: the carry must come back from the store's partial
    window (no driver state survives the restart), and the final view
    still equals the one-shot windows."""
    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, src = _write_shards(d, cuts=[2, 5])
    store = _new_store()
    live = os.path.join(src, "live")
    os.makedirs(live)
    for p in paths[:2]:
        os.symlink(p, os.path.join(live, os.path.basename(p)))
    cp = tempfile.mkdtemp(prefix="win-cp-")

    def _run():
        stream = (
            spark.readStream.schema("doc_id bigint, token_ids array<int>")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(os.path.join(live, "shard-*"))
        )
        q = stream_windows(stream, store, cp, CAPACITY)
        q.awaitTermination(300)

    _run()
    runs_before = sorted(store.live_runs())
    assert len(runs_before) == 2
    os.symlink(paths[2], os.path.join(live, os.path.basename(paths[2])))
    _run()
    assert len(store.live_runs()) > len(runs_before)
    assert _view(spark, store) == _want(spark, d)


def test_replay_is_idempotent(spark):
    """Restarting the SAME checkpoint after a full drain appends nothing
    (availableNow finds no new files; the HWM guard covers a forced
    replay), and the view is unchanged."""
    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, _ = _write_shards(d, cuts=[4])
    store = _new_store()
    cp = tempfile.mkdtemp(prefix="win-cp-")
    _drain(spark, paths, store, cp, txn_app_id="win-replay")
    view1 = _view(spark, store)
    runs1 = sorted(store.live_runs())
    _drain(spark, paths, store, cp, txn_app_id="win-replay")
    assert sorted(store.live_runs()) == runs1
    assert _view(spark, store) == view1


def test_out_of_order_batch_raises(spark):
    """A batch whose ids fall at or below a carried document's must fail
    loudly — silently re-packing emitted windows is data corruption."""
    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, src = _write_shards(d, cuts=[5])
    store = _new_store()
    # deliver shard 1 (ids 6-8) FIRST, then shard 0 (ids 0-5)
    for p, name in [(paths[1], "a"), (paths[0], "b")]:
        os.symlink(p, os.path.join(src, f"re-{name}"))
    stream = (
        spark.readStream.schema("doc_id bigint, token_ids array<int>")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "re-*"))
    )
    now = time.time()
    for k, name in enumerate(["re-a", "re-b"]):
        tgt = os.path.join(src, name)
        for root, _, files in os.walk(tgt, followlinks=True):
            for f in files:
                os.utime(os.path.join(root, f), (now + k, now + k))
    q = stream_windows(
        stream, store, tempfile.mkdtemp(prefix="win-cp-"), CAPACITY,
    )
    with pytest.raises(Exception, match="ascending id order"):
        q.awaitTermination(300)
        raise RuntimeError("stream should have failed")


def test_store_key_contract(spark):
    bad = RunStore(
        tempfile.mkdtemp(prefix="win-bad-"),
        TableMeta(("doc_id",), (), "writetime"),
    )
    with pytest.raises(ValueError, match="keyed \\('bin',\\)"):
        stream_windows(None, bad, "/tmp/x", CAPACITY)


def test_loader_bounded_read_prunes_runs(spark):
    """The loader read path: a bin-bounded read of the window store skips
    runs whose bin range excludes the bound (the per-run skip index) and
    returns exactly the bounded windows — what lets a trainer mount one
    shard of a 100 TB window store without touching the rest."""
    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, _ = _write_shards(d, cuts=[2, 5])
    store = _new_store()
    _drain(spark, paths, store, tempfile.mkdtemp(prefix="win-cp-"))
    all_bins = _view(spark, store)
    hi = max(all_bins)
    lo = hi // 2
    got = {
        int(r["bin"])
        for r in store.read_merged(spark, key_lower=lo, key_upper=hi)
        .select("bin").collect()
    }
    assert got == {b for b in all_bins if lo <= b <= hi}
    # pruning is real: a bound past every bin reads zero runs' rows
    assert store.prune_runs(hi + 100, hi + 200) == []


@pytest.mark.slow
def test_singleton_batches_equal_one_shot(spark):
    """One document per micro-batch (9 batches, maximal carry churn —
    every boundary partial is rebuilt 8 times): the merged view must
    still equal the one-shot windows."""
    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, _ = _write_shards(d, cuts=list(range(8)))
    assert len(paths) == 9
    store = _new_store()
    _drain(spark, paths, store, tempfile.mkdtemp(prefix="win-cp-"))
    assert _view(spark, store) == _want(spark, d)


@pytest.mark.slow
def test_compaction_interleaves_with_carry(spark):
    """maintain_every folds runs WHILE the stream ingests: the carry
    read's writetime-stats exclusion and skip-index bound must survive
    compacted (mixed-writetime) runs, and the final view still equals
    the one-shot windows."""
    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, _ = _write_shards(d, cuts=[1, 3, 5, 6])
    store = _new_store()
    _drain(
        spark, paths, store, tempfile.mkdtemp(prefix="win-cp-"),
        maintain_every=2, min_threshold=2,
    )
    assert _view(spark, store) == _want(spark, d)
    # compaction actually happened: fewer live runs than batches
    assert len(store.live_runs()) < 5


@pytest.mark.slow
def test_masks_from_store_equal_one_shot(spark):
    """The soft-removal production flow: windows live in the store,
    a verdict table arrives later, and loss masks computed from the
    store's read view (spans round-tripped through parquet) equal masks
    computed from the one-shot in-memory windows."""
    from cassandra_util_spark.operators.packing import loss_mask_windows

    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, _ = _write_shards(d, cuts=[2, 5])
    store = _new_store()
    _drain(spark, paths, store, tempfile.mkdtemp(prefix="win-cp-"))
    keep = spark.createDataFrame(
        [(i, i % 3 != 0) for i, _ in DOCS], "doc bigint, keep boolean"
    )
    got = {
        r["bin"]: (r["n_tokens"], r["masked_tokens"], r["mask"])
        for r in loss_mask_windows(store.read_merged(spark), keep).collect()
    }
    one_shot = materialize_packed_windows(
        d, "doc_id", "token_ids", CAPACITY, with_spans=True
    )
    want = {
        r["bin"]: (r["n_tokens"], r["masked_tokens"], r["mask"])
        for r in loss_mask_windows(one_shot, keep).collect()
    }
    assert got == want


def test_out_of_order_after_exact_tiling_raises(spark):
    """Review r15: when the boundary tiles to a FULL window the carry is
    empty, but the append-order guard must STILL fire — the high-water
    doc id comes from the max-bin row's spans, not from the carry."""
    # batch 0: docs 10+11 = exactly one full window (8 tokens), no carry
    full = spark.createDataFrame(
        [(10, [1, 2, 3, 4, 5]), (11, [6, 7, 8])],
        "doc_id bigint, token_ids array<int>",
    )
    # batch 1: doc 5 — below every windowed id
    late = spark.createDataFrame(
        [(5, [9, 9])], "doc_id bigint, token_ids array<int>"
    )
    src = tempfile.mkdtemp(prefix="win-oo-src-")
    now = time.time()
    for k, sh in enumerate([full, late]):
        sub = os.path.join(src, f"shard-{k:02d}")
        sh.coalesce(1).write.parquet(sub)
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (now + k, now + k))
    store = _new_store()
    stream = (
        spark.readStream.schema("doc_id bigint, token_ids array<int>")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    q = stream_windows(
        stream, store, tempfile.mkdtemp(prefix="win-oo-cp-"), CAPACITY,
    )
    with pytest.raises(Exception, match="ascending id order"):
        q.awaitTermination(300)
        raise RuntimeError("stream should have failed")


class _StatsOnlyStore:
    """Duck-typed stand-in for the stats-only surface _prior_max_bin_runs
    touches (run_stats + live_runs) — no filesystem, no Spark."""

    def __init__(self, stats):
        self._stats = stats

    def run_stats(self):
        return dict(self._stats)

    def live_runs(self):
        return list(self._stats)


def test_unusable_writetime_stats_degrade_to_unbounded_read():
    """ADVICE r16: a crashed-attempt run whose writetime stats were
    stringified (json.dump(default=str)) escapes the wt-min exclusion;
    folding its bin max into key_lower while the writetime-bounded read
    drops its rows would return NO prior rows and silently re-base bins
    at 0.  Unusable writetime stats must degrade the prune bound to the
    unbounded read (the writetime extra_bound keeps it correct)."""
    from cassandra_util_spark.streaming.corpus import _prior_max_bin_runs

    real_prior = {
        "column": "bin", "min": 0, "max": 0, "rows": 1,
        "columns": {"writetime": {"min": 0, "max": 0}},
    }
    crashed_stringified = {
        "column": "bin", "min": 1, "max": 5, "rows": 5,
        "columns": {"writetime": {"min": "1", "max": "1"}},
    }
    # crashed run's bin max must NOT become the prune bound
    got = _prior_max_bin_runs(
        _StatsOnlyStore({"r0": real_prior, "r1": crashed_stringified}), 1
    )
    assert got == (None,)
    # absent writetime stats: same degrade
    no_wt = {"column": "bin", "min": 1, "max": 5, "rows": 5}
    assert _prior_max_bin_runs(
        _StatsOnlyStore({"r0": real_prior, "r1": no_wt}), 1
    ) == (None,)
    # usable stats keep the pruned read
    prior2 = {
        "column": "bin", "min": 1, "max": 3, "rows": 3,
        "columns": {"writetime": {"min": 0, "max": 0}},
    }
    assert _prior_max_bin_runs(
        _StatsOnlyStore({"r0": real_prior, "r2": prior2}), 1
    ) == (3,)
    # a genuine own-run (usable int writetime == batch_id) stays excluded
    own = {
        "column": "bin", "min": 1, "max": 9, "rows": 9,
        "columns": {"writetime": {"min": 1, "max": 1}},
    }
    assert _prior_max_bin_runs(
        _StatsOnlyStore({"r0": real_prior, "r3": own}), 1
    ) == (0,)


def test_epoch_plan_from_store_equals_in_memory_twin(spark):
    """VERDICT r15 task 4 (store-backed loader plan): the epoch-shuffle
    plan computed from the PERSISTED window store's merged view must
    equal the plan over the in-memory one-shot windows row-for-row —
    and, because the plan needs only (bin, n_tokens), the store read
    must prune the token arrays out of its ReadSchema entirely (the
    loader PLAN reads window metadata, not the token payload)."""
    from cassandra_util_spark.operators.packing import epoch_shuffle_plan

    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, _ = _write_shards(d, cuts=[2, 5])
    store = _new_store()
    _drain(spark, paths, store, tempfile.mkdtemp(prefix="win-cp-"))
    view = store.read_merged(spark).select("bin", "n_tokens")
    from_store = epoch_shuffle_plan(view, epochs=2, num_shards=3, seed="eq")
    one_shot = materialize_packed_windows(
        d, "doc_id", "token_ids", capacity=CAPACITY
    )
    in_memory = epoch_shuffle_plan(one_shot, epochs=2, num_shards=3, seed="eq")
    assert sorted(map(tuple, from_store.collect())) == sorted(
        map(tuple, in_memory.collect())
    )
    # column pruning reaches the store scan: no token payload in ReadSchema
    plan = from_store._sc._jvm.PythonSQLUtils.explainString(
        from_store._jdf.queryExecution(), "formatted"
    )
    reads = [seg[:400] for seg in plan.split("ReadSchema: ")[1:]]
    assert reads, "expected at least one scan node"
    for seg in reads:
        assert "token_ids" not in seg.split("\n", 1)[0]
    assert "doc_spans" not in plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]


def test_stream_windows_on_a_monotone_order_key(spark):
    """The carry protocol is keyed on ANY monotone non-negative bigint,
    not just doc ids: streaming a curriculum-ordered corpus keyed on
    ord = stage·100 + doc (one micro-batch per stage, ascending) must
    reproduce the one-shot windows materialized with order_col=ord —
    the mechanism behind curriculum_windows_from_store."""
    stages = {0: 1, 1: 0, 2: 2, 3: 0, 5: 1, 6: 2, 7: 0, 8: 1}
    rows = [
        (d, stages.get(d, 2) * 100 + d, ids) for (d, ids) in DOCS if ids
    ] + [(4, stages.get(4, 2) * 100 + 4, [])]
    d = spark.createDataFrame(
        rows, "doc_id bigint, ord bigint, token_ids array<int>"
    )
    want = {
        r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
        for r in materialize_packed_windows(
            d.select(F.col("ord").alias("doc_id"), "token_ids"),
            "doc_id", "token_ids", capacity=CAPACITY,
        ).collect()
    }
    src = tempfile.mkdtemp(prefix="win-cur-src-")
    now = time.time()
    for k in range(3):
        sub = os.path.join(src, f"shard-{k:02d}")
        d.filter((F.col("ord") >= k * 100) & (F.col("ord") < (k + 1) * 100)) \
            .select("ord", "token_ids").coalesce(1).write.parquet(sub)
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (now + k, now + k))
    store = _new_store()
    stream = (
        spark.readStream.schema("ord bigint, token_ids array<int>")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    q = stream_windows(
        stream, store, tempfile.mkdtemp(prefix="win-cur-cp-"), CAPACITY,
        id_col="ord",
    )
    q.awaitTermination(300)
    got = {
        r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
        for r in store.read_merged(spark).collect()
    }
    assert got == want


def test_reserved_column_names_rejected_loudly(spark):
    """Review r16: an id column named like the protocol's working or
    OUTPUT columns (window stores are keyed ('bin',), so id_col='bin' is
    a plausible mistake) must be a named ValueError, not a deep Catalyst
    error inside the union or the materialization."""
    for bad in ("__ord", "__ids", "bin", "n_tokens", "token_ids"):
        d = spark.createDataFrame(
            [(0, [1, 2])], f"`{bad}` bigint, ids array<int>"
        )
        with pytest.raises(Exception, match="reserved by the carry"):
            from cassandra_util_spark.operators.packing import (
                _windows_shard_step,
            )

            _windows_shard_step(
                spark, [], d, bad, "ids", 4, "bigint", "int"
            )


def test_doc_lookup_filters_spans_before_reassembly(spark):
    """The random-access lookup shape (`windows_doc_lookup`): restore
    ONE document from a bin-bounded store read.  The attribution spans
    must be filtered to the wanted doc BEFORE reassembly — boundary
    windows are shared with neighbors whose remaining pieces live
    outside the bounded read, so an unfiltered reassembly would hand
    back torn neighbor streams as if they were whole."""
    from cassandra_util_spark.operators.packing import reassemble_doc_streams

    d = spark.createDataFrame(DOCS, "doc_id bigint, token_ids array<int>")
    paths, _ = _write_shards(d, cuts=[2, 5])
    store = _new_store()
    _drain(spark, paths, store, tempfile.mkdtemp(prefix="win-cp-"))
    # doc 7 (13 tokens) spans multiple windows; find its bin range from
    # the spans (the doc→bin index step)
    spans = (
        store.read_merged(spark)
        .select("bin", F.explode("doc_spans").alias("s"))
        .filter(F.col("s")["doc"] == 7)
        .agg(F.min("bin").alias("lo"), F.max("bin").alias("hi"))
        .first()
    )
    win = store.read_merged(
        spark, key_lower=int(spans["lo"]), key_upper=int(spans["hi"])
    ).select(
        "bin",
        "token_ids",
        F.filter("doc_spans", lambda s: s["doc"] == 7).alias("doc_spans"),
    )
    got = reassemble_doc_streams(win).collect()
    assert len(got) == 1 and list(got[0]["token_ids"]) == list(range(44, 57))
    # the hazard the filter removes: unfiltered reassembly of the SAME
    # bounded read hands back a neighbor's stream torn to its in-range
    # pieces only
    unfiltered = {
        r["doc_id"]: list(r["token_ids"])
        for r in reassemble_doc_streams(
            store.read_merged(
                spark, key_lower=int(spans["lo"]), key_upper=int(spans["hi"])
            ).select("bin", "token_ids", "doc_spans")
        ).collect()
    }
    full = {i: ids for i, ids in DOCS}
    torn = {i for i, ids in unfiltered.items() if ids != full[i]}
    assert torn, "expected at least one torn neighbor in the bounded read"


@pytest.mark.slow
def test_doc_lookup_empty_range_returns_zero_rows_not_crash(spark):
    """An all-empty looked-up doc range has no spans and therefore no
    bins to read: the lookup must render those docs as (0, 0, '') —
    exactly what the oracle's LEFT JOIN does — instead of crashing on
    the NULL min/max bin aggregate (review r17)."""
    import os
    import tempfile

    from cassandra_util_spark.entry_queries import QUERIES

    # mx=20 puts the lookup range [2·20//5, 9·20//20] = [8, 9]; docs 8
    # and 9 normalize to zero tokens while the rest carry text
    rows = [
        (i, "" if i in (8, 9) else f"word{i} common text", "en", "s0",
         10)
        for i in range(21)
    ]
    sf = tempfile.mkdtemp(prefix="lookup-edge-")
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = QUERIES["windows_doc_lookup"](spark, sf).collect()
    got = {r["doc_id"]: (r["n_windows"], r["n_tokens"], r["restored"])
           for r in out}
    assert got == {8: (0, 0, ""), 9: (0, 0, "")}


def test_pinned_shard_src_one_file_per_shard_and_empty_backfill(spark, tmp_path):
    """r17: the tagged one-job shard write must keep the drain contract —
    exactly one part file per shard dir, ascending pinned mtimes, and an
    EMPTY shard still materializes a (zero-row) parquet dir so its
    micro-batch (and hence every later batch id / writetime) survives."""
    import glob
    import os

    from pyspark.sql import functions as F

    from cassandra_util_spark.entry_queries import _pinned_shard_src

    d = spark.createDataFrame(
        [(i, [i, i + 1]) for i in range(30)],
        "doc_id bigint, token_ids array<bigint>",
    )
    shards = [
        d.filter(F.col("doc_id") < 10),
        d.filter(F.col("doc_id") < 0),  # EMPTY middle shard
        d.filter(F.col("doc_id") >= 10),
    ]
    src = _pinned_shard_src(shards, ["doc_id", "token_ids"], "t17")
    mtimes = []
    total = 0
    for k in range(3):
        sub = os.path.join(src, f"shard-{k:02d}")
        parts = glob.glob(os.path.join(sub, "*.parquet")) or [
            p for p in glob.glob(os.path.join(sub, "part-*")) if not p.endswith(".crc")
        ]
        assert len(parts) == 1, (k, parts)
        mtimes.append(os.path.getmtime(parts[0]))
        rows = spark.read.schema("doc_id bigint, token_ids array<bigint>").parquet(sub)
        total += rows.count()
        if k == 1:
            assert rows.count() == 0
    assert mtimes == sorted(mtimes) and mtimes[0] < mtimes[1] < mtimes[2]
    assert total == 30


def test_pinned_shard_src_guards(spark):
    """r18 ADVICE: an empty shard list must raise a named error (it used
    to IndexError on shard_frames[0]), and a session with
    spark.sql.files.maxRecordsPerFile set must refuse — a split shard
    would break the one-file-per-trigger batch ordering."""
    from cassandra_util_spark.entry_queries import _pinned_shard_src

    with pytest.raises(ValueError, match="at least one shard frame"):
        _pinned_shard_src([], ["doc_id"], "t18")
    d = spark.createDataFrame([(1, [1])], "doc_id bigint, token_ids array<bigint>")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try:
        with pytest.raises(RuntimeError, match="maxRecordsPerFile"):
            _pinned_shard_src([d], ["doc_id", "token_ids"], "t18")
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")


def test_shard_step_min_id_rides_strategy_count(spark):
    """r18: with_min_id folds the streaming append-order guard's min-id
    into the strategy-count job.  The returned min must be the SHARD's
    lowest id (carry pieces sit at negative __ord and are excluded), and
    None for an empty shard."""
    from cassandra_util_spark.operators.packing import _windows_shard_step

    sh = spark.createDataFrame(
        [(7, [1, 2, 3]), (9, [4, 5])], "doc_id bigint, token_ids array<bigint>"
    )
    carry = [(3, 0, [8, 8])]  # doc 3's boundary piece — must not win the min
    win, new_carry, mb, mn = _windows_shard_step(
        spark, carry, sh, "doc_id", "token_ids", 4, "bigint", "bigint",
        with_min_id=True,
    )
    assert mn == 7
    empty = sh.filter(F.col("doc_id") < 0)
    _, _, _, mn2 = _windows_shard_step(
        spark, [], empty, "doc_id", "token_ids", 4, "bigint", "bigint",
        with_min_id=True,
    )
    assert mn2 is None
    # default path keeps the 4-tuple shape with min_id=None
    _, _, _, mn3 = _windows_shard_step(
        spark, [], sh, "doc_id", "token_ids", 4, "bigint", "bigint"
    )
    assert mn3 is None


def test_boundary_row_fast_path_matches_merged_read(spark, tmp_path):
    """r18: the stats-pinned direct boundary read must return the same
    row as the general LWW-merged read — including when a later batch
    SUPERSEDES the max bin's partial window (same bin, newer writetime),
    and when the writetime bound excludes this batch's own run."""
    from cassandra_util_spark.core.table import TableMeta
    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.corpus import (
        _boundary_row,
        _prior_max_bin_runs,
    )

    store = RunStore(str(tmp_path / "bstore"), TableMeta(("bin",), (), "writetime"))
    schema = (
        "bin bigint, n_docs bigint, n_tokens bigint, "
        "token_ids array<bigint>, "
        "doc_spans array<struct<doc:bigint,off:bigint,len:bigint>>, "
        "writetime long"
    )
    # batch 0: full bin 0 + partial bin 1
    store.append_run(
        spark.createDataFrame(
            [
                (0, 1, 4, [1, 2, 3, 4], [(10, 0, 4)], 0),
                (1, 1, 2, [5, 6], [(11, 0, 2)], 0),
            ],
            schema,
        ),
        name="b0000000000",
    )
    # batch 1: bin 1 superseded (fuller), new partial bin 2
    store.append_run(
        spark.createDataFrame(
            [
                (1, 2, 4, [5, 6, 7, 8], [(11, 0, 2), (12, 2, 2)], 1),
                (2, 1, 1, [9], [(12, 0, 1)], 1),
            ],
            schema,
        ),
        name="b0000000001",
    )

    def merged_top(batch_id):
        prior = store.read_merged(
            spark, extra_bounds={"writetime": (None, batch_id - 1)}
        )
        top = prior.orderBy(F.col("bin").desc()).limit(1).collect()
        return top[0] if top else None

    for batch_id in (1, 2):
        key_lower = _prior_max_bin_runs(store, batch_id)[0]
        assert key_lower is not None  # stats usable — the fast path runs
        fast = _boundary_row(store, spark, key_lower, batch_id)
        slow = merged_top(batch_id)
        assert fast.asDict() == slow.asDict(), (batch_id, fast, slow)
