"""LSM run store + size-tiered compaction semantics.

The reference's retention engine rides inside a real compaction strategy
(DeletingCompactionStrategy delegating to size-tiered,
DeletingCompactionStrategy.java:102-126); these tests pin the modeled
equivalents: lazy LWW reads over overlapping runs, STCS bucketing math,
read-view invariance under compaction, and the retention hook dropping rows
during the merge exactly like a convictor.
"""

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import TableMeta
from cassandra_util_spark.sources.runs import RunStore, size_tiered_plan


def test_stcs_bucketing_math():
    # four ~100-byte runs + two 10KB runs: only the small tier qualifies
    sizes = {"r1": 100, "r2": 110, "r3": 95, "r4": 105, "r5": 10_000, "r6": 10_500}
    plan = size_tiered_plan(sizes, min_threshold=4)
    assert len(plan) == 1 and sorted(plan[0]) == ["r1", "r2", "r3", "r4"]
    # raising the threshold disqualifies the bucket
    assert size_tiered_plan(sizes, min_threshold=5) == []
    # max_threshold caps a giant bucket
    many = {f"r{i}": 100 + i for i in range(40)}
    capped = size_tiered_plan(many, min_threshold=4, max_threshold=8)
    assert capped and all(len(b) <= 8 for b in capped)
    with pytest.raises(ValueError):
        size_tiered_plan(sizes, min_threshold=1)


@pytest.fixture
def seeded_store(spark, tmp_path):
    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("writetime", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("user_id", "event_id", "event_type", "writetime")
    )
    # four overlapping runs: full + three re-delivered slices (older data
    # re-appearing is exactly the overlap compaction must resolve)
    store.append_run(ev)
    store.append_run(ev.filter(F.col("user_id") <= 50))
    store.append_run(ev.filter(F.col("user_id").between(25, 75)))
    store.append_run(ev.filter(F.col("user_id") > 60))
    return store, ev


def test_lazy_read_is_lww_view(spark, seeded_store):
    store, ev = seeded_store
    got = store.read_merged(spark).count()
    assert got == ev.count()  # unique (user_id, event_id) keys: no inflation


def test_compaction_preserves_read_view(spark, seeded_store):
    store, ev = seeded_store
    before = {tuple(r) for r in store.read_merged(spark).collect()}
    new = store.compact(spark, min_threshold=2)
    assert new, "expected at least one merge job"
    assert len(store.live_runs()) < 4
    after = {tuple(r) for r in store.read_merged(spark).collect()}
    assert after == before  # the compaction invariant


def test_compaction_retention_hook_drops_rows(spark, seeded_store):
    """keep_expr during compact = the deleting-compaction integration:
    convicted rows vanish from the merged run."""
    store, ev = seeded_store
    # merge everything in one job, dropping user_id <= 50 during the merge
    new = store.compact(
        spark,
        min_threshold=2,
        max_threshold=32,
        keep_expr=lambda df: df.filter(F.col("user_id") > 50),
    )
    assert new
    view = store.read_merged(spark)
    # rows from un-compacted runs may still carry user_id <= 50; compact
    # until one run remains for the full sweep
    while len(store.live_runs()) > 1:
        store.compact(
            spark, min_threshold=2,
            keep_expr=lambda df: df.filter(F.col("user_id") > 50),
        )
    final = store.read_merged(spark)
    assert final.filter(F.col("user_id") <= 50).count() == 0
    want = ev.filter(F.col("user_id") > 50).count()
    assert final.count() == want


def test_manifest_swap_is_atomic_visibility(spark, tmp_path):
    meta = TableMeta(("k",), (), "writetime")
    store = RunStore(str(tmp_path / "rs"), meta)
    df = spark.createDataFrame([("a", 1)], "k string, writetime bigint")
    store.append_run(df)
    assert store.live_runs() == ["r00001"]
    # a dead directory (failed job) never appears in the manifest
    import os

    os.makedirs(os.path.join(store.root, "r00099"))
    assert store.live_runs() == ["r00001"]


def test_vacuum_dead_runs(spark, tmp_path):
    import os
    import time

    from cassandra_util_spark.sources.runs import vacuum_dead_runs

    meta = TableMeta(("k",), (), "writetime")
    store = RunStore(str(tmp_path / "vac"), meta)
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, writetime bigint")
    store.append_run(df)
    store.append_run(df)
    store.compact(spark, min_threshold=2)  # r00001+r00002 -> r00003 (dead inputs)
    assert store.live_runs() == ["r00003"]
    # young debris is protected (in-flight append guard)
    assert vacuum_dead_runs(store, min_age_s=3600) == []
    removed = vacuum_dead_runs(store, min_age_s=0.0)
    assert removed == ["r00001", "r00002"]
    assert sorted(d for d in os.listdir(store.root) if d.startswith("r")) == ["r00003"]
    # the view still reads fine
    assert store.read_merged(spark).count() == 2


# ---------------------------------------------------------------------------
# Persisted IVF index (partition-pruned ANN)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ivf_index_dir(spark, tmp_path_factory):
    from cassandra_util_spark.sources.ivf_index import write_ivf_index

    path = str(tmp_path_factory.mktemp("ivf") / "index")
    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    write_ivf_index(corpus, path, num_centroids=16, refine_iters=1)
    return path


def test_persisted_probe_matches_inmemory_ivf(spark, ivf_index_dir):
    """The persisted index returns the same neighbors as the in-memory
    ivf_topk with identical parameters (same seeds, same refinement)."""
    from cassandra_util_spark.operators.similarity import ivf_topk
    from cassandra_util_spark.sources.ivf_index import probe_ivf_index

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 3)
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(
            corpus, queries, k=5, num_centroids=16, nprobe=4, refine_iters=1
        ).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in probe_ivf_index(
            spark, ivf_index_dir, queries, k=5, nprobe=4
        ).collect()
    }
    assert got == want and got


def test_probe_plan_prunes_partitions(spark, ivf_index_dir):
    """The probe's file index must hold EXACTLY the probed cells'
    directories — pruning happens at (and now BEFORE) file listing, the
    whole point of the persisted layout.  r8 pruned via a cell-IN
    PartitionFilter after a full partition-tree discovery; the probe now
    reads the probed directories directly (_read_probed_cells), so the
    scan's own root paths enumerate the nprobe cells and unprobed cells
    are never even listed."""
    import re

    from cassandra_util_spark.sources.ivf_index import probe_ivf_index

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") == 0)
    df = probe_ivf_index(spark, ivf_index_dir, queries, k=5, nprobe=2)
    # nprobe=2 of 16 cells: the scanned files must span exactly 2 cell dirs
    cell_files = [f for f in df.inputFiles() if "/cells/" in f]
    cells = {re.search(r"cell=(\d+)", f).group(1) for f in cell_files}
    assert len(cells) == 2, sorted(cell_files)


def test_probe_filtered_candidates(spark, ivf_index_dir):
    """Filtered search through the plain IVF index: every neighbor
    satisfies the predicate and each query keeps its full k under a
    selective candidate set (the predicate lands before scoring)."""
    from cassandra_util_spark.sources.ivf_index import probe_ivf_index

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 2)
    allowed = corpus.filter(F.col("vec_id") % 5 == 0).select("vec_id")
    got = probe_ivf_index(
        spark, ivf_index_dir, queries, k=5, nprobe=16, candidates=allowed
    ).collect()
    assert len(got) == 10  # 2 queries x full k at 20% selectivity
    assert all(r["neighbor_id"] % 5 == 0 for r in got)


# property tests: the STCS planner's structural invariants
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        sizes=st.dictionaries(
            st.text(alphabet="abcdefgh", min_size=1, max_size=4).map(lambda s: "r_" + s),
            st.integers(min_value=1, max_value=10**12),
            max_size=60,
        ),
        min_t=st.integers(min_value=2, max_value=6),
        max_t=st.integers(min_value=2, max_value=40),
    )
    @settings(max_examples=150, deadline=None)
    def test_stcs_plan_invariants(sizes, min_t, max_t):
        plan = size_tiered_plan(sizes, min_threshold=min_t, max_threshold=max_t)
        seen = [r for job in plan for r in job]
        # every planned run exists, appears at most once, jobs are disjoint
        assert len(seen) == len(set(seen))
        assert set(seen) <= set(sizes)
        # every job respects the thresholds
        assert all(min_t <= len(job) or len(job) == min(max_t, len(job)) for job in plan)
        assert all(len(job) >= 2 for job in plan)
        assert all(len(job) <= max_t for job in plan)
        # determinism
        assert plan == size_tiered_plan(sizes, min_threshold=min_t, max_threshold=max_t)
except ImportError:  # pragma: no cover
    pass


def test_schema_evolution_across_runs(spark, tmp_path):
    """The ALTER TABLE ADD life-cycle: a run written before the new column
    reads with nulls for it; compaction merges evolved and pre-evolution
    runs; a run missing a KEY column fails loudly."""
    from cassandra_util_spark.operators.merge import merge_snapshots

    meta = TableMeta(("k",), (), "writetime")
    store = RunStore(str(tmp_path / "evo"), meta)
    store.append_run(
        spark.createDataFrame([("a", 1), ("b", 1)], "k string, writetime bigint")
    )
    # column added after the first run was written
    store.append_run(
        spark.createDataFrame(
            [("b", 2, "fresh"), ("c", 2, "new")],
            "k string, writetime bigint, note string",
        )
    )
    with pytest.raises(Exception):
        store.read_merged(spark)  # strict by default
    view = {(r.k, r.note) for r in store.read_merged(
        spark, allow_schema_evolution=True
    ).collect()}
    assert view == {("a", None), ("b", "fresh"), ("c", "new")}
    # compaction handles the mixed-schema bucket and preserves the view
    store.compact(spark, min_threshold=2)
    assert len(store.live_runs()) == 1
    after = {(r.k, r.note) for r in store.read_merged(spark).collect()}
    assert after == view
    # a run missing a KEY column is corrupt, not evolved
    bad = spark.createDataFrame([(9,)], "writetime bigint")
    ok = spark.createDataFrame([("a", 1)], "k string, writetime bigint")
    with pytest.raises(ValueError, match="key column"):
        merge_snapshots([ok, bad], meta, allow_schema_evolution=True)


def test_maintenance_cycle_with_retention(spark, tmp_path):
    """The full ops loop: compaction rounds with a real convictor's
    keep-expression applied during each merge, then vacuum — ending with
    fewer runs, the convicted rows gone, and the kept view intact."""
    from cassandra_util_spark.core.table import KeyedTable
    from cassandra_util_spark.operators.convictors import create_convictor
    from cassandra_util_spark.sources.runs import maintain

    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "maint"), meta)
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("writetime", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("user_id", "event_id", "event_type", "writetime")
    )
    for lo, hi in [(1, 15), (1, 8), (5, 12), (9, 15)]:
        store.append_run(ev.filter(F.col("user_id").between(lo, hi)))

    table = KeyedTable(ev, meta, "events")
    rules = spark.createDataFrame(
        [("purge_low", "user_id", ("1", "5"))],
        "rulename string, column string, range struct<lo:string,hi:string>",
    )
    conv = create_convictor("rule_based_deletion", table, rules=rules)
    summary = maintain(
        store, spark,
        keep_expr=lambda df: df.filter(conv.keep_expr()),
        min_threshold=2, vacuum_min_age_s=0.0,
    )
    assert summary["rounds"] >= 1 and summary["runs_after"] < summary["runs_before"]
    assert summary["vacuumed"], "compacted inputs must be vacuumed"
    final = store.read_merged(spark)
    assert final.filter(F.col("user_id") <= 5).count() == 0
    want = ev.filter(F.col("user_id") > 5).count()
    assert final.count() == want


def test_skip_index_prunes_on_non_key_columns(spark, tmp_path):
    """Round 6: per-run stats now cover EVERY atomic column (the
    minmax-skip-index shape), so a bounded read on a NON-key column skips
    disjoint runs entirely — the time-partitioned-ingest payoff where runs
    arrive in event-time order."""
    from cassandra_util_spark.core.table import TableMeta
    from cassandra_util_spark.sources.runs import RunStore

    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    # three "daily" runs: disjoint day column, overlapping user_id ranges
    for day in (1, 2, 3):
        df = spark.range(100).selectExpr(
            "id as user_id",
            f"id + {day * 1000} as event_id",
            f"{day}L as day",
            f"id + {day} as writetime",
        )
        store.append_run(df)

    # skip-index stats recorded for every atomic column
    stats = store.run_stats()
    assert all("columns" in s and "day" in s["columns"] for s in stats.values())

    # pruning on the non-key column touches exactly one run
    assert len(store.prune_runs(2, 2, column="day")) == 1
    assert len(store.prune_runs(None, 1, column="day")) == 1
    assert len(store.prune_runs(2, None, column="day")) == 2
    # unknown column: no stats -> nothing pruned (optimization, never a bet)
    assert len(store.prune_runs(0, 0, column="nope")) == 3

    # the bounded read returns exactly the day-2 rows, merged
    got = store.read_merged(spark, extra_bounds={"day": (2, 2)})
    assert got.count() == 100
    assert {r["day"] for r in got.select("day").distinct().collect()} == {2}

    # combined key + extra bound composes
    both = store.read_merged(spark, key_lower=10, key_upper=19, extra_bounds={"day": (3, None)})
    assert both.count() == 10
    assert {r["event_id"] - r["user_id"] for r in both.collect()} == {3000}


def test_zordered_append_same_view_and_2d_file_pruning(spark, tmp_path):
    """``append_run(zorder_by=...)`` changes the FILE layout, never the
    view: the LWW merge over a z-ordered store is row-identical to the
    key-clustered store, the run stats record layout provenance, and the
    Morton layout's payoff is measurable — inside a run, files can be
    eliminated on EACH z-column independently (footer min/max rectangles),
    which the key-clustered layout cannot do for a non-leading column."""
    import json
    import os

    from cassandra_util_spark.operators.zorder import zorder_file_stats

    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("writetime", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("ux", F.col("user_id") % 256)
        .withColumn("ex", F.col("event_id") % 256)
        .select("user_id", "event_id", "event_type", "writetime", "ux", "ex")
    )
    plain = RunStore(str(tmp_path / "plain"), meta)
    plain.append_run(ev)
    zord = RunStore(str(tmp_path / "zord"), meta)
    run = zord.append_run(ev, zorder_by=["ux", "ex"], zorder_files=8)

    a = plain.read_merged(spark).orderBy("user_id", "event_id").collect()
    b = zord.read_merged(spark).orderBy("user_id", "event_id").collect()
    assert a == b

    with open(os.path.join(zord.root, run, "_STATS.json")) as f:
        st = json.load(f)
    assert st["zorder"] == ["ux", "ex"]
    # whole-run skip index unaffected by layout: same min/max either way
    assert st["columns"]["ux"] == plain.run_stats()[plain.live_runs()[0]]["columns"]["ux"]

    files = zorder_file_stats(os.path.join(zord.root, run), ["ux", "ex"])
    assert len(files) > 1
    # bounds at each column's observed midpoint (the first Morton split —
    # range-relative so the test holds at any scale factor's id range)
    cux = st["columns"]["ux"]
    cex = st["columns"]["ex"]
    mid_ux = (int(cux["min"]) + int(cux["max"])) // 2
    mid_ex = (int(cex["min"]) + int(cex["max"])) // 2
    # each dimension prunes files on its own, and the 2-D corner query
    # touches a strict minority
    assert any(f["ux_min"] > mid_ux for f in files)
    assert any(f["ex_min"] > mid_ex for f in files)
    hit = [f for f in files if f["ux_min"] <= mid_ux and f["ex_min"] <= mid_ex]
    assert 0 < len(hit) < len(files)
    # bounded read through the normal path still merges correctly
    view = zord.read_merged(
        spark, extra_bounds={"ux": (None, mid_ux), "ex": (None, mid_ex)}
    )
    expect = [r for r in a if r["ux"] <= mid_ux and r["ex"] <= mid_ex]
    assert sorted(view.collect()) == sorted(expect)


def test_footer_stats_byte_compatible_with_spark_agg(spark, tmp_path):
    """_write_stats now derives the skip index from parquet FOOTERS (a
    driver-side metadata walk — no Spark job per append); the Spark agg
    survives as the fallback for unreadable footers.  The two paths must
    produce byte-identical _STATS.json payloads across every atomic type
    the store carries (long, double, string, timestamp, date, boolean,
    all-null) or old stores and new stores would prune differently."""
    import datetime
    import json
    import os

    meta = TableMeta(("user_id",), ("event_id",), "writetime")
    store = RunStore(str(tmp_path / "runs"), meta)
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("writetime", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("dbl", F.col("user_id") / 7.0)
        .withColumn("tstamp", F.col("ts").cast("timestamp"))
        .withColumn("dt", F.to_date(F.col("ts").cast("timestamp")))
        .withColumn("flag", F.col("user_id") % 2 == 0)
        .withColumn("allnull", F.lit(None).cast("string"))
        .withColumn("payload", F.encode(F.col("event_type"), "utf-8"))  # binary
        .select(
            "user_id", "event_id", "event_type", "writetime",
            "dbl", "tstamp", "dt", "flag", "allnull", "payload",
        )
    )
    run = store.append_run(ev)
    path = os.path.join(store.root, run)

    footer = store._footer_stats(path)
    assert footer is not None, "testdata parquet must have readable footers"
    agg = store._spark_stats(spark, path)

    # normalize exactly like _write_stats does (json with default=str)
    norm = lambda s: json.loads(json.dumps(
        {"rows": s[0], "columns": s[1]}, default=str))
    nf, na = norm(footer), norm(agg)
    assert nf["rows"] == na["rows"] == ev.count()
    # binary columns appear on neither path; all-null columns on both
    assert "payload" not in nf["columns"] and "payload" not in na["columns"]
    assert nf["columns"]["allnull"] == {"min": None, "max": None}
    assert nf["columns"] == na["columns"]
    # the published _STATS.json is the footer-derived payload
    with open(os.path.join(path, "_STATS.json")) as f:
        st = json.load(f)
    assert st["columns"] == nf["columns"] and st["rows"] == nf["rows"]

    # NaN-bearing float column: Spark's parquet writer records NaN as a
    # stat bound, and folding NaN through </> (always false) could
    # UNDERSTATE the run max and wrongly prune it — the footer path must
    # OMIT the column (omitted = never pruned = never loses rows)
    nan_ev = ev.withColumn(
        "dbl", F.when(F.col("user_id") == 1, float("nan")).otherwise(F.col("dbl"))
    )
    run2 = store.append_run(nan_ev)
    st2 = store.run_stats()[run2]
    assert "dbl" not in st2["columns"]
    assert "user_id" in st2["columns"]  # other columns unaffected
    # a bound far above the data prunes the clean run via its dbl stats
    # but must KEEP the NaN run (no stats = non-prunable)
    assert store.prune_runs(1e12, 2e12, column="dbl") == [run2]
