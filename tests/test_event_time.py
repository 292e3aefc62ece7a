"""Event-time representation proofing.

The same parquet event table arrives as three different physical types
depending on Spark version and reader conf (TIMESTAMP on Spark 3,
TIMESTAMP_NTZ on Spark 4's native TIMESTAMP(NANOS) read, int64 nanos under
legacy nanosAsLong).  The Spark 4.1.2 upgrade broke round 2 precisely because
one call path assumed one representation — these tests pin that every
representation yields byte-identical query output, and that an unexpected
representation fails fast with a named error instead of a deep Catalyst one.
"""

import os

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.entry_queries import _t
from cassandra_util_spark.functions import normalize_event_time, writetime_micros


@pytest.fixture(scope="module")
def three_reps(spark, tmp_path_factory):
    """The same 200 events written as TIMESTAMP, TIMESTAMP_NTZ, and int64-nanos
    parquet files."""
    base = str(tmp_path_factory.mktemp("event-reps"))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = normalize_event_time(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ).limit(200)
    paths = {}
    variants = {
        "timestamp": ev,
        "timestamp_ntz": ev.withColumn("ts", F.col("ts").cast("timestamp_ntz")),
        "bigint_nanos": ev.withColumn("ts", F.unix_micros(F.col("ts")) * F.lit(1000)),
    }
    for name, df in variants.items():
        p = os.path.join(base, name)
        df.coalesce(1).write.parquet(p)
        paths[name] = p
    return paths


def test_all_representations_normalize_identically(spark, three_reps):
    outs = {}
    for name, path in three_reps.items():
        df = normalize_event_time(spark.read.parquet(path))
        assert df.schema["ts"].dataType.simpleString() == "timestamp", name
        outs[name] = sorted(
            df.select("event_id", writetime_micros(F.col("ts")).alias("wt")).collect()
        )
    assert outs["timestamp"] == outs["timestamp_ntz"] == outs["bigint_nanos"]
    assert len(outs["timestamp"]) == 200


def test_writetime_micros_accepts_ntz_directly(spark, three_reps):
    """writetime_micros itself is NTZ-safe even without prior normalization
    (the streaming path can receive an NTZ-schema'd source)."""
    ntz = spark.read.parquet(three_reps["timestamp_ntz"])
    ts = spark.read.parquet(three_reps["timestamp"])
    got = sorted(ntz.select("event_id", writetime_micros(F.col("ts")).alias("wt")).collect())
    want = sorted(ts.select("event_id", writetime_micros(F.col("ts")).alias("wt")).collect())
    assert got == want


def test_unexpected_representation_fails_loud(spark):
    df = spark.createDataFrame([(1, "2024-01-01")], "event_id bigint, ts string")
    with pytest.raises(TypeError, match="unexpected physical type 'string'"):
        normalize_event_time(df)


def test_t_rejects_wrong_typed_parquet(spark, tmp_path):
    """_t fails fast with a clear message naming the column and physical type
    when a driver table's schema drifts (VERDICT r2 item 5)."""
    bad = spark.createDataFrame(
        [(1, "2024-01-01", 5, "click", 1.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    )
    bad.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    with pytest.raises(TypeError, match="table 'events' column 'ts'.*'string'"):
        _t(spark, str(tmp_path), "events")


def test_t_normalizes_events_ts_only(spark):
    """events.ts (the epoch-µs arithmetic surface) is normalized to canonical
    TIMESTAMP; date-only columns stay at their native read type so literal
    predicates keep reaching the parquet scan."""
    sf = "/root/testdata/sf0.001"
    assert _t(spark, sf, "events").schema["ts"].dataType.simpleString() == "timestamp"
    for table, col in [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]:
        dt = _t(spark, sf, table).schema[col].dataType.simpleString()
        assert dt in ("timestamp", "timestamp_ntz"), (table, col, dt)


def test_date_predicate_pushdown_survives_t(spark):
    """Regression guard for the q1 pushdown loss: a literal shipdate filter on
    the _t-loaded lineitem must reach the parquet scan as a PushedFilter."""
    li = _t(spark, "/root/testdata/sf0.001", "lineitem")
    f = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_orderkey")
    plan = f._jdf.queryExecution().executedPlan().toString()
    import re

    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    assert pushed and "l_shipdate" in pushed[0], pushed


def test_t_repins_utc_on_foreign_session(spark):
    """The driver passes its own session, which may carry any timezone; _t
    must repin UTC before any query executes (verified end-to-end by the
    driver-sim: a bare America/New_York session hash-matches all oracles)."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        from cassandra_util_spark.entry_queries import QUERIES

        n = QUERIES["retention_ttl"](spark, "/root/testdata/sf0.001").count()
        assert n > 0
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")

def test_derive_writetime_all_representations(spark, three_reps):
    """derive_writetime introspects the physical type: raw int64 nanos
    divide straight to µs (never a numeric→timestamp cast, so the
    epoch-seconds 1e9 mis-scale is impossible with or without ANSI mode),
    and all three representations agree byte-for-byte."""
    from cassandra_util_spark.functions import derive_writetime

    outs = {}
    for name, path in three_reps.items():
        df = derive_writetime(spark.read.parquet(path))
        outs[name] = sorted(df.select("event_id", "writetime").collect())
    assert outs["timestamp"] == outs["timestamp_ntz"] == outs["bigint_nanos"]
    assert len(outs["timestamp"]) == 200

    with pytest.raises(TypeError, match="unexpected physical type 'string'"):
        derive_writetime(
            spark.createDataFrame([(1, "2024-01-01")], "event_id bigint, ts string")
        )


def test_ansi_mode_pinned_on_and_numeric_cast_hazard_is_real(spark):
    """The session factory pins ANSI on.  ANSI does NOT reject a
    numeric→timestamp cast (measured: bigint casts as epoch-seconds,
    silently) — this test pins that hazard so the docs stay honest: if a
    future Spark starts rejecting the cast, writetime_micros' docstring and
    derive_writetime's reason-for-being should be revisited."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    from cassandra_util_spark.functions import derive_writetime

    df = spark.createDataFrame([(1, 1_700_000_000_000_000_000)],
                               "event_id bigint, ts bigint")
    [bad] = df.select(writetime_micros(F.col("ts")).alias("wt")).collect()
    [good] = derive_writetime(df).select("writetime").collect()
    assert bad["wt"] != good["writetime"]          # the silent 1e9 mis-scale
    assert good["writetime"] == 1_700_000_000_000_000  # nanos // 1000
