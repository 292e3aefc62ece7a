"""Log-cost weighted bottom-k sampler (VERDICT r9 task 6 / r10 task 7 /
r11 task 2 — the last remaining 100 TB cost caveat).

Pins three independent contracts:

1. REPLAY — the Spark priority is bit-identical to an engine-independent
   pure-Python reference (md5 + IEEE binary64 sqrt chain), the property
   that lets the DuckDB oracle hash-match exactly.
2. DISTRIBUTION — the priority for weight w follows the exact min-of-w
   uniforms CDF 1-(1-x)^w (Kolmogorov-Smirnov against the analytic CDF),
   i.e. the binary-block decomposition really is Efraimidis-Spirakis,
   not an approximation with hidden bias.
3. COST — weights far beyond the replica form's 10,000 guard are
   accepted and the plan contains no weight-length array materialization.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.operators.sketches import (
    weighted_bottomk_sample,
    weighted_bottomk_sample_logcost,
    weighted_logcost_priority_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_priority(key: str, w: int, seed: str = "wbk", bits: int = 31) -> float:
    """Pure-Python reference: same md5 word, same binary64 sqrt chain.
    Python floats ARE IEEE binary64 and math.sqrt is correctly rounded,
    so this must equal the JVM result bit-for-bit."""
    best = 9.0
    for j in range(bits):
        if not (w >> j) & 1:
            continue
        h = int(hashlib.md5(f"{seed}:{key}:b{j}".encode()).hexdigest()[:8], 16)
        x = 1.0 - (h + 0.5) / 4294967296.0
        for _ in range(j):
            x = math.sqrt(x)
        best = min(best, 1.0 - x)
    return best


def test_spark_priority_bit_identical_to_python_reference(spark):
    rows = [(f"k{i}", 1 + (i * 37) % 1_500_000) for i in range(200)]
    df = spark.createDataFrame(rows, "key string, wt long")
    got = {
        r["key"]: (r["pri"], r["wt"])
        for r in weighted_bottomk_sample_logcost(
            df, "key", "wt", k=200
        ).collect()
    }
    assert len(got) == 200
    for key, (pri, w) in got.items():
        # == on floats is deliberate: the contract IS bit-identity
        assert pri == _py_priority(key, w), (key, w, pri, _py_priority(key, w))


def test_priority_distribution_is_exact_min_of_w(spark):
    """KS test of the priority sample against the analytic min-of-w CDF
    F(x) = 1-(1-x)^w, at an awkward weight (many set bits).  n=20000 keys;
    critical value at alpha=1e-6 is 1.86/sqrt(n) ≈ 0.0132 — a hidden bias
    from the block decomposition (e.g. a wrong block size) shifts the CDF
    by O(1/w·bits) and fails this by orders of magnitude."""
    n = 20_000
    for w in (1, 6, 1_000, 999_999):  # 1 bit, 2 bits, 6 bits, 20 bits
        pris = sorted(_py_priority(f"ks{i}", w) for i in range(n))
        ks = max(
            max(abs((i + 1) / n - (1 - (1 - x) ** w)),
                abs(i / n - (1 - (1 - x) ** w)))
            for i, x in enumerate(pris)
        )
        assert ks < 1.86 / math.sqrt(n), (w, ks)


def test_selection_probability_proportional_to_weight(spark):
    """E-S head property: P(row wins rank 1) = w_i / Σw.  Two classes,
    weight 1 vs weight 19 (n=400 each): the heavy class should take
    ~95% of the k=40 sample slots; binomial 6-sigma band."""
    rows = [(f"light{i}", 1) for i in range(400)] + [
        (f"heavy{i}", 19) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "key string, wt long")
    sample = weighted_bottomk_sample_logcost(df, "key", "wt", k=40).collect()
    heavy = sum(1 for r in sample if r["key"].startswith("heavy"))
    # p = 19/20 per slot (weights uniform within class); 6-sigma ≈ 8.3
    assert heavy >= 30, heavy


def test_large_weights_accepted_and_replica_form_rejects(spark):
    df = spark.createDataFrame(
        [("a", 1_000_000), ("b", 500_000), ("c", 1)], "key string, wt long"
    )
    out = weighted_bottomk_sample_logcost(df, "key", "wt", k=3).collect()
    assert len(out) == 3
    with pytest.raises(Exception):
        weighted_bottomk_sample(df, "key", "wt", k=3).collect()


def test_no_weight_length_array_in_plan(spark):
    """The whole point: the plan must not materialize a sequence(1, w)
    replica array — cost must be O(log w) branches, not O(w) rows."""
    df = spark.createDataFrame([("a", 1_000_000)], "key string, wt long")
    plan = weighted_bottomk_sample_logcost(
        df, "key", "wt", k=1
    )._jdf.queryExecution().analyzed().toString()
    assert "sequence" not in plan.lower(), plan[:2000]


def test_out_of_range_weights_raise(spark):
    for bad in (0, -3, 1 << 31):
        df = spark.createDataFrame([("a", bad)], "key string, wt long")
        with pytest.raises(Exception, match="weight out of"):
            weighted_bottomk_sample_logcost(df, "key", "wt", k=1).collect()


def test_oracle_sql_matches_spark_bitwise(spark):
    """The generated DuckDB SQL replays the identical draw — the property
    the driver's value-hash gate depends on."""
    import duckdb

    rows = [(f"d{i}", 1 + (i * 7919) % 1_200_000) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, wt long")
    got = {
        r["key"]: r["pri"]
        for r in weighted_bottomk_sample_logcost(df, "key", "wt", k=100).collect()
    }
    pri_sql = weighted_logcost_priority_sql("key", "wt")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, wt BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for key, pri in con.execute(f"SELECT key, {pri_sql} FROM t").fetchall():
        assert pri == got[key], (key, pri, got[key])


def test_shard_merge_is_lossless(spark):
    """Bottom-k closure: sample(shard1) ∪ sample(shard2) re-sampled equals
    sample(whole) — priorities are pure (seed, key, weight) functions."""
    rows = [(f"m{i}", 1 + (i * 101) % 50_000) for i in range(500)]
    df = spark.createDataFrame(rows, "key string, wt long")
    whole = {
        r["key"]
        for r in weighted_bottomk_sample_logcost(df, "key", "wt", k=25).collect()
    }
    s1 = weighted_bottomk_sample_logcost(
        df.filter("hash(key) % 2 = 0"), "key", "wt", k=25
    )
    s2 = weighted_bottomk_sample_logcost(
        df.filter("hash(key) % 2 != 0"), "key", "wt", k=25
    )
    merged = {
        r["key"]
        for r in weighted_bottomk_sample_logcost(
            s1.unionByName(s2).drop("pri"), "key", "wt", k=25
        ).collect()
    }
    assert merged == whole


def test_grouped_sample_sizes_and_group_independence(spark):
    """Per-group weighted bottom-k: every group holds exactly
    min(k, |group|) rows, and — because the priority is a pure
    (seed, key, weight) function — a group's sample equals the GLOBAL
    log-cost sampler run on that group alone (stratification changes
    which rows compete, never their priorities)."""
    from cassandra_util_spark.operators.sketches import (
        weighted_bottomk_sample_grouped,
    )

    rows = [
        (f"g{i % 3}", f"k{i}", 1 + (i * 7919) % 900_000) for i in range(300)
    ] + [("tiny", f"t{i}", 5) for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, key string, wt long")
    out = weighted_bottomk_sample_grouped(df, "grp", "key", "wt", k=10)
    by_group: dict = {}
    for r in out.collect():
        by_group.setdefault(r["grp"], set()).add(r["key"])
    assert {g: len(ks) for g, ks in by_group.items()} == {
        "g0": 10, "g1": 10, "g2": 10, "tiny": 4
    }
    for g in ("g0", "g1", "g2"):
        solo = {
            r["key"]
            for r in weighted_bottomk_sample_logcost(
                df.filter(F.col("grp") == g), "key", "wt", k=10
            ).collect()
        }
        assert by_group[g] == solo, g


def test_grouped_sample_shard_merge_per_group(spark):
    """Shard closure, per group: union of shard-local grouped samples
    re-ranked per group equals the grouped sample of the whole."""
    from pyspark.sql import Window

    from cassandra_util_spark.operators.sketches import (
        weighted_bottomk_sample_grouped,
    )

    rows = [(f"g{i % 2}", f"k{i}", 1 + (i * 101) % 50_000) for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, key string, wt long")
    whole = {
        (r["grp"], r["key"])
        for r in weighted_bottomk_sample_grouped(df, "grp", "key", "wt", k=8).collect()
    }
    s1 = weighted_bottomk_sample_grouped(
        df.filter("hash(key) % 2 = 0"), "grp", "key", "wt", k=8
    )
    s2 = weighted_bottomk_sample_grouped(
        df.filter("hash(key) % 2 != 0"), "grp", "key", "wt", k=8
    )
    u = s1.unionByName(s2)
    w = Window.partitionBy("grp").orderBy(F.col("pri").asc(), F.col("key").asc())
    merged = {
        (r["grp"], r["key"])
        for r in u.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= 8)
        .collect()
    }
    assert merged == whole


def test_grouped_sampler_plans_map_side_group_limit(spark):
    """The 100 TB skew property of every grouped bottom-k: rank ≤ k over a
    per-group window must compile to a PARTIAL WindowGroupLimit BEFORE the
    exchange (each map task pre-keeps its own k per group, so a hot group
    ships ≤ maps·k rows instead of its whole volume into one task) plus
    the Final pass after.  A change that breaks the rank-pushdown pattern
    (e.g. a filter Catalyst cannot see through) would silently reintroduce
    the single-task hot-group bottleneck."""
    from cassandra_util_spark.operators.sketches import (
        bottomk_sample_grouped,
        weighted_bottomk_sample_grouped,
    )

    rows = [(f"g{i % 3}", f"k{i}", 1 + i % 1000) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, key string, wt long")
    for out in (
        weighted_bottomk_sample_grouped(df, "grp", "key", "wt", k=8),
        bottomk_sample_grouped(df, "grp", "key", k=8),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:1500]
        assert "Final" in plan, plan[:1500]


def test_sql_generator_property_matches_python_reference():
    """Hypothesis sweep (no Spark needed): for random (key, weight, seed)
    the generated DuckDB SQL evaluates bit-identically to the pure-Python
    IEEE reference — the SQL generator has no weight-bit, seed, or key
    edge cases.  Runs on the binary64 contract alone, so it also guards
    the generator against a refactor that drifts from the Spark
    expression (both are pinned to the same reference)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    key_st = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-", min_size=1, max_size=24
    )
    seed_st = st.sampled_from(["wbk", "wlc", "a.b:c-9", "X_1"])

    @settings(max_examples=60, deadline=None)
    @given(key=key_st, w=st.integers(min_value=1, max_value=(1 << 21) - 1),
           seed=seed_st)
    def check(key, w, seed):
        con = duckdb.connect()
        sql = weighted_logcost_priority_sql("k", "w", seed=seed)
        got = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS k, CAST(? AS BIGINT) AS w)",
            [key, w],
        ).fetchone()[0]
        assert got == _py_priority(key, w, seed=seed), (key, w, seed)

    check()


def test_sql_generator_rejects_quotable_seed():
    with pytest.raises(ValueError, match="inlined"):
        weighted_logcost_priority_sql("k", "w", seed="bad'seed")
