"""Bucketed tables: exchange-free co-located joins + bucket pruning."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.sources import (
    colocated_join,
    join_is_colocated,
    selected_buckets,
    write_bucketed,
)


@pytest.fixture
def bucketdir():
    d = tempfile.mkdtemp(prefix="bucket-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture
def bucketed_pair(spark, bucketdir):
    """orders + lineitem bucketed by order key into the same bucket count."""
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(o, "b_orders", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"], path=os.path.join(bucketdir, "o"))
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"], path=os.path.join(bucketdir, "l"))
    yield o, li
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_shuffle(spark, bucketed_pair):
    o, li = bucketed_pair
    # force the sort-merge path: broadcast would trivially hide the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select("o_orderkey", "l_linenumber")
        )
        assert join_is_colocated(j), j._jdf.queryExecution().executedPlan().toString()
        # and the result is the same join computed from the raw files
        want = (
            o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .select("o_orderkey", "l_linenumber")
        )
        assert j.count() == want.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join over raw parquet needs hash exchanges."""
    o, li = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
            "o_orderkey", "l_linenumber"
        )
        assert not join_is_colocated(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_pruning_on_key_equality(spark, bucketed_pair):
    _, li = bucketed_pair
    # autoBucketedScan drops bucket layout info from plain filter scans (it
    # only keeps it where an exchange is elided), which also forfeits bucket
    # pruning — pin it off to scan 1/N files on key equality
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        pruned = spark.table("b_lineitem").filter(F.col("l_orderkey") == 1)
        sb = selected_buckets(pruned)
        assert sb is not None and sb[0] == 1 and sb[1] == 8
        raw = li.filter(F.col("l_orderkey") == 1)
        assert pruned.count() == raw.count()
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_colocated_join_helper(spark, bucketed_pair):
    """Self-join on the bucket key through the helper: exchange-free and
    row-preserving under left_semi."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "b_orders", "b_orders", on=["o_orderkey"], how="left_semi")
        assert join_is_colocated(j)
        assert j.count() == spark.table("b_orders").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_contract_bucketed_join_plan_has_no_exchange(spark):
    """The contract query's WHOLE plan (join + downstream agg) must contain
    zero SHUFFLE exchanges — bucketing supplies the partitioning for both.
    (AQE may still broadcast a tiny side — a broadcast is not a shuffle and
    disappears at real scale thresholds; the guarded invariant is that no
    hash repartitioning of either fact table ever happens.)"""
    from cassandra_util_spark.entry_queries import QUERIES
    from cassandra_util_spark.sources.bucketed import join_is_colocated

    df = QUERIES["bucketed_colocated_join"](spark, "/root/testdata/sf0.001")
    assert join_is_colocated(df)  # no Exchange hashpartitioning anywhere
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
