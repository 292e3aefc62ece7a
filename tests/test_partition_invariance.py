"""Partitioning-invariance battery: the engine's determinism claims, tested.

Many operators claim their results are 'identical under any partitioning'
because float-sensitive arithmetic goes through exact integer/DECIMAL
aggregates.  This battery runs the most float-sensitive contract queries
under two deliberately different execution layouts — tiny shuffle
parallelism + tiny scan splits vs the normal layout — and asserts the
COLLECTED RESULTS are identical, not merely statistically close.  A float
sum crossing a shuffle would fail here nondeterministically; the exact
designs cannot.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

# the queries whose determinism story is load-bearing: LM/quality scores
# (integer-scaled logs), ratio aggregates, z-scores from integer moments,
# BLAS-adjacent similarity, and the decimal TPC-H ratio shapes
QUERIES = [
    "bigram_lm_quality",
    "doc_commonness",
    "events_activity_anomalies",
    "q8_market_share",
    "q9_product_type_profit",
    "q17_small_quantity_revenue",
    "semantic_dedup",
    "embedding_rp_project",
    "dedup_soft_keep",
    "salted_event_rollup",
]


def _rows(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    return sorted(
        tuple(str(v) for v in row) for row in df.collect()
    )


@pytest.mark.parametrize("name", QUERIES)
def test_result_identical_across_layouts(spark, name):
    base_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    base_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)
        spark.conf.set("spark.sql.files.maxPartitionBytes", base_split)
    assert a == b, f"{name} diverged across partition layouts"
    assert a, f"{name} returned no rows — invariance vacuous"
