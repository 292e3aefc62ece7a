"""Convictor x PK-layout matrix — the reference's test style 1
(DeletingCompactionStrategySpec.scala:75-177): six a,b,c,d key layouts x the
example convictors, asserting surviving row counts."""

import pytest

from cassandra_util_spark.operators.convictors import create_convictor
from cassandra_util_spark.operators.retention import RetentionJob

LAYOUTS = {
    "singlepk_nock": (["a"], []),
    "singlepk_singleck": (["a"], ["b"]),
    "singlepk_dualck": (["a"], ["b", "c"]),
    "dualpk_nock": (["a", "b"], []),
    "dualpk_singleck": (["a", "b"], ["c"]),
    "dualpk_dualck": (["a", "b"], ["c", "d"]),
}

# 10x10 grid: a,b in 0..9; c=100000+a; d=100000+b (100 rows)
EXPECT = {
    # convictor -> {layout: surviving rows}
    "keep_all": {layout: 100 for layout in LAYOUTS},
    "delete_all_partitions": {layout: 0 for layout in LAYOUTS},
    # atom-level conviction == partition-level in the row model (a row is the
    # atom group); the matrix states the identity explicitly
    "delete_all_atoms": {layout: 0 for layout in LAYOUTS},
    "odd_pk": {layout: 50 for layout in LAYOUTS},  # a even
    "delete_all_clusters": {
        # convicts everything in tables WITH clustering keys, nothing otherwise
        "singlepk_nock": 100,
        "singlepk_singleck": 0,
        "singlepk_dualck": 0,
        "dualpk_nock": 100,
        "dualpk_singleck": 0,
        "dualpk_dualck": 0,
    },
    "odd_ck": {
        # keeps last-ck-even; no cks => keeps everything
        "singlepk_nock": 100,
        "singlepk_singleck": 50,   # b even
        "singlepk_dualck": 50,     # c = 100000+a even => a even
        "dualpk_nock": 100,
        "dualpk_singleck": 50,     # c even => a even
        "dualpk_dualck": 50,       # d = 100000+b even => b even
    },
}


@pytest.mark.parametrize("convictor_name", sorted(EXPECT))
@pytest.mark.parametrize("layout", sorted(LAYOUTS))
def test_matrix(abcd, convictor_name, layout, spark):
    pks, cks = LAYOUTS[layout]
    table = abcd(pks, cks)
    conv = create_convictor(convictor_name, table)
    stats = RetentionJob(table, conv).run()
    assert stats.kept == EXPECT[convictor_name][layout], (convictor_name, layout)
    assert stats.kept + stats.convicted == 100


def test_configurable_deleter_fixture(abcd):
    """The JSON fixture from DeletingCompactionStrategySpec.scala:55-60 on
    singlepk_singleck with a 30x30 grid: kept iff a NOT in {<=5,8,>=11} AND
    b NOT in {<=15,18,>=21} => a in {6,7,9,10} x b in {16,17,19,20} = 16."""
    table = abcd(["a"], ["b"], a=30, b=30)
    conv = create_convictor(
        "configurable_deleter",
        table,
        delete_keys='{"a": [8, [null, 5], ["11", null]],'
        ' "b": [18, [null, 15], ["21", null]], "c": "1", "d": []}',
    )
    # c is not a key column in this layout: ignored with a warning; d empty
    assert any("non-key column 'c'" in w for w in conv.warnings)
    stats = RetentionJob(table, conv).run()
    assert stats.kept == 16
    assert stats.kept + stats.convicted == 900


def test_odd_token_disperses(abcd):
    """xxhash64 token parity keeps roughly half (not exactly — it's a hash)."""
    table = abcd(["a"], ["b"], a=100, b=1)
    conv = create_convictor("odd_token", table)
    stats = RetentionJob(table, conv).run()
    assert 30 <= stats.kept <= 70


def test_configurable_deleter_bytes_vs_typed_negative_keys(spark):
    """Where typed and byte-wise unsigned orders genuinely diverge: negative
    integer keys.  CQL serializes ints big-endian two's complement and the
    reference compares those bytes UNSIGNED (ConfigurableDeleter.java:272-275)
    — so -3 sorts AFTER 8, and a [0, null) range swallows negatives too."""
    from cassandra_util_spark.core.table import KeyedTable, TableMeta
    from cassandra_util_spark.operators.convictors import (
        ConfigurableDeleter,
        ConfigurationError,
        create_convictor,
    )

    df = spark.createDataFrame([(-5,), (-1,), (0,), (3,), (8,)], "a bigint")
    table = KeyedTable(df, TableMeta(("a",)), "negs")

    # range [0, unbounded): typed keeps negatives; bytes convicts them too
    typed = ConfigurableDeleter(table, delete_keys='{"a": [[0, null]]}')
    kept_typed = {r["a"] for r in df.filter(typed.keep_expr()).collect()}
    assert kept_typed == {-5, -1}

    by = ConfigurableDeleter(table, delete_keys='{"a": [[0, null]]}', compare="bytes")
    kept_bytes = {r["a"] for r in df.filter(by.keep_expr()).collect()}
    assert kept_bytes == set()  # negatives sort above every positive

    # range [-3, 5]: typed convicts -3..5; bytes sees lo > hi => empty range
    typed2 = ConfigurableDeleter(table, delete_keys='{"a": [["-3", "5"]]}')
    assert {r["a"] for r in df.filter(typed2.keep_expr()).collect()} == {-5, 8}
    bytes2 = ConfigurableDeleter(table, delete_keys='{"a": [["-3", "5"]]}', compare="bytes")
    assert {r["a"] for r in df.filter(bytes2.keep_expr()).collect()} == {-5, -1, 0, 3, 8}

    # both modes agree on the reference's own fixture domain (non-negative)
    nn = spark.createDataFrame([(0,), (3,), (8,), (11,)], "a bigint")
    nn_table = KeyedTable(nn, TableMeta(("a",)), "nonneg")
    for mode in ("typed", "bytes"):
        conv = ConfigurableDeleter(nn_table, delete_keys='{"a": [[3, 8]]}', compare=mode)
        assert {r["a"] for r in nn.filter(conv.keep_expr()).collect()} == {0, 11}

    with pytest.raises(ConfigurationError, match="typed.*bytes|bytes.*typed"):
        create_convictor("configurable_deleter", table, delete_keys="{}", compare="nope")
