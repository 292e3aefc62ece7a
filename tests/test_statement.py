"""Statement-builder unit tests — ports of the reference's CQLStatementSpec /
CQLHelperSpec coverage: construction, concatenation, named/positional binding,
placeholder expansion, escaping/debug rendering."""

import datetime as dt

import pytest

from cassandra_util_spark.plans.statement import Fields, In, Inline, Statement, cql, render_literal


def test_positional_binding():
    s = cql("SELECT * FROM t WHERE a = ? AND b = ?", 1, "x")
    text, args = s.to_sql()
    assert text == "SELECT * FROM t WHERE a = ? AND b = ?"
    assert args == [1, "x"]


def test_named_binding_and_repeat():
    s = cql("SELECT * FROM t WHERE a = :v OR b = :v", v=7)
    text, args = s.to_sql()
    assert text == "SELECT * FROM t WHERE a = ? OR b = ?"
    assert args == [7, 7]


def test_mixed_binding_order():
    s = cql("WHERE a = ? AND b = :n AND c = ?", 1, 2, n="mid")
    assert s.to_sql() == ("WHERE a = ? AND b = ? AND c = ?", [1, "mid", 2])


def test_in_expansion():
    s = cql("WHERE x IN ?", In([1, 2, 3]))
    assert s.to_sql() == ("WHERE x IN (?, ?, ?)", [1, 2, 3])


def test_fields_expansion():
    s = cql("UPDATE t SET ? WHERE id = ?", Fields({"a": 1, "b": 2}), 9)
    assert s.to_sql() == ("UPDATE t SET a = ?, b = ? WHERE id = ?", [1, 2, 9])


def test_inline_splice():
    s = cql("SELECT * FROM ?.? WHERE k = ?", Inline("ks"), Inline("tbl"), 5)
    assert s.to_sql() == ("SELECT * FROM ks.tbl WHERE k = ?", [5])


def test_concatenation_realigns_params():
    s = cql("SELECT * FROM t WHERE a = ?", 1) + cql(" AND b = ?", 2) + " ORDER BY c"
    assert s.to_sql() == ("SELECT * FROM t WHERE a = ? AND b = ? ORDER BY c", [1, 2])


def test_too_many_markers():
    with pytest.raises(ValueError, match="more \\? markers"):
        cql("WHERE a = ? AND b = ?", 1)


def test_unused_args():
    with pytest.raises(ValueError, match="unused positional"):
        cql("WHERE a = ?", 1, 2)


def test_missing_named():
    with pytest.raises(ValueError, match="missing named parameter :x"):
        cql("WHERE a = :x")


def test_render_escaping():
    # string quote doubling, hex blobs, ISO-8601 UTC timestamps — the
    # reference's escaping rules (CQLStatement.scala:270-281)
    assert render_literal("it's") == "'it''s'"
    assert render_literal(b"\x01\xff") == "0x01ff"
    assert render_literal(dt.datetime(2016, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc)) == "'2016-01-02T03:04:05Z'"
    assert render_literal(None) == "null"
    assert render_literal(True) == "true"
    assert render_literal([1, "a"]) == "[1, 'a']"
    assert render_literal({"k": 1}) == "{'k': 1}"


def test_render_statement():
    s = cql("INSERT INTO t (a, b) VALUES (?, ?)", "o'brien", 5)
    assert s.render() == "INSERT INTO t (a, b) VALUES ('o''brien', 5)"


def test_execute_against_spark(spark):
    spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string") \
        .createOrReplaceTempView("stmt_t")
    s = cql("SELECT count(*) AS n FROM stmt_t WHERE id IN ? AND v != ?", In([1, 2]), "zz")
    assert s.execute(spark).collect()[0]["n"] == 2


def test_render_literal_question_mark_in_text():
    # a literal '?' inside a text part must not misalign substitutions
    # (render works from the IR, not by re-splitting the joined text)
    s = Statement(("SELECT * FROM t WHERE q = '??' AND a = ", " AND b = ", ""), (1, 2))
    assert s.render() == "SELECT * FROM t WHERE q = '??' AND a = 1 AND b = 2"
    # a rendered string param containing '?' must not swallow later params
    s2 = Statement(("SELECT ", " AS a, ", " AS b"), ("what?", 7))
    assert s2.render() == "SELECT 'what?' AS a, 7 AS b"


def test_empty_in_raises():
    with pytest.raises(ValueError, match="at least one value"):
        cql("WHERE x IN ?", In([])).to_sql()
