"""Token-granular maximal duplicated spans (duplicated_token_spans):
exact offsets, scope semantics, and the full-duplicate cover property —
the fine-grained counterpart of the chunk-grid span excision tests."""

from __future__ import annotations

def test_duplicated_token_spans_exact_offsets_and_scopes(spark):
    """Token-granular maximal spans: exact 0-based offsets for a shared
    run at different positions in two docs; unique docs absent; the
    cross_doc scope ignores within-document repeats that global counts."""
    from cassandra_util_spark.operators.dedup import duplicated_token_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (0, "xx yy " + shared + " zz"),
        (1, shared + " ww qq"),
        (2, "one two three four five six seven eight nine ten"),
        # within-doc repeat: the same 9 tokens twice in one doc
        (3, "p1 p2 p3 p4 p5 p6 p7 p8 p9 mid p1 p2 p3 p4 p5 p6 p7 p8 p9"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_token_spans(df, "doc_id", "text", n=8).collect()
    }
    assert (0, 2, 13, 12) in got and (1, 0, 11, 12) in got
    assert not any(d == 2 for d, *_ in got)
    assert any(d == 3 for d, *_ in got)  # global scope sees the self-repeat
    cross = {
        r["doc_id"]
        for r in duplicated_token_spans(
            df, "doc_id", "text", n=8, scope="cross_doc"
        ).collect()
    }
    assert cross == {0, 1}  # self-repeats need >=2 distinct docs

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n must be"):
        duplicated_token_spans(df, "doc_id", "text", n=1)
    with _pytest.raises(ValueError, match="unknown scope"):
        duplicated_token_spans(df, "doc_id", "text", scope="bogus")


def test_duplicated_token_spans_cover_whole_duplicate(spark):
    """A fully duplicated document is one span covering every token."""
    from cassandra_util_spark.operators.dedup import duplicated_token_spans

    text = " ".join(f"t{i}" for i in range(30))
    df = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string"
    )
    out = duplicated_token_spans(df, "doc_id", "text", n=8).collect()
    assert len(out) == 2
    for r in out:
        assert (r["span_start"], r["span_end"], r["span_tokens"]) == (0, 29, 30)
