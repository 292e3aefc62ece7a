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


def test_excise_token_spans_semantics(spark):
    """Excision drops exactly the spanned tokens: a fully duplicated
    document survives as empty text (everything removed), a document with
    one duplicated region keeps its unique prefix/suffix, and a clean
    document passes through intact with zero removals.  The surviving
    text is the NORMALIZED token stream re-joined — the same stream the
    span offsets index."""
    from cassandra_util_spark.operators.dedup import excise_token_spans

    dup = " ".join(f"d{i}" for i in range(12))
    uniq_a = "aa0 aa1 aa2 aa3 aa4"
    uniq_b = "bb0 bb1 bb2 bb3 bb4"
    rows = [
        (0, dup),                              # whole doc duplicated
        (1, dup),                              # its twin
        (2, f"{uniq_a} {dup} {uniq_b}"),       # dup island mid-document
        (3, "cc0 cc1 cc2 cc3 cc4 cc5 cc6 cc7 cc8 cc9"),  # clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_tokens_removed"])
        for r in excise_token_spans(df, "doc_id", "text", n=8).collect()
    }
    assert set(got) == {0, 1, 2, 3}  # every document is in the output
    assert got[0] == ("", 12, 12)
    assert got[1] == ("", 12, 12)
    assert got[2] == (f"{uniq_a} {uniq_b}", 22, 12)
    assert got[3][1:] == (10, 0) and got[3][0].startswith("cc0")


def test_excise_accepts_store_probed_spans(spark):
    """The spans= hook: excising a shard against an externally detected
    span set (e.g. a token_spans_from_store probe) uses those spans
    verbatim — the incremental-excision composition."""
    from cassandra_util_spark.operators.dedup import excise_token_spans

    df = spark.createDataFrame(
        [(7, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(7, 2, 5, 4)],
        "doc_id long, span_start long, span_end long, span_tokens long",
    )
    got = excise_token_spans(df, "doc_id", "text", spans=spans).collect()[0]
    assert got["text"] == "w0 w1 w6 w7 w8 w9"
    assert (got["n_tokens"], got["n_tokens_removed"]) == (10, 4)
