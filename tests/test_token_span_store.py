"""Streaming gram-count index → incremental token-span excision.

The batch span detector (`duplicated_token_spans`) counts the corpus'
n-grams per job; these tests pin its incremental face: a CounterStore of
additive gram-count deltas maintained by `stream_token_span_index`, with
`token_spans_from_store` probing documents against the ENTIRE ingested
history.  Pins: bit-equality with the batch operator after a drain
(including cross-batch duplicates — the reason the state must be
additive), compaction invariance, exactly-once under a replayed stream,
history-probe semantics for a NEW shard, layout validation, and the
hash_grams parameter-family discipline.
"""

from pyspark.sql import functions as F

from cassandra_util_spark.operators.counters import CounterStore
from cassandra_util_spark.operators.dedup import (
    duplicated_token_spans,
    token_spans_from_store,
)
from cassandra_util_spark.streaming.dedup import stream_token_span_index


def _docs(spark, n=200):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def _gram_store(tmp_path, name="grams"):
    return CounterStore(str(tmp_path / name), ["g"], ["c"])


def _drain(spark, docs, counters, tmp_path, n_batches=3, cp="cp", **kw):
    src = str(tmp_path / f"src-{cp}")
    for k in range(n_batches):
        docs.filter(F.col("doc_id") % n_batches == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_token_span_index(
        stream, counters, str(tmp_path / cp), id_col="doc_id",
        text_col="text", **kw,
    )
    q.awaitTermination(300)
    return src


def _spans(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_store_probe_equals_batch_operator(spark, tmp_path):
    """Drain the corpus in 3 micro-batches, probe the FULL corpus against
    the store: bit-equal to the single-job batch operator.  Cross-batch
    duplicates are the load-bearing case — a gram seen once in batch 0
    and once in batch 2 must count as duplicated, which only additive
    state gets right."""
    docs = _docs(spark)
    cs = _gram_store(tmp_path)
    _drain(spark, docs, cs, tmp_path)
    got = _spans(token_spans_from_store(cs, docs, "doc_id", "text", n=8))
    want = _spans(duplicated_token_spans(docs, "doc_id", "text", n=8))
    assert got == want and want  # equal AND the fixture has spans


def test_compaction_is_probe_invariant(spark, tmp_path):
    """Folding the delta runs must not move a single span (addition's
    associativity, the counter store's core claim, surfaced at the span
    level)."""
    docs = _docs(spark)
    cs = _gram_store(tmp_path)
    _drain(spark, docs, cs, tmp_path)
    before = _spans(token_spans_from_store(cs, docs, "doc_id", "text", n=8))
    assert cs.compact(spark) is not None  # 3 runs -> folded
    after = _spans(token_spans_from_store(cs, docs, "doc_id", "text", n=8))
    assert after == before


def test_replayed_stream_does_not_double_count(spark, tmp_path):
    """Re-running the drained stream over the same source with the SAME
    checkpoint must be a no-op (batch HWM guard): gram counts unchanged,
    spans unchanged.  Double-counted deltas would mark every gram
    duplicated — the additive-state failure the guard exists for."""
    docs = _docs(spark)
    cs = _gram_store(tmp_path)
    src = _drain(spark, docs, cs, tmp_path)
    want = _spans(token_spans_from_store(cs, docs, "doc_id", "text", n=8))
    total_before = cs.totals(spark).agg(F.sum("c")).collect()[0][0]

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_token_span_index(
        stream, cs, str(tmp_path / "cp"), id_col="doc_id", text_col="text"
    )
    q.awaitTermination(300)
    assert cs.totals(spark).agg(F.sum("c")).collect()[0][0] == total_before
    assert _spans(token_spans_from_store(cs, docs, "doc_id", "text", n=8)) == want


def test_new_shard_probes_against_history(spark, tmp_path):
    """The incremental point: a NEW document duplicating HISTORICAL text
    is excised by probing only the new shard — its whole text is one
    span, found without re-reading historical content.  A fresh document
    with novel text yields no spans."""
    docs = _docs(spark)
    cs = _gram_store(tmp_path)
    _drain(spark, docs, cs, tmp_path)

    hist = docs.orderBy(F.col("doc_id")).limit(1).collect()[0]
    n_toks = len([t for t in hist["text"].lower().split() if t])
    new_shard = spark.createDataFrame(
        [(900_000, hist["text"]), (900_001, "qqq www eee rrr ttt yyy uuu iii ooo ppp")],
        "doc_id long, text string",
    )
    # the probe judges the new shard against history + itself: ingest it
    # first (batch 3), then probe just the new documents
    from cassandra_util_spark.operators.dedup import gram_count_deltas

    cs.append_increments(
        gram_count_deltas(new_shard, "doc_id", "text", n=8), name="b3"
    )
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in token_spans_from_store(
            cs, new_shard, "doc_id", "text", n=8
        ).collect()
    }
    # the copied document is ONE maximal span covering its whole stream
    assert got.get(900_000) == (0, n_toks - 1, n_toks)
    assert 900_001 not in got  # novel text: no duplicated gram


def test_store_layout_and_param_discipline(spark, tmp_path):
    """Wrongly-keyed stores fail loudly before corrupting anything, and
    hash_grams must match between index build and probe (the same
    parameter-family discipline as the LSH/sampler stores)."""
    import pytest

    bad = CounterStore(str(tmp_path / "bad"), ["gram"], ["cnt"])
    with pytest.raises(ValueError, match="keyed"):
        token_spans_from_store(bad, _docs(spark, 10), "doc_id", "text")
    with pytest.raises(ValueError, match="keyed"):
        stream_token_span_index(None, bad, "cp", "doc_id", "text")
    with pytest.raises(ValueError, match="n must be"):
        token_spans_from_store(
            _gram_store(tmp_path, "g2"), _docs(spark, 10), "doc_id", "text", n=1
        )

    # hashed index probed with hashed grams: same spans as exact store
    docs = _docs(spark, 80)
    cs = _gram_store(tmp_path, "hashed")
    _drain(spark, docs, cs, tmp_path, cp="cp-hashed", hash_grams=True)
    got = _spans(
        token_spans_from_store(cs, docs, "doc_id", "text", n=8, hash_grams=True)
    )
    want = _spans(duplicated_token_spans(docs, "doc_id", "text", n=8))
    assert got == want
