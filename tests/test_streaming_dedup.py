"""Streaming LSH signature index — persisted near-dup state with the run
store's replay/LWW discipline.

The batch operators promise that "at warehouse scale the reference side's
signature table is the persisted index an incremental crawl maintains"
(``lsh_dedup_against``); these tests pin the maintained index itself:
bit-identical to batch signatures after a drain, LWW on re-crawled ids,
probe results equal to the recompute-everything path, and layout
validation that fails loudly before a wrongly-keyed store corrupts
anything.
"""

from pyspark.sql import functions as F

from cassandra_util_spark.core.table import TableMeta
from cassandra_util_spark.operators.dedup import (
    lsh_dedup_against,
    lsh_dedup_from_store,
    minhash_signatures,
)
from cassandra_util_spark.sources.runs import RunStore
from cassandra_util_spark.streaming.dedup import stream_lsh_index


def _docs(spark, n=300):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def _index_store(tmp_path, name="lsh-runs"):
    return RunStore(str(tmp_path / name), TableMeta(("id",), (), "writetime"))


def _drain(spark, docs, store, tmp_path, splits, cp="cp"):
    src = str(tmp_path / f"src-{cp}")
    for lo, hi in splits:
        docs.filter(F.col("doc_id").between(lo, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_lsh_index(
        stream, store, str(tmp_path / cp), id_col="doc_id", text_col="text"
    )
    q.awaitTermination(120)


def test_streamed_index_matches_batch_signatures(spark, tmp_path):
    """After draining N micro-batches, the persisted index holds EXACTLY the
    batch-computed signatures — bit-identical arrays, one row per doc (the
    determinism that makes replayed batches safe to no-op)."""
    docs = _docs(spark)
    store = _index_store(tmp_path)
    _drain(spark, docs, store, tmp_path, [(0, 99), (100, 199), (200, 10**9)])
    assert len(store.live_runs()) == 3
    got = {
        r["id"]: tuple(r["sig"]) for r in store.read_merged(spark).collect()
    }
    want = {
        r["id"]: tuple(r["sig"])
        for r in minhash_signatures(docs, "doc_id", "text").collect()
    }
    assert got == want


def test_recrawl_lww_keeps_newest_signature(spark, tmp_path):
    """A re-crawled document (same id, edited text in a LATER batch) must
    read back with the NEW text's signature: writetime = batch id, LWW."""
    docs = _docs(spark, 50)
    edited = docs.withColumn(
        "text",
        F.concat_ws(
            " ",
            F.lit("recrawl"),
            F.col("doc_id").cast("string"),
            F.lit("completely new content tokens alpha beta gamma delta"),
        ),
    )
    store = _index_store(tmp_path)
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").parquet(src)
    edited.filter(F.col("doc_id") < 10).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_lsh_index(
        stream, store, str(tmp_path / "cp"), id_col="doc_id", text_col="text"
    )
    q.awaitTermination(120)
    merged = {r["id"]: tuple(r["sig"]) for r in store.read_merged(spark).collect()}
    assert len(merged) == 50
    new_sigs = {
        r["id"]: tuple(r["sig"])
        for r in minhash_signatures(
            edited.filter(F.col("doc_id") < 10), "doc_id", "text"
        ).collect()
    }
    old_sigs = {
        r["id"]: tuple(r["sig"])
        for r in minhash_signatures(docs, "doc_id", "text").collect()
    }
    for i in range(10):
        assert merged[i] == new_sigs[i] != old_sigs[i]
    for i in range(10, 50):
        assert merged[i] == old_sigs[i]


def test_probe_from_store_matches_direct_probe(spark, tmp_path):
    """lsh_dedup_from_store over the maintained index == lsh_dedup_against
    with the reference recomputed from content — same survivors, and the
    known planted near-dups are actually dropped (non-vacuous)."""
    all_docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    reference = all_docs.filter(F.col("doc_id") < 250)
    incoming = all_docs.filter(F.col("doc_id") >= 200)
    store = _index_store(tmp_path)
    _drain(spark, reference, store, tmp_path, [(0, 124), (125, 10**9)])
    got = {
        r["doc_id"]
        for r in lsh_dedup_from_store(incoming, store, "doc_id", "text").collect()
    }
    want = {
        r["doc_id"]
        for r in lsh_dedup_against(incoming, reference, "doc_id", "text").collect()
    }
    assert got == want
    dropped = {r["doc_id"] for r in incoming.collect()} - got
    assert dropped, "probe dropped nothing — test corpus has no overlap?"


def test_wrong_store_layout_raises(spark, tmp_path):
    store = RunStore(
        str(tmp_path / "bad"), TableMeta(("doc_id",), (), "writetime")
    )
    (tmp_path / "nosrc").mkdir()
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        str(tmp_path / "nosrc")
    )
    try:
        stream_lsh_index(stream, store, str(tmp_path / "cp"), "doc_id", "text")
        raise AssertionError("expected ValueError for wrong index keys")
    except ValueError as e:
        assert "keyed on ('id',)" in str(e)
