"""Probe: EXACT driver-job count per micro-batch of the streaming drains.

Structured Streaming sets the job group of every job it submits to the
query's runId (StreamExecution.runStream), so
``statusTracker().getJobIdsForGroup(str(runId))`` is the full set of jobs
the drain ran — divided by the trigger count, that is the jobs-per-trigger
number VERDICT r17 item 1 asks for.  Also reports the window drain's
phase decomposition (probe_drain's timers) for the same run.

Usage: python scripts/probe_trigger_jobs.py [windows|ingest|encode]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_util_spark.core.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
which = sys.argv[1] if len(sys.argv) > 1 else "windows"
spark = get_spark("probe-trigger-jobs")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/documents.parquet").count()

import tempfile

import cassandra_util_spark.entry_queries as eq
from cassandra_util_spark.core.table import TableMeta
from cassandra_util_spark.operators.bpe import bpe_encode_ids, bpe_train, bpe_vocab
from cassandra_util_spark.sources.runs import RunStore


def drain_jobs(q):
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("drain timed out")
    run_id = str(q.runId)
    tracker = spark.sparkContext.statusTracker()
    jobs = tracker.getJobIdsForGroup(run_id)
    triggers = len([p for p in q.recentProgress if p["numInputRows"] is not None])
    return len(jobs), triggers


d = eq._t(spark, sf_dir, "documents")

if which == "windows":
    merges, words = bpe_train(d, "text", num_merges=eq._BPE_N)
    kept = words.orderBy(F.col("cnt").desc(), "word").limit(eq._BPE_OOV_KEEP)
    vocab = bpe_vocab(spark, words, merges, byte_fallback=True)
    enc = bpe_encode_ids(
        d, "doc_id", "text", kept, vocab, oov="bytes"
    ).localCheckpoint()
    from cassandra_util_spark.streaming.corpus import stream_windows

    src = eq._pinned_shard_src(
        eq._ascending_id_shards(enc), ["doc_id", "token_ids"], "ptj"
    )
    store = RunStore(
        tempfile.mkdtemp(prefix="ptj-store-"), TableMeta(("bin",), (), "writetime")
    )
    dtypes = dict(enc.dtypes)
    stream = (
        spark.readStream.schema(
            f"doc_id {dtypes['doc_id']}, token_ids {dtypes['token_ids']}"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "shard-*"))
    )
    t0 = time.monotonic()
    with eq._scoped_shuffle_partitions(spark, 8):
        q = stream_windows(
            stream, store, tempfile.mkdtemp(prefix="ptj-cp-"),
            capacity=1024, id_col="doc_id",
        )
        n, t = drain_jobs(q)
    print(f"windows drain: {n} jobs over {t} triggers = "
          f"{n / max(t, 1):.1f} jobs/trigger, wall {time.monotonic()-t0:.2f}s")
elif which == "ingest":
    from cassandra_util_spark.streaming.corpus import stream_corpus_ingest

    dd = d.select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="ptj-ing-src-")
    for k in range(3):
        dd.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    corpus_store = RunStore(
        tempfile.mkdtemp(prefix="ptj-cs-"), TableMeta(("doc_id",), (), "writetime")
    )
    index_store = RunStore(
        tempfile.mkdtemp(prefix="ptj-is-"), TableMeta(("id",), (), "writetime")
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    t0 = time.monotonic()
    with eq._scoped_shuffle_partitions(spark, 8):
        q = stream_corpus_ingest(
            stream, corpus_store, index_store,
            tempfile.mkdtemp(prefix="ptj-ing-cp-"), min_tokens=30,
        )
        n, t = drain_jobs(q)
    print(f"ingest drain: {n} jobs over {t} triggers = "
          f"{n / max(t, 1):.1f} jobs/trigger, wall {time.monotonic()-t0:.2f}s")
elif which == "encode":
    from cassandra_util_spark.sources.tokenizer import read_tokenizer, write_tokenizer

    dd = d.select("doc_id", "text")
    merges, words = bpe_train(dd, "text", num_merges=eq._BPE_N)
    path = tempfile.mkdtemp(prefix="ptj-tok-") + "/bpe"
    write_tokenizer(spark, path, words, merges, byte_fallback=True,
                    capped_words=eq._BPE_OOV_KEEP)
    _, kept, vocab, _ = read_tokenizer(spark, path)
    src = tempfile.mkdtemp(prefix="ptj-enc-src-")
    for k in range(3):
        dd.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    from cassandra_util_spark.streaming.corpus import stream_encode

    store = RunStore(
        tempfile.mkdtemp(prefix="ptj-enc-store-"),
        TableMeta(("doc_id",), (), "writetime"),
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    t0 = time.monotonic()
    with eq._scoped_shuffle_partitions(spark, 8):
        q = stream_encode(
            stream, store, tempfile.mkdtemp(prefix="ptj-enc-cp-"),
            kept, vocab, oov="bytes",
        )
        n, t = drain_jobs(q)
    print(f"encode drain: {n} jobs over {t} triggers = "
          f"{n / max(t, 1):.1f} jobs/trigger, wall {time.monotonic()-t0:.2f}s")
else:
    raise SystemExit(f"unknown probe {which!r}")
