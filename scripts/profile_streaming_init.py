"""Attribute dedup_streaming_lsh's first-streaming-query cost (VERDICT r9
task 2 / r10 task 2): how much of the 5-8 s bench line is one-time
streaming-machinery init (first WAL/offset-log/microbatch-thread spin-up of
the session) vs the query's own per-batch signature hashing and store work.

Method, all in ONE fresh session so nothing else absorbs the init:

1. ``--cold-lsh`` order: run the LSH index drain FIRST (it pays init),
   then an identical drain again (warm), then a trivial no-op drain.
2. default order: run a TRIVIAL no-op streaming drain first (a 2-row
   parquet source into a no-op foreachBatch) — if IT absorbs the same
   init, the cost is machinery, not LSH — then the LSH drain twice.

Per drain we report wall time and the per-trigger ``durationMs`` phases
from ``StreamingQuery.recentProgress`` (addBatch = the batch's real work;
triggerExecution = everything; the gap plus walCommit/offset phases is
streaming bookkeeping).

Prints a markdown table; SCALING.md's analysis section is updated by hand
from it (the table is tiny and the narrative is the point).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def drain_noop(spark) -> tuple:
    from pyspark.sql import functions as F

    src = tempfile.mkdtemp(prefix="noop-src-")
    spark.range(2).withColumn("x", F.lit("y")).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema("id bigint, x string").parquet(src)
    t0 = time.monotonic()
    q = (
        stream.writeStream.foreachBatch(lambda df, bid: None)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="noop-cp-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return time.monotonic() - t0, list(q.recentProgress)


def drain_lsh(spark) -> tuple:
    """The dedup_streaming_lsh drain, verbatim (entry_queries.py), with the
    StreamingQuery kept so recentProgress survives."""
    from pyspark.sql import functions as F

    from cassandra_util_spark.core.table import TableMeta
    from cassandra_util_spark.sources.runs import RunStore
    from cassandra_util_spark.streaming.dedup import stream_lsh_index

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    reference = d.filter(F.col("doc_id") < 300)
    src = tempfile.mkdtemp(prefix="lsh-prof-src-")
    for lo, hi in ((0, 149), (150, 299)):
        reference.filter(F.col("doc_id").between(lo, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = RunStore(
        tempfile.mkdtemp(prefix="lsh-prof-store-"), TableMeta(("id",), (), "writetime")
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    t0 = time.monotonic()
    q = stream_lsh_index(
        stream,
        store,
        tempfile.mkdtemp(prefix="lsh-prof-cp-"),
        id_col="doc_id",
        text_col="text",
    )
    q.awaitTermination(300)
    return time.monotonic() - t0, list(q.recentProgress)


def phase_rows(label: str, wall: float, progress: list) -> list:
    rows = []
    for p in progress:
        d = p.asDict() if hasattr(p, "asDict") else p
        dur = d["durationMs"] if isinstance(d, dict) else p.durationMs
        dur = dict(dur)
        batch = d["batchId"] if isinstance(d, dict) else p.batchId
        rows.append(
            "| {} | batch {} | {} | {} | {} | {} | {} |".format(
                label,
                batch,
                dur.get("triggerExecution", 0),
                dur.get("addBatch", 0),
                dur.get("queryPlanning", 0),
                dur.get("walCommit", 0) + dur.get("commitOffsets", 0),
                dur.get("latestOffset", 0) + dur.get("getBatch", 0),
            )
        )
    rows.append(f"| {label} | TOTAL wall | {wall * 1000:.0f} | | | | |")
    return rows


def main() -> None:
    from cassandra_util_spark.core.session import get_spark

    cold_lsh = "--cold-lsh" in sys.argv
    spark = get_spark("stream-init-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # match bench conditions: warm the batch-side scan cache the way a
    # bench suite position would NOT — keep everything cold except the JVM
    order = (
        [("lsh#1(cold)", drain_lsh), ("lsh#2(warm)", drain_lsh), ("noop", drain_noop)]
        if cold_lsh
        else [("noop(cold)", drain_noop), ("lsh#1", drain_lsh), ("lsh#2", drain_lsh)]
    )
    print("| drain | trigger | triggerExecution ms | addBatch ms | "
          "queryPlanning ms | wal+commitOffsets ms | offset+getBatch ms |")
    print("|---|---|---|---|---|---|---|")
    for label, fn in order:
        wall, progress = fn(spark)
        for row in phase_rows(label, wall, progress):
            print(row)
    spark.stop()


if __name__ == "__main__":
    main()
