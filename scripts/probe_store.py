"""Probe: stage-level timing of the store-backed decode round-trip
fixture — bpe_train / encode+checkpoint / shard writes / streaming drain /
merged read + inversion — so optimization targets the stage that owns the
time (guide §1.1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_util_spark.core.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe-store")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm

import cassandra_util_spark.entry_queries as eq
from cassandra_util_spark.operators.bpe import bpe_encode_ids, bpe_train, bpe_vocab

t0 = time.monotonic()
d = eq._t(spark, sf_dir, "documents")
merges, words = bpe_train(d, "text", num_merges=eq._BPE_N)
t1 = time.monotonic()
kept = words.orderBy(F.col("cnt").desc(), "word").limit(eq._BPE_OOV_KEEP)
vocab = bpe_vocab(spark, words, merges, byte_fallback=True)
t2 = time.monotonic()
enc = bpe_encode_ids(d, "doc_id", "text", kept, vocab, oov="bytes").localCheckpoint()
t3 = time.monotonic()
shards = eq._ascending_id_shards(enc)
t4 = time.monotonic()
store = eq._drain_windows_store(spark, shards, "doc_id", capacity=1024, prefix="probe")
t5 = time.monotonic()
win = store.read_merged(spark).select("bin", "token_ids", "doc_spans").localCheckpoint()
t6 = time.monotonic()
out = eq._decode_roundtrip_view(d, win, vocab)
out.write.format("noop").mode("overwrite").save()
t7 = time.monotonic()
print(f"bpe_train({eq._BPE_N}): {t1-t0:.2f}s")
print(f"vocab/kept:    {t2-t1:.2f}s")
print(f"encode+ckpt:   {t3-t2:.2f}s")
print(f"shard split:   {t4-t3:.2f}s")
print(f"drain (3 mb):  {t5-t4:.2f}s")
print(f"read+ckpt:     {t6-t5:.2f}s")
print(f"inversion:     {t7-t6:.2f}s")
print(f"TOTAL:         {t7-t0:.2f}s")
