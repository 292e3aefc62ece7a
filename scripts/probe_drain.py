"""Probe: time the sub-phases of the streaming window-store drain by
monkeypatching timers around the protocol's building blocks."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_util_spark.core.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe-drain")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/documents.parquet").count()

import cassandra_util_spark.entry_queries as eq
import cassandra_util_spark.operators.packing as packing
import cassandra_util_spark.streaming.corpus as corpus
from cassandra_util_spark.operators.bpe import bpe_encode_ids, bpe_train, bpe_vocab
from cassandra_util_spark.sources import runs as runs_mod

acc: dict = {}


def timed(mod, name):
    orig = getattr(mod, name)

    def wrap(*a, **kw):
        t0 = time.monotonic()
        out = orig(*a, **kw)
        acc[name] = acc.get(name, 0.0) + (time.monotonic() - t0)
        acc[name + "#"] = acc.get(name + "#", 0) + 1
        return out

    setattr(mod, name, wrap)


timed(packing, "_windows_shard_step")
timed(corpus, "_prior_max_bin_runs")
timed(runs_mod.RunStore, "append_run")
timed(runs_mod.RunStore, "read_merged")
timed(eq, "_pinned_shard_src")

d = eq._t(spark, sf_dir, "documents")
merges, words = bpe_train(d, "text", num_merges=eq._BPE_N)
kept = words.orderBy(F.col("cnt").desc(), "word").limit(eq._BPE_OOV_KEEP)
vocab = bpe_vocab(spark, words, merges, byte_fallback=True)
enc = bpe_encode_ids(d, "doc_id", "text", kept, vocab, oov="bytes").localCheckpoint()
t0 = time.monotonic()
store = eq._drain_windows_store(
    spark, eq._ascending_id_shards(enc), "doc_id", capacity=1024, prefix="probe2"
)
t1 = time.monotonic()
print(f"drain total: {t1-t0:.2f}s")
for k in sorted(acc):
    if not k.endswith("#"):
        print(f"  {k}: {acc[k]:.2f}s x{acc[k+'#']}")
