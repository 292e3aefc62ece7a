"""Streaming IVFADC index (streaming/ann.py): the persisted codes store
must converge to the batch-encoded index bit-identically (encoding is
row-local under a frozen model), keep LWW semantics on re-delivered vector
ids, probe equal to the static partitioned index, and fail loudly on a
wrongly-keyed store."""

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import TableMeta
from cassandra_util_spark.operators.similarity import (
    ivf_assign,
    ivf_seeds,
    pq_codebooks,
    pq_encode,
)
from cassandra_util_spark.sources.runs import RunStore
from cassandra_util_spark.streaming.ann import probe_ivfpq_store, stream_ivfpq_index

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def model(spark, emb):
    """Frozen (centroids, codebooks) — the ann_ivfpq_topk derivation."""
    cents = ivf_seeds(emb, "vec_id", "embedding", 16).localCheckpoint()
    cent_sel = cents.select(
        F.col("vec_id").alias("cell"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("cent_vec"),
    )
    res = (
        ivf_assign(emb, cents)
        .join(F.broadcast(cent_sel), "cell")
        .select(
            "vec_id",
            F.col("cell"),
            F.zip_with(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                F.col("cent_vec"),
                lambda a, b: a - b,
            ).alias("__res"),
        )
    )
    cb = pq_codebooks(res, "vec_id", "__res", 64, 8, 16).localCheckpoint()
    return cents, cb, res.localCheckpoint()


def _store(tmp_path, name="ivfpq-runs"):
    return RunStore(str(tmp_path / name), TableMeta(("vec_id",), (), "writetime"))


def _drain(spark, emb, store, tmp_path, model, cp="cp", mod=3):
    cents, cb, _ = model
    src = str(tmp_path / f"src-{cp}")
    for k in range(mod):
        emb.filter(F.col("vec_id") % mod == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_ivfpq_index(stream, store, str(tmp_path / cp), cents, cb)
    q.awaitTermination(120)


def test_streamed_store_matches_batch_encoding(spark, emb, model, tmp_path):
    cents, cb, res = model
    store = _store(tmp_path)
    _drain(spark, emb, store, tmp_path, model)
    batch = {
        r["vec_id"]: (r["cell"], list(r["codes"]))
        for r in pq_encode(res, cb, "vec_id", "__res", 64, 8, 16, keep=("cell",)).collect()
    }
    streamed = {
        r["vec_id"]: (r["cell"], list(r["codes"]))
        for r in store.read_merged(spark).collect()
    }
    assert streamed == batch and len(streamed) == emb.count()


def test_lww_on_redelivered_vector_id(spark, emb, model, tmp_path):
    """A later batch re-delivering an id with a DIFFERENT vector must win
    at read time: the store keeps the newest codes per id."""
    cents, cb, _ = model
    store = _store(tmp_path, "lww-runs")
    first = emb.filter(F.col("vec_id") < 50)
    # second delivery: id 7 arrives again carrying id 8's vector
    redeliver = (
        emb.filter(F.col("vec_id") == 8).select(
            F.lit(7).cast("bigint").alias("vec_id"), "embedding"
        )
    )
    src = str(tmp_path / "src-lww")
    first.coalesce(1).write.mode("append").parquet(src)
    redeliver.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = stream_ivfpq_index(stream, store, str(tmp_path / "cp-lww"), cents, cb)
    q.awaitTermination(120)
    merged = {r["vec_id"]: list(r["codes"]) for r in store.read_merged(spark).collect()}
    assert len(merged) == 50
    assert merged[7] == merged[8]  # id 7 now carries id 8's codes


@pytest.mark.slow
def test_store_probe_matches_static_index(spark, emb, model, tmp_path):
    from cassandra_util_spark.sources.ivf_index import (
        probe_ivfpq_index,
        write_ivfpq_index,
    )

    cents, cb, _ = model
    store = _store(tmp_path, "probe-runs")
    _drain(spark, emb, store, tmp_path, model, cp="cp-probe")
    q = emb.filter(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.neighbor_id, r.d4, r.rank)
        for r in probe_ivfpq_store(
            spark, store, cents, cb, q, corpus=emb, k=5, nprobe=4, rerank=32
        ).collect()
    }
    path = str(tmp_path / "static-idx")
    write_ivfpq_index(emb, path, coarse_k=16, m=8, num_codes=16, refine_iters=0)
    want = {
        (r.query_id, r.neighbor_id, r.d4, r.rank)
        for r in probe_ivfpq_index(
            spark, path, q, corpus=emb, k=5, nprobe=4, rerank=32
        ).collect()
    }
    assert got == want and got


def test_wrongly_keyed_store_rejected(spark, emb, model, tmp_path):
    cents, cb, _ = model
    bad = RunStore(str(tmp_path / "bad"), TableMeta(("id",), (), "writetime"))
    empty_src = tmp_path / "empty-src"
    empty_src.mkdir()
    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(
            str(empty_src)
        )
    )
    with pytest.raises(ValueError, match="keyed"):
        stream_ivfpq_index(stream, bad, str(tmp_path / "cp-bad"), cents, cb)


def test_intra_batch_duplicate_id_is_deterministic(spark, emb, model, tmp_path):
    """Two deliveries of the same vec_id INSIDE one micro-batch share a
    writetime (the batch id), so without a pre-append dedup the LWW merge
    would have no tie-break (ADVICE r8).  to_codes collapses the batch to
    one row per id — lexicographic max of the embedding array — so the
    surviving codes are defined and match the batch encoding of the
    winning vector."""
    cents, cb, res = model
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.filter(F.col("vec_id").isin(7, 8)).collect()}
    winner = 7 if vecs[7] > vecs[8] else 8  # same elementwise order Spark uses
    first = emb.filter(F.col("vec_id") < 20)
    dup = emb.filter(F.col("vec_id") == 8).select(
        F.lit(7).cast("bigint").alias("vec_id"), "embedding"
    )
    src = str(tmp_path / "src-dup")
    # ONE parquet file -> ONE micro-batch containing both rows for id 7
    first.unionByName(dup).coalesce(1).write.mode("append").parquet(src)
    store = _store(tmp_path, "dup-runs")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ivfpq_index(stream, store, str(tmp_path / "cp-dup"), cents, cb)
    q.awaitTermination(120)
    merged = {r["vec_id"]: list(r["codes"]) for r in store.read_merged(spark).collect()}
    assert len(merged) == 20  # per-id unique despite the duplicate delivery
    batch = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(res, cb, "vec_id", "__res", 64, 8, 16).collect()
    }
    # codes depend only on the vector, so the survivor must carry the
    # winning id's batch codes
    assert merged[7] == batch[winner]
