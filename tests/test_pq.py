"""Product quantization: codebook shape, encode determinism, ADC ranking,
and the rerank recall ladder (operators/similarity.py PQ section)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_util_spark.operators.similarity import (
    _l2sq,
    pq_codebooks,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


def _exact_l2_topk(emb, queries, k=10):
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    d = (
        c.crossJoin(F.broadcast(q))
        .filter("neighbor_id != query_id")
        .withColumn(
            "d",
            _l2sq(
                F.transform("qv", lambda x: x.cast("double")),
                F.transform("cv", lambda x: x.cast("double")),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("neighbor_id").asc())
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )


def test_codebook_shape_and_validation(emb):
    cb = pq_codebooks(emb)
    rows = cb.collect()
    assert len(rows) == 8 * 16
    assert all(len(r["cvec"]) == 8 for r in rows)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(emb, dim=64, m=7)


def test_encode_deterministic_and_bounded(emb):
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    a = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    valid = {r["code"] for r in cb.collect()}
    assert all(set(v) <= valid for v in a.values())


def test_seed_vectors_encode_to_themselves(emb):
    """A codebook seed's own subvectors are distance-0 from their codebook
    entry, so every seed doc must encode to its own id in all subspaces."""
    cb = pq_codebooks(emb)
    seed_ids = {r["code"] for r in cb.collect()}
    codes = pq_encode(emb, cb).filter(F.col("vec_id").isin(*seed_ids)).collect()
    assert len(codes) == len(seed_ids)
    for r in codes:
        # d=0 for the own entry; ties at 0 go to the smallest code id, so
        # equality with the own id holds unless another seed shares the
        # exact subvector (not the case in this data)
        assert all(c == r["vec_id"] or c < r["vec_id"] for c in r["codes"])


def test_adc_ranking_contract(emb):
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    q = emb.filter(F.col("vec_id") < 3)
    r = pq_topk(codes, cb, q, k=10).collect()
    assert len(r) == 30
    by_q = {}
    for row in r:
        by_q.setdefault(row["query_id"], []).append(row)
    for rows in by_q.values():
        rows.sort(key=lambda x: x["rank"])
        assert [x["rank"] for x in rows] == list(range(1, 11))
        # adc9 non-decreasing with rank; neighbor-id ties break ascending
        pairs = [(x["adc9"], x["neighbor_id"]) for x in rows]
        assert pairs == sorted(pairs)
        assert all(x["neighbor_id"] != x["query_id"] for x in rows)


def test_rerank_beats_pure_adc_recall(emb):
    q = emb.filter(F.col("vec_id") < 5)
    exact = _exact_l2_topk(emb, q, k=10)
    exact.cache().count()
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    adc = pq_topk(codes, cb, q, k=10).select("query_id", "neighbor_id")
    rr = pq_topk_rerank(codes, cb, emb, q, k=10, rerank=128).select(
        "query_id", "neighbor_id"
    )
    adc_hits = adc.join(exact, ["query_id", "neighbor_id"]).count()
    rr_hits = rr.join(exact, ["query_id", "neighbor_id"]).count()
    assert rr_hits > adc_hits
    assert rr_hits >= 40  # measured 44/50 at rerank=128, K=16


def test_rerank_with_full_width_is_exact(emb):
    """rerank >= corpus size degenerates to the exact scan — the ADC pass
    only orders candidates, the exact pass rescores all of them."""
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 2)
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    rr = pq_topk_rerank(codes, cb, emb, q, k=10, rerank=n).select(
        "query_id", "neighbor_id"
    )
    exact = _exact_l2_topk(emb, q, k=10)
    assert rr.join(exact, ["query_id", "neighbor_id"]).count() == 20


def test_foreign_codebook_fails_loud(emb):
    """Scoring stored codes against codebooks from a DIFFERENT model must
    raise naming the unknown code ids, not silently return wrong ADC
    distances (ADVICE r8: searchsorted would otherwise map a foreign id to
    its insertion point).  probe_ivfpq_store/probe_ivfpq_index take the
    model as independent arguments, so this mismatch is reachable."""
    cb = pq_codebooks(emb)
    codes = pq_encode(emb, cb)
    # same shape, shifted code ids — a codebook from "another model"
    foreign = cb.withColumn("code", (F.col("code") + F.lit(10_000)).cast("long"))
    q = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(Exception, match="model/store mismatch"):
        pq_topk(codes, foreign, q, k=5).collect()
