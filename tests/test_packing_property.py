"""Property-based checks of the window-materialization family: on
ARBITRARY corpora (random doc counts, lengths including empty, random
capacities) the materialized windows must equal a direct Python replay
of the concat-and-cut semantics, the attribution spans must tile every
window, the incremental carry-forward must equal the one-shot under any
shard split, and the FIM transform must stay lossless.  The
example-based tests pin known shapes; these guard the arithmetic
against the edge geometry a fixed fixture can't enumerate (documents
exactly filling a window, empty heads/tails, single-token corpora,
shard cuts landing on window boundaries)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
import pytest

docs_strategy = st.lists(
    st.lists(st.integers(0, 9), max_size=12),
    min_size=1,
    max_size=8,
).map(lambda arrs: [(i, a) for i, a in enumerate(arrs)])
capacity_strategy = st.integers(1, 9)


def _py_windows(docs, capacity):
    stream = [(i, t) for i, ids in sorted(docs) for t in ids]
    bins: dict = {}
    for pos, (i, t) in enumerate(stream):
        b = bins.setdefault(pos // capacity, {"docs": set(), "ids": []})
        b["docs"].add(i)
        b["ids"].append(t)
    return {
        k: (len(v["docs"]), len(v["ids"]), v["ids"]) for k, v in bins.items()
    }


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=docs_strategy, capacity=capacity_strategy,
       distributed=st.booleans())
@pytest.mark.slow
def test_windows_match_python_replay(spark, docs, capacity, distributed):
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    df = spark.createDataFrame(docs, "doc_id int, ids array<int>")
    rows = materialize_packed_windows(
        df, "doc_id", "ids", capacity=capacity, distributed=distributed,
        with_spans=True,
    ).collect()
    got = {r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
           for r in rows}
    assert got == _py_windows(docs, capacity)
    # spans tile [0, n_tokens) in offset order, one span per contributing doc
    for r in rows:
        pos = 0
        seen = set()
        for s in r["doc_spans"]:
            assert s["off"] == pos and s["len"] > 0
            assert s["doc"] not in seen
            seen.add(s["doc"])
            pos += s["len"]
        assert pos == r["n_tokens"] and len(seen) == r["n_docs"]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=docs_strategy, capacity=capacity_strategy,
       cut=st.tuples(st.integers(0, 8), st.integers(0, 8)))
@pytest.mark.slow
def test_incremental_equals_one_shot_under_any_split(spark, docs, capacity, cut):
    from cassandra_util_spark.operators.packing import (
        materialize_windows_incremental,
    )

    df = spark.createDataFrame(docs, "doc_id int, ids array<int>")
    lo, hi = min(cut), max(cut)
    shards = [
        df.filter(F.col("doc_id") < lo),
        df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
        df.filter(F.col("doc_id") >= hi),
    ]
    got = {r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
           for r in materialize_windows_incremental(
               shards, "doc_id", "ids", capacity).collect()}
    assert got == _py_windows(docs, capacity)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(st.lists(st.integers(0, 99), max_size=40),
                     min_size=1, max_size=6)
       .map(lambda arrs: [(i, a) for i, a in enumerate(arrs)]),
       rate=st.sampled_from([0.0, 0.5, 1.0]),
       min_tokens=st.integers(2, 20))
@pytest.mark.slow
def test_fim_always_lossless(spark, docs, rate, min_tokens):
    """Whatever the deal rate, span draw, or length mix: stripping the
    sentinels and splicing the middle back restores every stream."""
    from cassandra_util_spark.operators.packing import fim_transform

    df = spark.createDataFrame(docs, "doc_id int, ids array<int>")
    original = dict(docs)
    for r in fim_transform(
        df, "doc_id", "ids", rate=rate, min_tokens=min_tokens
    ).collect():
        out = list(r["token_ids"])
        if not r["fim"]:
            assert out == original[r["doc_id"]]
            continue
        assert out[0] == -101
        i_suf, i_mid = out.index(-102), out.index(-103)
        assert 0 < i_suf < i_mid
        rebuilt = out[1:i_suf] + out[i_mid + 1 :] + out[i_suf + 1 : i_mid]
        assert rebuilt == original[r["doc_id"]]
        assert r["n_tokens"] == len(original[r["doc_id"]]) + 3


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=docs_strategy, capacity=capacity_strategy,
       distributed=st.booleans())
@pytest.mark.slow
def test_reassembly_inverts_windows_on_arbitrary_corpora(
    spark, docs, capacity, distributed
):
    """reassemble_doc_streams ∘ materialize_packed_windows == identity on
    the non-empty documents, for ANY corpus geometry and capacity —
    including documents exactly filling a window, single-token corpora,
    and docs longer than several windows (the r17 inverse operator's
    defining property; the example tests pin known shapes)."""
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        reassemble_doc_streams,
    )

    df = spark.createDataFrame(docs, "doc_id bigint, ids array<int>")
    win = materialize_packed_windows(
        df, "doc_id", "ids", capacity=capacity, with_spans=True,
        distributed=distributed,
    )
    got = {
        r["doc_id"]: list(r["token_ids"])
        for r in reassemble_doc_streams(win).collect()
    }
    assert got == {i: ids for i, ids in docs if ids}
