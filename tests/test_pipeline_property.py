"""Property-based checks for the pipeline operators added in round 2:
packing, sampling, and cluster resolution must agree with direct Python
evaluations of their documented semantics on arbitrary inputs — guarding
the Catalyst formulations against regressions the fixed fixtures miss."""

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sizes_strategy = st.lists(st.integers(1, 400), min_size=1, max_size=40)
capacity_strategy = st.integers(10, 300)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(sizes=sizes_strategy, capacity=capacity_strategy)
def test_pack_sequences_invariants(spark, sizes, capacity):
    from cassandra_util_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id bigint, n_tokens bigint"
    )
    rows = sorted(
        pack_sequences(df, "doc_id", "n_tokens", capacity).collect(),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    prev_bin = 0
    for r in rows:
        # bin/offset are exactly the running-total arithmetic
        assert r["bin"] * capacity + r["bin_offset"] == cum
        assert 0 <= r["bin_offset"] < capacity
        assert r["bin"] >= prev_bin  # bins never go backwards in stream order
        prev_bin = r["bin"]
        cum += r["n_tokens"]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(sizes=sizes_strategy, capacity=capacity_strategy)
def test_pack_greedy_matches_reference_fold(spark, sizes, capacity):
    from cassandra_util_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id bigint, n_tokens bigint"
    )
    rows = sorted(
        pack_greedy(df, "doc_id", "n_tokens", capacity).collect(),
        key=lambda r: r["doc_id"],
    )
    cur_bin = cur_fill = 0
    started = False
    for r, n in zip(rows, sizes):
        if started and cur_fill + n > capacity:
            cur_bin, cur_fill = cur_bin + 1, 0
        assert r["bin"] == cur_bin
        assert r["oversize"] == (n > capacity)
        cur_fill += n
        started = True


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    fractions=st.tuples(st.floats(0.0, 1.0), st.floats(0.0, 1.0)),
    n=st.integers(5, 60),
)
def test_hash_sample_nesting_property(spark, fractions, n):
    """For ANY f1 <= f2 the f1-sample is a subset of the f2-sample."""
    from cassandra_util_spark.operators.sampling import hash_sample

    f1, f2 = min(fractions), max(fractions)
    df = spark.createDataFrame([(i,) for i in range(n)], "k bigint")
    small = {r["k"] for r in hash_sample(df, f1, "k").collect()}
    big = {r["k"] for r in hash_sample(df, f2, "k").collect()}
    assert small <= big


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 10_000), n_nodes=st.integers(2, 60), n_edges=st.integers(1, 80))
def test_connected_components_matches_union_find(spark, seed, n_nodes, n_edges):
    from cassandra_util_spark.operators.cluster import connected_components

    rnd = random.Random(seed)
    edges = [
        (rnd.randrange(n_nodes), rnd.randrange(n_nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent = {v: v for e in edges for v in e}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}

    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r["id"]: r["comp"] for r in connected_components(pairs, max_iter=64).collect()}
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    mult=st.floats(0.0, 4.0).map(lambda x: round(x, 2)),
    n=st.integers(20, 80),
)
def test_stratified_repeat_copy_counts_property(spark, mult, n):
    """Every row appears floor(m) or ceil(m) times; the extra-copy rate
    over the stratum is governed by the hash gate (exact thresholds, so
    per-row counts are a pure function of the key)."""
    from cassandra_util_spark.operators.sampling import stratified_repeat

    df = spark.createDataFrame([(i, "s") for i in range(n)], "k bigint, g string")
    out = stratified_repeat(df, "g", {"s": mult}, "k")
    counts = {r["k"]: r["n"] for r in
              out.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    lo, hi = int(mult), int(mult) + (1 if mult != int(mult) else 0)
    for i in range(n):
        c = counts.get(i, 0)
        assert lo <= c <= max(hi, lo), (i, c, mult)


words_strategy = st.lists(
    st.lists(st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=30),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=words_strategy, chunk_words=st.integers(2, 8))
def test_remove_duplicate_spans_matches_reference_fold(spark, docs, chunk_words):
    """The distributed first-occurrence election must agree with a direct
    Python fold of the documented semantics on arbitrary corpora: chunk in
    order, keep a span only the first time its text is seen globally (by
    (doc_id, chunk_id)), rebuild from survivors."""
    from cassandra_util_spark.operators.dedup import remove_duplicate_spans

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_chunks"], r["n_dropped"]) for r in
           remove_duplicate_spans(df, "doc_id", "text", chunk_words).collect()}

    seen: set[str] = set()
    for i, ws in enumerate(docs):
        n_chunks = max(-(-len(ws) // chunk_words), 1)
        kept = []
        for c in range(n_chunks):
            span = " ".join(ws[c * chunk_words:(c + 1) * chunk_words])
            if span not in seen:
                seen.add(span)
                kept.append(span)
        want = (" ".join(kept), n_chunks, n_chunks - len(kept))
        assert got[i] == want, (i, got[i], want)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=words_strategy)
def test_gopher_signal_bounds(spark, docs):
    """Signal invariants on arbitrary inputs: fractions in [0,1], counts
    consistent, mean word length positive for non-empty docs."""
    from cassandra_util_spark.operators.text import gopher_quality

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id bigint, text string"
    )
    for r in gopher_quality(df, "doc_id", "text").collect():
        assert r["n_words"] == len(docs[r["doc_id"]])
        for f in ("bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac"):
            assert 0.0 <= r[f] <= 1.0, (f, r[f])
        assert r["symbol_word_ratio"] >= 0.0
        assert r["mean_word_len"] > 0
        assert 0 <= r["stop_hits"] <= 8


word_strategy = st.integers(0, 30)  # small vocab => frequent shared runs
doc_strategy = st.lists(word_strategy, min_size=0, max_size=60)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(a=doc_strategy, b=doc_strategy, k=st.integers(2, 4), w=st.integers(2, 6))
def test_winnowing_matches_reference_and_guarantee(spark, a, b, k, w):
    """The Catalyst winnowing formulation agrees with a direct Python
    evaluation of the published algorithm on arbitrary token streams, and
    the detection guarantee holds: if the two docs share a contiguous run
    of >= w+k-1 tokens, they share a fingerprint."""
    from cassandra_util_spark.functions import portable_hash31 as _  # noqa: F401
    from cassandra_util_spark.operators.dedup import winnowing_fingerprints

    import hashlib

    def h31(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF

    def reference(tokens: list[str]) -> set[int]:
        grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
        hs = [h31(g) for g in grams]
        return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}

    docs = {1: [f"w{t}" for t in a], 2: [f"w{t}" for t in b]}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", winnowing_fingerprints(F.col("text"), k, w).alias("fps")
        ).collect()
    }
    for i, toks in docs.items():
        assert got[i] == reference(toks), (i, toks)
    # guarantee: a shared >= w+k-1 token run implies a shared fingerprint
    t = w + k - 1
    runs_a = {tuple(docs[1][i:i + t]) for i in range(len(docs[1]) - t + 1)}
    runs_b = {tuple(docs[2][i:i + t]) for i in range(len(docs[2]) - t + 1)}
    if runs_a & runs_b:
        assert got[1] & got[2]
