"""Property-based checks for the pipeline operators added in round 2:
packing, sampling, and cluster resolution must agree with direct Python
evaluations of their documented semantics on arbitrary inputs — guarding
the Catalyst formulations against regressions the fixed fixtures miss."""

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
import pytest

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
@pytest.mark.slow
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


def _half_away(x: float) -> int:
    """round-half-away-from-zero to integer — the mode Spark ROUND
    (BigDecimal HALF_UP) and DuckDB round() share; Python round() is
    half-EVEN and would diverge on exact .5 boundaries."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _round6(x: float) -> float:
    return _half_away(x * 10.0 ** 6) / 10.0 ** 6


bm25_doc_strategy = st.lists(st.integers(0, 7), min_size=1, max_size=40)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(bm25_doc_strategy, min_size=1, max_size=8),
    query=st.sets(st.integers(0, 7), min_size=1, max_size=3),
)
@pytest.mark.slow
def test_bm25_matches_reference_arithmetic(spark, docs, query):
    """The Catalyst BM25 agrees score-for-score (and rank-for-rank) with a
    direct Python evaluation of the documented formula — same op order,
    same integer scaling, same half-away rounding — on arbitrary corpora."""
    from cassandra_util_spark.operators.text import bm25_topk

    corpus = {i: [f"w{t}" for t in d] for i, d in enumerate(docs)}
    terms = tuple(f"w{t}" for t in sorted(query))
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_topk(df, "doc_id", "text", terms, k=len(corpus)).collect()
    }

    n_docs = len(corpus)
    sum_dl = sum(len(t) for t in corpus.values())
    avgdl = float(sum_dl) / n_docs
    dfreq = {t: sum(1 for toks in corpus.values() if t in toks) for t in terms}
    ref_scores = {}
    for i, toks in corpus.items():
        s9 = 0
        hit = False
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            hit = True
            idf = (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            sat = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(toks) / avgdl)))
            s9 += _half_away(idf * sat * 1.0e9)
        if hit:
            ref_scores[i] = _round6(float(s9) / 1.0e9)
    ranked = sorted(ref_scores.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = {i: (s, r + 1) for r, (i, s) in enumerate(ranked)}
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(st.lists(st.integers(0, 9), min_size=0, max_size=25),
                  min_size=2, max_size=8),
    n_target=st.integers(1, 3),
)
@pytest.mark.slow
def test_dsir_matches_reference_arithmetic(spark, docs, n_target):
    """The Catalyst DSIR weighting agrees weight-for-weight with a direct
    Python evaluation of the documented likelihood-ratio estimator (same
    hash, same integer products, same rounding) on arbitrary corpora."""
    import hashlib

    from cassandra_util_spark.operators.selection import dsir_importance_weights

    B = 64
    corpus = {i: [f"w{t}" for t in d] for i, d in enumerate(docs)}
    target_ids = set(list(corpus)[:n_target])
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id bigint, text string"
    )
    target = df.filter(F.col("doc_id").isin([int(i) for i in target_ids]))
    got = {
        r["doc_id"]: (r["n_grams"], r["weight"])
        for r in dsir_importance_weights(df, target, "doc_id", "text",
                                         n=2, num_buckets=B).collect()
    }

    def bucket(g: str) -> int:
        return (int(hashlib.md5(g.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF) % B

    def grams(toks):
        return [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]

    raw_k: dict[int, int] = {}
    tgt_k: dict[int, int] = {}
    doc_k: dict[int, dict[int, int]] = {}
    for i, toks in corpus.items():
        ks = [bucket(g) for g in grams(toks)]
        if not ks:
            continue
        doc_k[i] = {}
        for k in ks:
            raw_k[k] = raw_k.get(k, 0) + 1
            doc_k[i][k] = doc_k[i].get(k, 0) + 1
            if i in target_ids:
                tgt_k[k] = tgt_k.get(k, 0) + 1
    R, T = sum(raw_k.values()), sum(tgt_k.values())
    expect = {}
    for i, counts in doc_k.items():
        num9 = 0
        for k, c in counts.items():
            lam = float((2 * tgt_k.get(k, 0) + 1) * (2 * R + B)) / float(
                (2 * raw_k.get(k, 0) + 1) * (2 * T + B))
            num9 += c * _half_away(lam * 1.0e9)
        n_grams = sum(counts.values())
        expect[i] = (n_grams, _round6(float(num9) / n_grams / 1.0e9))
    assert got == expect


event_strategy = st.lists(
    st.tuples(st.integers(0, 5),          # user
              st.integers(0, 2),          # stage index
              st.integers(0, 10_000)),    # ts (µs)
    min_size=0, max_size=60,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(events=event_strategy)
@pytest.mark.slow
def test_funnel_matches_reference_fold(spark, events):
    from cassandra_util_spark.operators.analytics import funnel_counts

    stages = ["view", "click", "purchase"]
    rows = [(u, stages[s], t) for u, s, t in events]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, wt bigint") \
        if rows else spark.createDataFrame([], "user_id bigint, event_type string, wt bigint")
    got = {r["stage"]: r["n_users"]
           for r in funnel_counts(df, "user_id", "event_type", F.col("wt"), stages).collect()}

    # reference: per user, earliest stage-N event at-or-after stage N-1's frontier
    per_user: dict[int, list[tuple[str, int]]] = {}
    for u, t, ts in ((u, stages[s], t) for u, s, t in events):
        per_user.setdefault(u, []).append((t, ts))
    counts = {f"{i}_{s}": 0 for i, s in enumerate(stages, start=1)}
    for u, evs in per_user.items():
        frontier = None
        for i, s in enumerate(stages, start=1):
            cand = [ts for t, ts in evs if t == s and (frontier is None or ts >= frontier)]
            if not cand:
                break
            frontier = min(cand)
            counts[f"{i}_{s}"] += 1
    assert got == counts


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 40)),
                    min_size=1, max_size=50),
    period=st.integers(1, 9),
)
@pytest.mark.slow
def test_cohort_retention_matches_reference(spark, events, period):
    from cassandra_util_spark.operators.analytics import cohort_retention

    day_us = 86_400_000_000
    rows = [(u, d * day_us + 12_345) for u, d in events]
    df = spark.createDataFrame(rows, "user_id bigint, wt bigint")
    got = {(r["cohort_period"], r["period_offset"]): r["n_active"]
           for r in cohort_retention(df, "user_id", F.col("wt"), period).collect()}

    first = {}
    for u, d in events:
        first[u] = min(first.get(u, d), d)
    cells = set()
    for u, d in events:
        cells.add((u, first[u] // period, (d - first[u]) // period))
    expect: dict[tuple[int, int], int] = {}
    for _, c, o in cells:
        expect[(c, o)] = expect.get((c, o), 0) + 1
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    left_keys=st.lists(st.integers(0, 30), min_size=1, max_size=120),
    right_keys=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    thr=st.sampled_from([1, 10, 1_000_000]),
    how=st.sampled_from(["inner", "left"]),
)
@pytest.mark.slow
def test_advised_join_always_equals_plain_join(spark, left_keys, right_keys, thr, how):
    """Round-6 executor property: WHATEVER branch the sketch advisory picks
    for an arbitrary key distribution and threshold (broadcast either side,
    salted shuffle on either side's skew, plain shuffle), the result is
    row-identical to the plain join."""
    from cassandra_util_spark.operators.sketches import advised_join

    a = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)], "k bigint, lv bigint"
    )
    b = spark.createDataFrame(
        [(k, 1000 + i) for i, k in enumerate(right_keys)], "k bigint, rv bigint"
    )
    got = sorted(
        tuple(r)
        for r in advised_join(
            a, b, "k", how=how, broadcast_threshold_rows=thr, width=64
        ).collect()
    )
    want = sorted(
        tuple(r) for r in a.join(b, "k", how).select("k", "lv", "rv").collect()
    )
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(keys=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=40))
def test_portable_token_matches_exact_arithmetic(spark, keys):
    """Round-6 overflow-fix property: the limb-decomposed multiplicative
    hash equals (k * KNUTH) mod 2^32 computed in unbounded Python integers,
    for ARBITRARY int64 keys."""
    from cassandra_util_spark.functions import portable_token

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    rows = df.select("k", portable_token(F.col("k")).alias("t")).collect()
    for r in rows:
        assert r.t == (r.k * 2654435761) % 4294967296, r.k


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=words_strategy,
    threshold=st.sampled_from([0.2, 0.34, 0.5, 0.75, 1.0]),
)
@pytest.mark.slow
def test_jaccard_prefix_filter_lossless_on_arbitrary_corpora(spark, docs, threshold):
    """The AllPairs/PPJoin prefix theorem, exercised adversarially: on
    arbitrary low-entropy corpora (12-word vocabulary forces hot shingles
    and heavy overlap — the worst case for a candidate pruner) the
    prefix-filtered pairs must equal BOTH the plain self-join output and a
    direct Python evaluation of Jaccard over the documented shingle sets."""
    from cassandra_util_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    unc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", 3, threshold).collect()
    }
    pre = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs_prefix(df, "doc_id", "text", 3, threshold).collect()
    }
    assert pre == unc

    # reference fold: shingle sets straight from the docstring semantics
    def shingles(t):
        ws = t.split()
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if round(j, 6) >= threshold:
                    want[(a, b)] = round(j, 6)
    assert pre == want
