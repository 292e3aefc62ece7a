"""BPE corpus encoding (operators/bpe.py bpe_encode / segment_words): the
ordered per-document token stream vs a plain-Python sequential-replay
reference, trained-table vs merge-replay equivalence for in-vocabulary
words (the docstring's exactness claim), the out-of-vocabulary path on a
train/encode split, empty-document survival, count consistency with
bpe_token_profile, and the ordered-disjoint-batch grouping invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_util_spark.operators.bpe import (
    END,
    _ordered_disjoint_batches,
    bpe_encode,
    bpe_token_profile,
    bpe_train,
    segment_words,
)
from test_bpe import py_bpe_train, py_merge

CORPUS = [
    (0, "low low low lower lowest"),
    (1, "new newer newest newest"),
    (2, "aaa aaa aa banana bananas"),
    (3, "low new aaa banana"),
    (4, ""),  # must survive as an empty token stream
]


def _py_encode(texts, merges):
    """Reference encoder: per word, character split + END, then one greedy
    left-to-right pass PER MERGE in learned order — the same semantics
    bpe_train leaves in its trained table."""
    seg_cache: dict = {}

    def seg(word):
        if word not in seg_cache:
            s = list(word) + [END]
            for _, lhs, rhs, _ in merges:
                s = py_merge(s, lhs, rhs)
            seg_cache[word] = s
        return seg_cache[word]

    return {
        i: [t for w in text.split() for t in seg(w)] for i, text in texts
    }


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


@pytest.fixture(scope="module")
def trained(corpus_df):
    return bpe_train(corpus_df, "text", num_merges=8)


def _collect_streams(df):
    return {r["doc_id"]: list(r["tokens"]) for r in df.collect()}


def test_encode_matches_python_reference(corpus_df, trained):
    merges, words = trained
    got = _collect_streams(bpe_encode(corpus_df, "doc_id", "text", words=words))
    want = _py_encode(CORPUS, merges)
    assert got == want


def test_merge_replay_equals_trained_table(corpus_df, trained):
    # an in-vocabulary word re-segmented by segment_words must land on its
    # trained segmentation exactly — the OOV path and the trained table are
    # the same tokenizer
    merges, words = trained
    via_table = _collect_streams(
        bpe_encode(corpus_df, "doc_id", "text", words=words)
    )
    via_replay = _collect_streams(
        bpe_encode(corpus_df, "doc_id", "text", merges=merges, batch=3)
    )
    assert via_table == via_replay


def test_oov_split(spark, trained):
    # train on the CORPUS, encode a document holding both known and unseen
    # words: both halves must match the python reference under the same merges
    merges, words = trained
    new = spark.createDataFrame(
        [(10, "lowest bananafana"), (11, "zzz")], "doc_id int, text string"
    )
    got = _collect_streams(
        bpe_encode(new, "doc_id", "text", words=words, merges=merges)
    )
    want = _py_encode([(10, "lowest bananafana"), (11, "zzz")], merges)
    assert got == want


def test_words_only_oov_raises_never_drops(spark, trained):
    """VERDICT r13 task 2: words-only encode of an input with unseen words
    used to DROP them silently through the inner segmentation join — a
    data-loss footgun.  The `_assemble_streams` guard now raises at
    action time, naming the word, in BOTH encode twins; the merges
    route still segments the same input cleanly."""
    from cassandra_util_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    merges, words = trained
    new = spark.createDataFrame(
        [(10, "lowest bananafana")], "doc_id int, text string"
    )
    with pytest.raises(Exception, match="out-of-vocabulary word 'bananafana'"):
        bpe_encode(new, "doc_id", "text", words=words).collect()
    vocab = bpe_vocab(spark, words, merges)
    with pytest.raises(Exception, match="out-of-vocabulary word 'bananafana'"):
        bpe_encode_ids(new, "doc_id", "text", words, vocab).collect()
    # the documented route for unseen words still works
    got = _collect_streams(
        bpe_encode(new, "doc_id", "text", words=words, merges=merges)
    )
    assert got == _py_encode([(10, "lowest bananafana")], merges)


def test_empty_document_and_counts(corpus_df, trained):
    merges, words = trained
    rows = {
        r["doc_id"]: r
        for r in bpe_encode(corpus_df, "doc_id", "text", words=words).collect()
    }
    assert rows[4]["tokens"] == [] and rows[4]["n_tokens"] == 0
    for r in rows.values():
        assert r["n_tokens"] == len(r["tokens"])
    # count consistency with the budget view (which drops token-less docs)
    prof = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_profile(corpus_df, "doc_id", "text", words).collect()
    }
    for i, n in prof.items():
        assert rows[i]["n_tokens"] == n


def test_requires_words_or_merges(corpus_df):
    with pytest.raises(ValueError, match="trained word table or a merge list"):
        bpe_encode(corpus_df, "doc_id", "text")


def test_ordered_disjoint_batches_invariants():
    merges, _ = py_bpe_train(
        {"low": 5, "lower": 2, "newest": 6, "banana": 4, "aaa": 3}, 12
    )
    pairs = [(l, r) for (_, l, r, _) in merges]
    for batch in (1, 2, 3, 16):
        groups = _ordered_disjoint_batches(pairs, batch)
        # order preserved exactly and nothing dropped
        assert [p for g in groups for p in g] == pairs
        for g in groups:
            assert 1 <= len(g) <= batch
            used: set = set()
            for l, r in g:
                # mutual symbol-disjointness within a batch (the exactness
                # precondition of the composed fold)
                assert l not in used and r not in used and (l + r) not in used
                used.update((l, r, l + r))


def test_segment_words_on_unseen_vocab(spark, trained):
    merges, _ = trained
    vocab = spark.createDataFrame([("lowestest",), ("qqq",)], "word string")
    got = {
        r["word"]: list(r["syms"])
        for r in segment_words(vocab, merges, batch=2).collect()
    }
    for w in got:
        s = list(w) + [END]
        for _, lhs, rhs, _ in merges:
            s = py_merge(s, lhs, rhs)
        assert got[w] == s, w


# ---------------------------------------------------------------------------
# Token-id vocabulary and id streams
# ---------------------------------------------------------------------------


def test_vocab_ids(spark, corpus_df, trained):
    from cassandra_util_spark.operators.bpe import bpe_vocab

    merges, words = trained
    v = {r["sym"]: (r["id"], r["kind"]) for r in
         bpe_vocab(spark, words, merges).collect()}
    # base alphabet: every character of every corpus word, plus END,
    # lexicographic from 0
    chars = sorted({c for _, t in CORPUS for w in t.split() for c in w} | {END})
    for i, s in enumerate(chars):
        assert v[s] == (i, "base"), s
    # merges: id = EXACTLY B + step, first-writer-wins on duplicates —
    # replay the setdefault convention here so a systematic downward id
    # shift cannot hide behind an inequality (ADVICE r13)
    expected_id: dict = {}
    for step, l, r, _ in merges:
        expected_id.setdefault(l + r, len(chars) + step)
    for step, l, r, _ in merges:
        got_id, kind = v[l + r]
        assert kind == "merge"
        assert got_id == expected_id[l + r], (l + r, got_id, expected_id[l + r])
    # ids are unique
    ids = [i for i, _ in v.values()]
    assert len(ids) == len(set(ids))


def test_encode_ids_matches_symbol_stream(spark, corpus_df, trained):
    from cassandra_util_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    merges, words = trained
    vocab = bpe_vocab(spark, words, merges)
    v = {r["sym"]: r["id"] for r in vocab.collect()}
    sym_streams = _collect_streams(
        bpe_encode(corpus_df, "doc_id", "text", words=words)
    )
    got = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in bpe_encode_ids(
            corpus_df, "doc_id", "text", words, vocab
        ).collect()
    }
    for i, syms in sym_streams.items():
        ids, n = got[i]
        assert ids == [v[s] for s in syms], i
        assert n == len(syms)
    assert got[4] == ([], 0)  # the empty document survives


def test_vocab_duplicate_merge_first_writer_wins(spark, corpus_df):
    from cassandra_util_spark.operators.bpe import bpe_vocab

    _, words = bpe_train(corpus_df, "text", num_merges=2)
    # synthesize a duplicate merged string from two different pairs
    merges = [(0, "a", "bc", 9), (1, "ab", "c", 9)]
    v = [r for r in bpe_vocab(spark, words, merges).collect()
         if r["sym"] == "abc"]
    assert len(v) == 1 and v[0]["kind"] == "merge"
    b = sum(1 for r in bpe_vocab(spark, words, merges).collect()
            if r["kind"] == "base")
    assert v[0]["id"] == b  # step 0 won


@pytest.mark.slow
def test_encode_property_random_corpora(spark):
    """Hypothesis sweep: random tiny corpora — train a few merges, encode
    the corpus, and match the plain-Python sequential-replay reference
    end to end (both the trained-table path and the merge-replay path)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=5)

    @settings(max_examples=6, deadline=None)
    @given(
        docs=st.lists(
            st.lists(word, min_size=0, max_size=6).map(" ".join),
            min_size=1, max_size=6,
        ),
        n_merges=st.sampled_from([1, 3, 5]),
    )
    def check(docs, n_merges):
        rows = list(enumerate(docs))
        df = spark.createDataFrame(rows, "doc_id int, text string")
        merges, words = bpe_train(df, "text", num_merges=n_merges)
        want = _py_encode(rows, merges)
        got_table = _collect_streams(
            bpe_encode(df, "doc_id", "text", words=words)
        )
        assert got_table == want
        got_replay = _collect_streams(
            bpe_encode(df, "doc_id", "text", merges=merges, batch=2)
        )
        assert got_replay == want

    check()


def test_decode_roundtrip(spark, corpus_df, trained):
    from cassandra_util_spark.operators.bpe import (
        bpe_decode,
        bpe_encode_ids,
        bpe_vocab,
    )

    merges, words = trained
    # symbol path
    enc = bpe_encode(corpus_df, "doc_id", "text", words=words)
    dec = {
        r["doc_id"]: r["text"]
        for r in bpe_decode(enc, "doc_id", "tokens").collect()
    }
    assert dec == {i: t for i, t in CORPUS}  # corpus is already normalized
    # id path through the vocab map
    vocab = bpe_vocab(spark, words, merges)
    ids = bpe_encode_ids(corpus_df, "doc_id", "text", words, vocab)
    dec2 = {
        r["doc_id"]: r["text"]
        for r in bpe_decode(ids, "doc_id", "token_ids", vocab=vocab).collect()
    }
    assert dec2 == dec


def test_decode_renders_unk_visibly(spark, trained):
    from cassandra_util_spark.operators.bpe import (
        bpe_decode,
        bpe_encode_ids,
        bpe_vocab,
        segment_words,
    )

    merges, words = trained
    vocab = bpe_vocab(spark, words, merges)
    d = spark.createDataFrame([(0, "zzz low")], "doc_id int, text string")
    seg = words.select("word", "syms").unionByName(
        segment_words(
            d.sparkSession.createDataFrame([("zzz",)], "word string"), merges
        )
    )
    ids = bpe_encode_ids(d, "doc_id", "text", seg, vocab)
    [r] = bpe_decode(ids, "doc_id", "token_ids", vocab=vocab).collect()
    # 'z' was never seen at training -> three UNK marks, then the known word
    assert r["text"] == "��� low"


def test_segment_words_batch_validation(spark, trained):
    merges, _ = trained
    vocab = spark.createDataFrame([("x",)], "word string")
    with pytest.raises(ValueError, match="batch must be >= 1"):
        segment_words(vocab, merges, batch=0)


def _py_byte_seg(word):
    return [f"<0x{b:02X}>" for b in word.encode("utf-8")] + [END]


def test_byte_fallback_encode_matches_python_reference(spark, trained):
    """VERDICT r15 task 2: the frozen-vocabulary encode of unseen data
    must DEGRADE to byte tokens, not kill the job — in-vocab words keep
    their trained segmentation exactly, unseen words become their UTF-8
    byte tokens plus the word terminal."""
    merges, words = trained
    new = spark.createDataFrame(
        [(10, "lowest bananafana"), (11, "zzz 42")], "doc_id int, text string"
    )
    got = _collect_streams(
        bpe_encode(new, "doc_id", "text", words=words, oov="bytes")
    )
    ref = _py_encode([(10, "lowest"), (11, "")], merges)
    assert got[10] == ref[10] + _py_byte_seg("bananafana")
    assert got[11] == _py_byte_seg("zzz") + _py_byte_seg("42")


def test_byte_fallback_vocab_reserves_ids_past_the_learned_block(
    spark, corpus_df, trained
):
    """bpe_vocab(byte_fallback=True) appends exactly 256 <0xNN> rows at
    ids strictly above every assigned id, leaving the learned
    vocabulary's ids byte-identical to the byte_fallback=False form."""
    from cassandra_util_spark.operators.bpe import bpe_vocab

    merges, words = trained
    plain = bpe_vocab(spark, words, merges)
    fb = bpe_vocab(spark, words, merges, byte_fallback=True)
    learned = {(r["id"], r["sym"], r["kind"]) for r in plain.collect()}
    fb_rows = {(r["id"], r["sym"], r["kind"]) for r in fb.collect()}
    byte_rows = sorted(
        (i, s) for (i, s, k) in fb_rows if k == "byte"
    )
    assert {(i, s, k) for (i, s, k) in fb_rows if k != "byte"} == learned
    assert len(byte_rows) == 256
    max_learned = max(i for (i, _, _) in learned)
    assert byte_rows[0][0] > max_learned
    # contiguous block, hex rendering matches the encoder's
    assert [i for (i, _) in byte_rows] == list(
        range(byte_rows[0][0], byte_rows[0][0] + 256)
    )
    assert byte_rows[0][1] == "<0x00>" and byte_rows[255][1] == "<0xFF>"
    assert (byte_rows[0][0] + 0x61, "<0x61>") in byte_rows


def test_byte_fallback_ids_roundtrip(spark, corpus_df, trained):
    """The lossless round-trip contract extends to OOV words: encode_ids
    with oov='bytes' over a corpus with planted unseen words, decode via
    the byte-fallback vocab, equals normalize_text row-for-row — and the
    fallback ids land in the reserved byte block."""
    from cassandra_util_spark.operators.bpe import (
        bpe_decode,
        bpe_encode_ids,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.text import normalize_text

    merges, words = trained
    vocab = bpe_vocab(spark, words, merges, byte_fallback=True)
    byte_base = min(
        r["id"] for r in vocab.filter(F.col("kind") == "byte").collect()
    )
    new = spark.createDataFrame(
        [(10, "low bananafana zzz"), (11, "Queue 99!"), (12, "")],
        "doc_id int, text string",
    )
    ids = bpe_encode_ids(new, "doc_id", "text", words, vocab, oov="bytes")
    rows = {r["doc_id"]: list(r["token_ids"]) for r in ids.collect()}
    # planted OOV words produced ids inside the reserved block
    assert any(t >= byte_base for t in rows[10])
    assert rows[12] == []
    # no unk ids anywhere: every symbol resolved (trained or byte)
    assert all(t >= 0 for ts in rows.values() for t in ts)
    dec = bpe_decode(ids, "doc_id", "token_ids", vocab=vocab)
    got = {r["doc_id"]: r["text"] for r in dec.collect()}
    want = {
        r["doc_id"]: r["norm"]
        for r in new.select(
            "doc_id", normalize_text(F.col("text")).alias("norm")
        ).collect()
    }
    assert got == want


def test_byte_fallback_decode_reassembles_multibyte_runs(spark):
    """A multi-byte UTF-8 character split across byte tokens must decode
    from the WHOLE run (per-token decoding would mangle it), runs end at
    word terminals, and byte-free streams pass through untouched."""
    from cassandra_util_spark.operators.bpe import bpe_decode

    streams = [
        # 'café</w>du</w>' with é as its two UTF-8 bytes
        (0, ["c", "a", "f", "<0xC3>", "<0xA9>", END, "du" + END]),
        (1, ["plain" + END, "text" + END]),
        # decoded bytes containing '<0x' literally stay inert
        (2, ["<0x3C>", "<0x30>", "<0x78>", "<0x34>", "<0x31>", "<0x3E>", END]),
        (3, []),
    ]
    df = spark.createDataFrame(streams, "doc_id int, tokens array<string>")
    got = {
        r["doc_id"]: r["text"]
        for r in bpe_decode(df, "doc_id", "tokens").collect()
    }
    assert got == {0: "café du", 1: "plain text", 2: "<0x41>", 3: ""}


def test_byte_fallback_validation(spark, trained):
    """oov='bytes' without a byte-fallback vocab is a loud config error
    (a byte token silently falling to unk_id would destroy the
    round-trip); oov='bytes' with merges= is rejected as ambiguous; an
    unknown oov value is rejected in both twins."""
    from cassandra_util_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    merges, words = trained
    new = spark.createDataFrame([(10, "zzz")], "doc_id int, text string")
    with pytest.raises(ValueError, match="byte-fallback vocabulary"):
        bpe_encode_ids(
            new, "doc_id", "text", words,
            bpe_vocab(spark, words, merges), oov="bytes",
        )
    with pytest.raises(ValueError, match="ambiguous"):
        bpe_encode(new, "doc_id", "text", words=words, merges=merges,
                   oov="bytes")
    with pytest.raises(ValueError, match="oov must be"):
        bpe_encode(new, "doc_id", "text", words=words, oov="drop")
    with pytest.raises(ValueError, match="oov must be"):
        bpe_encode_ids(
            new, "doc_id", "text", words,
            bpe_vocab(spark, words, merges, byte_fallback=True), oov="drop",
        )


def test_torn_byte_run_raises_instead_of_mojibake(spark):
    """A byte run sliced mid-character — the shape a capacity-boundary
    window payload produces when it cuts an OOV word's run — must raise
    with the per-document reassembly remedy, not silently decode to
    U+FFFD replacement characters (ADVICE r16).  Whole runs keep
    decoding (the guard is value-neutral on valid streams — pinned by
    test_byte_fallback_decode_reassembles_multibyte_runs)."""
    from cassandra_util_spark.operators.bpe import bpe_decode

    # 'café' with é = C3 A9, torn after the first byte
    df = spark.createDataFrame(
        [(0, ["c", "a", "f", "<0xC3>", END])],
        "doc_id int, tokens array<string>",
    )
    with pytest.raises(Exception, match="not whole UTF-8"):
        bpe_decode(df, "doc_id", "tokens").collect()


def test_decode_join_fallback_equals_literal_map(spark, corpus_df, trained,
                                                 monkeypatch):
    """Above DECODE_LITERAL_MAP_MAX the vocab path falls back to the
    broadcast-join form (review r17: a production 32k-merge vocabulary
    would otherwise cost ~65k driver-side lit() constructions and an
    O(|vocab|)-literal plan); both paths must decode identically,
    including UNK rendering."""
    import cassandra_util_spark.operators.bpe as bpe

    merges, words = trained
    vocab = bpe.bpe_vocab(spark, words, merges)
    ids = bpe.bpe_encode_ids(corpus_df, "doc_id", "text", words, vocab)
    # plant an out-of-vocabulary id so the UNK path is exercised too
    ids = ids.withColumn(
        "token_ids",
        F.concat(F.col("token_ids"), F.array(F.lit(10 ** 6).cast("int"))),
    )
    lit_path = bpe.bpe_decode(ids, "doc_id", "token_ids", vocab=vocab)
    a = sorted((r["doc_id"], r["text"]) for r in lit_path.collect())
    monkeypatch.setattr(bpe, "DECODE_LITERAL_MAP_MAX", 0)
    join_path = bpe.bpe_decode(ids, "doc_id", "token_ids", vocab=vocab)
    b = sorted((r["doc_id"], r["text"]) for r in join_path.collect())
    assert a == b and any("�" in t for _, t in a)
