"""End-to-end lossless pipeline contract (VERDICT r13 task 6): the one
cross-family invariant composing `bpe_roundtrip_text` with
`packed_training_windows` — materialized training windows, sliced back
into per-document id streams by the packing plan's (bin, bin_offset)
arithmetic and decoded through the engine's own `bpe_decode`, must
reproduce EVERY document's normalized text exactly at sf0.01.

This is the property the whole representation rests on: if windows are
the concatenated encoded streams cut every `capacity` tokens (and
nothing else — no drop, no duplication, no reorder), then
window-concat → per-doc split → decode is the identity on
`normalize_text(text)`.  A failure localizes to whichever half broke:
a count mismatch is the packer, a text mismatch the tokenizer."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"
CAPACITY = 512


def test_windows_decode_back_to_every_document(spark):
    from cassandra_util_spark.operators.bpe import (
        bpe_decode,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from cassandra_util_spark.operators.packing import (
        materialize_packed_windows,
    )
    from cassandra_util_spark.operators.text import normalize_text

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges, words = bpe_train(d, "text", num_merges=8)
    vocab = bpe_vocab(spark, words, merges)
    enc = bpe_encode_ids(d, "doc_id", "text", words, vocab).localCheckpoint()

    win = materialize_packed_windows(
        enc, "doc_id", "token_ids", capacity=CAPACITY, distributed=True
    )
    # reassemble the global stream from the windows in bin order; every
    # non-final window must be exactly full (the cut arithmetic)
    rows = win.orderBy("bin").collect()
    assert [r["bin"] for r in rows] == list(range(len(rows)))
    assert all(r["n_tokens"] == CAPACITY for r in rows[:-1])
    assert all(len(r["token_ids"]) == r["n_tokens"] for r in rows)
    stream = [t for r in rows for t in r["token_ids"]]

    # slice the stream back into per-document id runs by the SAME
    # (doc_id-ordered) exclusive running count the packer used
    counts = [
        (r["doc_id"], r["n_tokens"])
        for r in enc.select("doc_id", "n_tokens").orderBy("doc_id").collect()
    ]
    assert sum(n for _, n in counts) == len(stream)
    rebuilt, pos = [], 0
    for doc_id, n in counts:
        rebuilt.append((doc_id, stream[pos : pos + n]))
        pos += n

    # the sliced runs must equal the encoder's per-document streams ...
    want_ids = {
        r["doc_id"]: list(r["token_ids"]) for r in enc.collect()
    }
    for doc_id, ids in rebuilt:
        assert ids == want_ids[doc_id], doc_id

    # ... and decode (the ENGINE's decoder, id->symbol via the trained
    # vocab) must reproduce the normalized text of every document
    rebuilt_df = spark.createDataFrame(
        rebuilt, "doc_id long, token_ids array<int>"
    )
    dec = bpe_decode(rebuilt_df, "doc_id", "token_ids", vocab=vocab)
    norm = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        normalize_text(F.col("text")).alias("want"),
    )
    mism = (
        dec.join(norm, "doc_id")
        .filter(F.col("text") != F.col("want"))
        .count()
    )
    assert mism == 0
    assert dec.count() == d.count()
