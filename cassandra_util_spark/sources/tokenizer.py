"""Persisted tokenizer artifact: the frozen BPE a pipeline ships.

``bpe_train`` runs ONCE (hours at 30k merges on a web corpus); everything
after — every encode of every crawl shard, on any cluster, forever —
needs only the trained artifact: the merge list, the (optionally
frequency-capped) word table with its final segmentations, and the
token-id vocabulary.  This module writes those three as plain parquet
under one directory plus a ``_META.json`` contract file, and reads them
back — the Spark-native form of a tokenizer file (vocab.json/merges.txt
in the GPT-2 lineage, the .model file in SentencePiece's): no custom
format, no serving process, readable by any Spark job or by DuckDB
directly.

Layout contract::

    <path>/_META.json       {"format": 1, "num_merges": N,
                             "byte_fallback": bool, "capped_words": M|null}
    <path>/merges/          (step, lhs, rhs, merged, cnt)   -- N rows
    <path>/words/           (word, cnt, syms)               -- vocab-sized
    <path>/vocab/           (id, sym, kind)                 -- <= 37+N+256 rows

Scale shape: every table is VOCABULARY-sized (the word table is the
largest at ~|distinct words| rows — megabytes for a 30k-merge web
tokenizer), so write and read are bounded driver-adjacent work; the
artifact broadcasts whole into every encode job, exactly as the
in-memory tables do.  Fail-loud: reading a directory without the meta
file, a wrong format version, or a meta/byte-block mismatch raises with
the remedy named — a tokenizer artifact silently missing its byte block
would turn every production OOV encode into a job kill (the r16
byte-fallback contract, `operators/bpe.py`).

Reference anchor: persisted-artifact-plus-manifest is the shape of the
reference's snapshot/backup layout (`sources/snapshots.py`, citing
DeletedRecordsBackupSink); there is no tokenizer in the reference — this
closes the train-once/encode-anywhere half of the training-data surface
the brief adds.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

TOKENIZER_FORMAT = 1


def _is_scheme_path(path_str: str) -> bool:
    """True for URI-scheme'd paths (``s3a://…``, ``hdfs://…``,
    ``file://…``) — those route through the Hadoop FileSystem API so the
    meta file lands on (and reads from) the SAME filesystem as the three
    parquet tables.  Driver-local ``open()`` on such a path would
    silently split the artifact: parquet halves remote, meta local —
    unreadable exactly where the module claims portability (ADVICE r16).
    Plain local paths keep direct ``open()``: byte-identical behavior,
    no LocalFileSystem ``.crc`` sidecars, hand-inspectable artifact."""
    return "://" in path_str


def _hadoop_fs(spark: SparkSession, path_str: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _fs_write_text(spark: SparkSession, path_str: str, text: str) -> None:
    fs, jpath = _hadoop_fs(spark, path_str)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark: SparkSession, path_str: str) -> Optional[str]:
    """File contents as text, or ``None`` when the file does not exist
    (the caller owns the not-an-artifact message)."""
    fs, jpath = _hadoop_fs(spark, path_str)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_tokenizer(
    spark: SparkSession,
    path: str,
    words: DataFrame,
    merges: List[Tuple[int, str, str, int]],
    byte_fallback: bool = False,
    capped_words: Optional[int] = None,
) -> None:
    """Persist a trained BPE tokenizer under ``path``.

    ``capped_words`` applies the production vocab_size cap to the WORD
    table at write time (top-N by frequency, word tie-break — the same
    deterministic cap `bpe_encode_oov_fallback` certifies): the shipped
    word cache covers the frequent words, everything else degrades to
    byte fallback at encode time.  The vocabulary itself is always built
    from the FULL trained word table (base symbols must cover every
    trained segmentation), with the byte block appended when
    ``byte_fallback`` — capping without byte fallback is rejected
    loudly, because the capped artifact could then only raise on the
    words it dropped."""
    from pyspark.sql import functions as F

    from cassandra_util_spark.operators.bpe import bpe_merge_table, bpe_vocab

    if capped_words is not None and capped_words <= 0:
        raise ValueError(f"capped_words must be positive, got {capped_words}")
    if capped_words is not None and not byte_fallback:
        raise ValueError(
            "a frequency-capped word table needs byte_fallback=True — "
            "the artifact would otherwise raise on every word the cap "
            "dropped (the r16 degradation contract)"
        )
    out_words = words.select("word", "cnt", "syms")
    if capped_words is not None:
        out_words = out_words.orderBy(
            F.col("cnt").desc(), "word"
        ).limit(capped_words)
    bpe_merge_table(spark, merges).write.mode("error").parquet(
        os.path.join(path, "merges")
    )
    out_words.write.mode("error").parquet(os.path.join(path, "words"))
    bpe_vocab(spark, words, merges, byte_fallback=byte_fallback).write.mode(
        "error"
    ).parquet(os.path.join(path, "vocab"))
    meta = {
        "format": TOKENIZER_FORMAT,
        "num_merges": len(merges),
        "byte_fallback": byte_fallback,
        "capped_words": capped_words,
    }
    # publish via tmp-then-rename on the filesystem `path` names: the
    # Hadoop FileSystem API for scheme'd paths (atomic on HDFS;
    # best-effort on object stores, where the parquet commits above
    # carry the same caveat), plain os.replace locally
    tmp = os.path.join(path, "_META.json.tmp")
    if _is_scheme_path(path):
        fs, dest = _hadoop_fs(spark, os.path.join(path, "_META.json"))
        if fs.exists(dest):
            # the three parquet writes above use mode("error"), so a
            # meta file here means a previous artifact occupies the
            # directory with its tables gone or clobbered — refuse, the
            # same no-overwrite contract, instead of a delete-then-
            # rename whose crash window would destroy the existing meta
            # (review r17)
            raise ValueError(
                f"{path} already holds a tokenizer artifact "
                "(_META.json exists) — write to a fresh directory"
            )
        _fs_write_text(spark, tmp, json.dumps(meta))
        _, jtmp = _hadoop_fs(spark, tmp)
        if not fs.rename(jtmp, dest):
            raise IOError(
                f"could not publish {path}/_META.json (rename failed) — "
                "the artifact directory is incomplete; rewrite it"
            )
    else:
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "_META.json"))  # atomic publish


def read_tokenizer(
    spark: SparkSession, path: str
) -> Tuple[List[Tuple[int, str, str, int]], DataFrame, DataFrame, dict]:
    """``(merges, words, vocab, meta)`` from a :func:`write_tokenizer`
    directory — the exact in-memory shapes ``bpe_encode_ids`` /
    ``segment_words`` / ``bpe_decode`` consume.  The merge list is a
    bounded collect (``num_merges`` rows, a config constant); the word
    and vocab tables stay DataFrames.  Validates the meta contract and
    that a ``byte_fallback: true`` artifact actually carries its 256-row
    byte block (a truncated copy would otherwise fail much later, inside
    a production encode)."""
    from pyspark.sql import functions as F

    meta_path = os.path.join(path, "_META.json")
    if _is_scheme_path(path):
        meta_text = _fs_read_text(spark, meta_path)
    else:
        try:
            with open(meta_path) as f:
                meta_text = f.read()
        except FileNotFoundError:
            meta_text = None
    if meta_text is None:
        raise ValueError(
            f"{path} is not a tokenizer artifact (no _META.json) — "
            "write it with sources.tokenizer.write_tokenizer"
        )
    meta = json.loads(meta_text)
    if meta.get("format") != TOKENIZER_FORMAT:
        raise ValueError(
            f"unsupported tokenizer format {meta.get('format')!r} at "
            f"{path} (this build reads format {TOKENIZER_FORMAT})"
        )
    if not isinstance(meta.get("num_merges"), int):
        raise ValueError(
            f"tokenizer artifact at {path} has a truncated _META.json "
            "(no integer num_merges) — rewrite the artifact with "
            "write_tokenizer"
        )
    merge_rows = (
        spark.read.parquet(os.path.join(path, "merges"))
        .orderBy("step")
        .collect()
    )
    merges = [
        (int(r["step"]), r["lhs"], r["rhs"], int(r["cnt"])) for r in merge_rows
    ]
    if len(merges) != meta["num_merges"]:
        raise ValueError(
            f"tokenizer artifact at {path} is inconsistent: meta says "
            f"{meta['num_merges']} merges, table holds {len(merges)}"
        )
    words = spark.read.parquet(os.path.join(path, "words"))
    vocab = spark.read.parquet(os.path.join(path, "vocab"))
    if meta.get("byte_fallback"):
        n_bytes = vocab.filter(F.col("kind") == "byte").count()
        if n_bytes != 256:
            raise ValueError(
                f"tokenizer artifact at {path} claims byte_fallback but "
                f"carries {n_bytes}/256 byte rows — rewrite the artifact"
            )
    return merges, words, vocab, meta
