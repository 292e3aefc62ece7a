"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partition sizing, Arrow-batched UDF
signatures — is real and tested; the actual codec step is stubbed behind
``decoder=`` because image/audio libraries are not in this container.  The
``fake`` decoder is deterministic (features derived from the payload bytes),
so the pipeline shape is exercised end-to-end.

Scale notes: payloads dominate row size, so `maxPartitionBytes`-sized input
splits already give well-sized Arrow batches; mapInPandas streams batches
(never materializes a partition), and feature extraction adds columns without
shuffling.  Keep payloads OUT of shuffle keys; join on media_id.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def media_from_documents(df: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table from the documents fixture: payload = utf-8 bytes
    of the text (a deterministic opaque blob for pipeline tests)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").cast("binary").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real embedding: bytes of the sha256
    digest scaled to [0,1)."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def _decode_stub(kind: str) -> None:
    raise NotImplementedError(
        f"real {kind} decoding requires codec libraries (PIL/ffmpeg/torchaudio) "
        "not present in this container; pass decoder='fake' for the "
        "deterministic test decoder or supply your own callable"
    )


# Pluggable codec registry — the production integration point for real
# decoders.  A codec is a callable (payload_bytes, kind) -> list[float]
# executed INSIDE the Arrow batch loop on executors, so it must be
# serializable (top-level function or closure over picklable state) and must
# not touch the driver.  Registering e.g. a PIL/torchvision image embedder:
#
#     register_codec("clip_image", lambda payload, kind: clip_embed(payload))
#     extract_features(media_df, decoder="clip_image")
#
# The engine side (schema, batching, partition sizing, shuffle hygiene) is
# identical for every codec; only the per-payload callable changes.
_CODECS: dict[str, Callable[[bytes, str], list]] = {}


def register_codec(name: str, fn: Callable[[bytes, str], list]) -> None:
    """Register a named decoder usable as ``extract_features(decoder=name)``."""
    if name in ("fake", "real"):
        raise ValueError(f"codec name {name!r} is reserved")
    _CODECS[name] = fn


def extract_features(
    df: DataFrame,
    decoder: str | Callable[[bytes, str], list[float]] = "fake",
    dim: int = 8,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    ``decoder``: 'fake' (deterministic), 'real' (raises NotImplementedError —
    the stub boundary), a name registered via :func:`register_codec`, or a
    callable (payload_bytes, kind) -> list[float].
    """
    if decoder == "real":
        _decode_stub("media")
    if isinstance(decoder, str) and decoder != "fake":
        if decoder not in _CODECS:
            # fail before the job launches, not as a TypeError inside every
            # executor's Arrow loop
            raise ValueError(
                f"unknown codec {decoder!r}; registered: {sorted(_CODECS) or '(none)'}"
            )
        decoder = _CODECS[decoder]
    fn = _fake_feature if decoder == "fake" else decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fn(p, dim) if decoder == "fake" else fn(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "digest": [hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_seconds: int = 10) -> DataFrame:
    """Plan video frame sampling: expands media rows to (media_id, frame_ts)
    rows from the 'duration_s' metadata — the shuffle-free fan-out that the
    real frame decoder would consume.  Decoding itself is the stubbed step."""
    duration = F.coalesce(
        F.element_at(F.col("meta"), "duration_s").cast("int"), F.lit(0)
    )
    return df.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.greatest(duration - 1, F.lit(0)), F.lit(every_n_seconds))
        ).alias("frame_ts"),
    )
