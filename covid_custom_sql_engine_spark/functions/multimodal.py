"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Model: media travel as opaque ``binary`` columns next to typed metadata
(``media_type``, ``width``/``height``/``duration_ms``…). All Spark-side
plumbing — schemas, partitioning, Arrow batch shapes, UDF signatures —
is real and tested; only the codec calls themselves are stubbed, because
image/audio libraries aren't in this container:

- ``decode_image``/``decode_audio`` raise ``NotImplementedError`` (the
  integration point for Pillow/ffmpeg on a real cluster);
- ``fake_decode_features`` is the deterministic stand-in used by tests
  and oracles: features derived from the bytes themselves (length,
  rolling byte statistics), so outputs are reproducible anywhere.

Everything runs through ``mapInPandas`` — per-partition Arrow batches,
no per-row Python overhead, and constant memory per batch regardless of
corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, byte_sum long, "
    "byte_mean double, head_hex string"
)


def decode_image(payload: bytes) -> object:
    """Real codec integration point — not available in this container."""
    raise NotImplementedError("image decoding requires Pillow/opencv on the cluster")


def decode_audio(payload: bytes) -> object:
    raise NotImplementedError("audio decoding requires ffmpeg/librosa on the cluster")


def fake_decode_features(payload: bytes) -> dict:
    """Deterministic stand-in for decode+feature-extract: statistics of
    the raw bytes. Same contract (bytes → fixed-width features) as a
    real embedding/feature extractor."""
    if payload is None:
        return {"n_bytes": 0, "byte_sum": 0, "byte_mean": 0.0, "head_hex": ""}
    n = len(payload)
    s = int(sum(payload))
    return {
        "n_bytes": n,
        "byte_sum": s,
        "byte_mean": (s / n) if n else 0.0,
        "head_hex": payload[:8].hex(),
    }


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: the iterator yields one output pdf per input Arrow
    batch; columns are pruned to (media_id, media_type, payload) before
    the UDF so only needed bytes cross the JVM→Python boundary.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode_features)
            out = pd.DataFrame(list(feats))
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return df.select("media_id", "media_type", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (the decode of each frame is the stubbed step). Demonstrates the
    explode-shaped fan-out a real sampler produces, with deterministic
    timestamps from metadata alone."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
            ).alias("frame_ts_ms"),
        )
    )


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as an
    opaque payload with synthesized metadata (deterministic)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
    )
