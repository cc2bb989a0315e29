"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The Spark-side contract is real and tested: schemas, batch iteration,
partition sizing. The actual codec work (image decode, resampling,
frame extraction) requires libraries not present in this container, so
the decode kernels are STUBBED — ``decode_image_stub`` produces a
deterministic fake derived from the bytes; swapping in Pillow/ffmpeg is
a one-function change that does not alter the plan shape.

Scale notes: binary payloads must never pass through a shuffle wider
than necessary — all functions here are ``mapInPandas`` (narrow,
partition-local). Repartition *before* attaching payloads, not after.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("feat_mean", LongType()),  # stubbed "pixel mean"
    ]
)


def decode_image_stub(payload: bytes | None) -> dict:
    """Deterministic fake decode. Replace with a real codec:

        from PIL import Image; img = Image.open(io.BytesIO(payload))

    The fake 'feature' is the mean byte value — stable, testable, and
    exercises the same data movement as a real decoder.

    Null payloads return a null-feature sentinel rather than raising:
    at 100 TB one bad row must not kill the job inside ``mapInPandas``
    — callers filter on ``sha256 IS NULL`` if they need to quarantine.
    """
    if payload is None:
        return {"byte_len": None, "sha256": None, "feat_mean": None}
    return {
        "byte_len": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
        "feat_mean": int(sum(payload) / len(payload)) if payload else 0,
    }


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary image rows.

    Arrow moves each partition's batches; per-batch loop stays in
    Python but vectorizes the cheap parts via pandas.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_image_stub)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "byte_len": feats.map(lambda d: d["byte_len"]),
                    "sha256": feats.map(lambda d: d["sha256"]),
                    "feat_mean": feats.map(lambda d: d["feat_mean"]),
                }
            )
            yield out

    return df.mapInPandas(_extract, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("rms_stub", LongType()),  # stubbed loudness proxy
        StructField("target_rate", IntegerType()),
    ]
)


def decode_audio_stub(payload: bytes | None) -> dict:
    """Deterministic fake audio decode — swap for soundfile/librosa:

        data, sr = soundfile.read(io.BytesIO(payload))

    The fake 'rms' is the byte-value RMS; null payloads yield a
    null-feature sentinel (never raise inside the executor).
    """
    if payload is None:
        return {"byte_len": None, "sha256": None, "rms_stub": None}
    rms = int((sum(b * b for b in payload) / len(payload)) ** 0.5) if payload else 0
    return {
        "byte_len": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
        "rms_stub": rms,
    }


def extract_audio_features(df: DataFrame, target_rate: int = 16_000) -> DataFrame:
    """mapInPandas audio feature extraction (resample-to-target plan
    shape; the decode/resample kernel is the stub above)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_audio_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": feats.map(lambda d: d["byte_len"]),
                    "sha256": feats.map(lambda d: d["sha256"]),
                    "rms_stub": feats.map(lambda d: d["rms_stub"]),
                    "target_rate": target_rate,
                }
            )

    return df.mapInPandas(_extract, schema=AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images_stub(
    df: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Resize plumbing: batch-shape and schema are real (binary in,
    binary out, target dims attached); the pixel kernel is stubbed as
    identity — swap for Pillow's ``Image.resize`` without touching the
    plan."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # stub: identity bytes
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 30, frame_count_col: str = "n_frames"
) -> DataFrame:
    """Video frame-sampling *plan*: expand (media_id, n_frames) into one
    row per sampled frame index — pure Spark (sequence + explode); the
    actual frame decode is the stubbed kernel above.
    """
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.col(frame_count_col) - 1, F.lit(every_n))),
    )


def synthetic_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media rows for tests (no codec libs needed)."""
    rows = [
        (
            i,
            bytes([(i * 7 + j) % 256 for j in range(64 + i % 32)]),
            "image/png" if i % 2 == 0 else "image/jpeg",
            64,
            64,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, IMAGE_SCHEMA)
