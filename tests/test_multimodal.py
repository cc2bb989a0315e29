"""Multimodal plumbing: Arrow-batched feature extraction, null-payload
resilience, frame-sampling plan."""

import hashlib

from pyspark.sql import functions as F

from traits_data_spark.operators.multimodal import (
    IMAGE_SCHEMA,
    extract_image_features,
    frame_sample_plan,
    synthetic_media_table,
)


def test_extract_features_deterministic(spark):
    media = synthetic_media_table(spark, n=8)
    out = extract_image_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 8
    payload = bytes([(0 * 7 + j) % 256 for j in range(64)])
    assert rows[0]["sha256"] == hashlib.sha256(payload).hexdigest()
    assert rows[0]["byte_len"] == 64


def test_null_payload_survives_as_sentinel(spark):
    media = synthetic_media_table(spark, n=2)
    nullrow = spark.createDataFrame(
        [(99, None, "image/png", 0, 0)], IMAGE_SCHEMA
    )
    out = extract_image_features(media.unionByName(nullrow))
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 3  # job did not die
    assert rows[99]["sha256"] is None
    assert rows[99]["byte_len"] is None


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 91)], ["media_id", "n_frames"])
    out = frame_sample_plan(df, every_n=30)
    idx = sorted(r["frame_idx"] for r in out.collect())
    assert idx == [0, 30, 60, 90]


def test_audio_features_and_null_payload(spark):
    from traits_data_spark.operators.multimodal import (
        AUDIO_SCHEMA,
        extract_audio_features,
    )

    rows = [
        (1, bytes(range(64)), "audio/wav", 44100, 2),
        (2, None, "audio/wav", 44100, 2),
    ]
    df = spark.createDataFrame(rows, AUDIO_SCHEMA)
    out = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert out[1]["byte_len"] == 64 and out[1]["rms_stub"] is not None
    assert out[2]["sha256"] is None  # null payload survives
    assert out[1]["target_rate"] == 16000


def test_resize_plumbing_preserves_rows(spark):
    from traits_data_spark.operators.multimodal import (
        resize_images_stub,
        synthetic_media_table,
    )

    media = synthetic_media_table(spark, n=6)
    out = resize_images_stub(media, width=128, height=96)
    rows = out.collect()
    assert len(rows) == 6
    assert all(r["width"] == 128 and r["height"] == 96 for r in rows)
    assert all(r["payload"] is not None for r in rows)
