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
