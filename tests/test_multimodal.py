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


# ---------------------------------------------------------------------------
# Tiered decoders over real container bytes (stdlib-generated fixtures)
# ---------------------------------------------------------------------------


def test_decode_image_real_png():
    from traits_data_spark.operators.multimodal import decode_image, png_bytes

    meta = decode_image(png_bytes(23, 11, seed=5))
    assert (meta["format"], meta["width"], meta["height"]) == ("png", 23, 11)
    assert meta["decoder"] in ("pil", "native")  # 'pil' if deployed with PIL
    assert meta["sha256"] and meta["byte_len"] > 24


def test_decode_image_jpeg_and_gif_headers():
    import struct

    from traits_data_spark.operators.multimodal import decode_image

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x01\x11\x00"
    )
    jpeg = decode_image(b"\xff\xd8" + app0 + sof0 + b"\xff\xd9")
    assert (jpeg["format"], jpeg["width"], jpeg["height"]) == ("jpeg", 640, 480)

    gif = decode_image(
        b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 20
    )
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 320, 200)


def test_decode_image_fallback_tiers():
    from traits_data_spark.operators.multimodal import decode_image

    garbage = decode_image(b"definitely not an image")
    assert garbage["decoder"] == "stub"
    assert garbage["width"] is None and garbage["sha256"] is not None

    null = decode_image(None)
    assert null["sha256"] is None and null["decoder"] is None


def test_decode_audio_real_wav_exact_rms():
    from traits_data_spark.operators.multimodal import decode_audio, wav_bytes

    meta = decode_audio(wav_bytes(sample_rate=12_000, n_frames=57, amplitude=1_200))
    assert meta["sample_rate"] == 12_000
    assert meta["n_channels"] == 1
    assert meta["n_frames"] == 57
    assert meta["duration_s"] == 57 / 12_000
    # square wave: every sample is ±amplitude, so RMS is exact
    assert meta["rms"] == 1_200.0
    assert meta["decoder"] in ("soundfile", "native")

    assert decode_audio(b"junkjunkjunk")["decoder"] == "stub"
    assert decode_audio(None)["decoder"] is None


def test_extract_metadata_end_to_end(spark):
    """Executor-side generation → tiered decode, through mapInPandas."""
    from pyspark.sql import functions as F

    from traits_data_spark.operators.multimodal import (
        extract_audio_metadata,
        extract_image_metadata,
        synthetic_png_media,
        synthetic_wav_media,
    )

    ids = spark.range(40).select(F.col("id").alias("media_id"))

    img = {
        r["media_id"]: r
        for r in extract_image_metadata(synthetic_png_media(ids)).collect()
    }
    assert len(img) == 40
    for i, r in img.items():
        assert (r["format"], r["width"], r["height"]) == (
            "png", 16 + i % 10, 8 + i % 7,
        ), r

    aud = {
        r["media_id"]: r
        for r in extract_audio_metadata(
            synthetic_wav_media(ids).select("media_id", "payload")
        ).collect()
    }
    assert len(aud) == 40
    for i, r in aud.items():
        assert r["sample_rate"] == 8_000 + (i % 3) * 4_000
        assert r["n_frames"] == 50 + i % 20
        assert r["rms"] == 1_000.0 + (i % 5) * 100


def test_mp4_roundtrip_native_tier():
    """The stdlib ISO-BMFF generator and parser agree on every field,
    including version-0 u32 durations, 16.16 dimensions, and extra
    zero-dimension (audio-style) tracks."""
    from traits_data_spark.operators.multimodal import decode_video, mp4_bytes

    d = decode_video(mp4_bytes(620, 368, 240, n_extra_tracks=1))
    assert d["format"] == "mp4" and d["decoder"] == "native"
    assert d["duration_s"] == 0.62
    assert (d["width"], d["height"], d["n_tracks"]) == (368, 240, 2)


def test_decode_video_poisoned_rows_never_raise():
    """Garbage, truncation mid-box, and null all degrade, never raise —
    the one-poisoned-row-at-100TB contract shared by all decoders."""
    from traits_data_spark.operators.multimodal import decode_video, mp4_bytes

    assert decode_video(None)["decoder"] is None
    assert decode_video(b"not a container")["decoder"] == "stub"
    # valid ftyp, moov truncated: header sniff succeeds (native), the
    # unparseable fields stay null
    cut = decode_video(mp4_bytes(1000, 100, 100)[:40])
    assert cut["decoder"] == "native" and cut["width"] is None
    # size field lying beyond the buffer stops the walk cleanly
    import struct

    lying = struct.pack(">I", 1 << 30) + b"ftypisom"
    assert decode_video(lying)["decoder"] == "stub"


def test_extract_video_metadata_spark_path(spark):
    """End-to-end mapInPandas: synthetic MP4s decode to the predicted
    arithmetic fields (the catalog oracle's contract)."""
    from traits_data_spark.operators.multimodal import (
        extract_video_metadata,
        synthetic_mp4_media,
    )

    ids = spark.range(30).withColumnRenamed("id", "media_id")
    out = {
        r["media_id"]: r
        for r in extract_video_metadata(
            synthetic_mp4_media(ids).select("media_id", "payload")
        ).collect()
    }
    assert len(out) == 30
    for i, r in out.items():
        assert r["decoder"] == "native"
        assert r["duration_s"] == (500 + (i % 100) * 40) / 1000
        assert (r["width"], r["height"]) == (
            320 + (i % 5) * 16, 180 + (i % 3) * 60,
        )
        assert r["n_tracks"] == 1 + i % 2


def test_webm_roundtrip_native_ebml_tier():
    """The stdlib EBML generator and parser agree on every field:
    DocType, float64 Duration x TimestampScale, PixelWidth/Height,
    and audio-style extra TrackEntries."""
    from traits_data_spark.operators.multimodal import decode_video, webm_bytes

    d = decode_video(webm_bytes(1500, 640, 360, n_extra_tracks=2))
    assert d["format"] == "webm" and d["decoder"] == "native_ebml"
    assert d["duration_s"] == 1.5
    assert (d["width"], d["height"], d["n_tracks"]) == (640, 360, 3)
    # non-default timestamp scale (0.5 ms units)
    d2 = decode_video(webm_bytes(750, 100, 50, timescale_ns=500_000))
    assert d2["duration_s"] == 0.75 and d2["decoder"] == "native_ebml"


def test_webm_poisoned_rows_never_raise():
    """Truncated EBML headers/VINTs degrade (null fields or stub),
    never raise; an mp4 payload still routes to the ISO-BMFF tier."""
    from traits_data_spark.operators.multimodal import (
        decode_video,
        mp4_bytes,
        webm_bytes,
    )

    b = webm_bytes(1000, 320, 180)
    for cut in (3, 4, 7, 12, len(b) // 2, len(b) - 1):
        r = decode_video(b[:cut])
        assert r["decoder"] in ("native_ebml", "stub")
    # unknown-size Segment (streamed form): all size bits set
    assert decode_video(mp4_bytes(100, 8, 8))["decoder"] == "native"


def test_ebml_unknown_size_segment_extends_to_end():
    """Streamed Matroska writes Segment with the reserved all-ones
    size; the walker must treat it as extending to the buffer end."""
    from traits_data_spark.operators.multimodal import (
        _EBML_ID_SEGMENT,
        decode_video,
        webm_bytes,
    )

    b = webm_bytes(2000, 320, 180)
    # rebuild: header + Segment re-wrapped with the unknown-size VINT
    seg_id = _EBML_ID_SEGMENT.to_bytes(4, "big")
    hdr_end = b.index(seg_id)
    seg = b[hdr_end:]
    size_len = 9 - seg[len(seg_id)].bit_length()  # real size-VINT len
    payload = seg[len(seg_id) + size_len:]
    unknown = seg_id + b"\xff"  # 1-byte size VINT, all data bits set
    d = decode_video(b[:hdr_end] + unknown + payload)
    assert d["decoder"] == "native_ebml"
    assert d["duration_s"] == 2.0
    assert (d["width"], d["height"]) == (320, 180)


def test_extract_webm_metadata_spark_path(spark):
    """End-to-end mapInPandas: synthetic WebMs decode to the predicted
    arithmetic fields (the webm_metadata oracle's contract)."""
    from traits_data_spark.operators.multimodal import (
        extract_video_metadata,
        synthetic_webm_media,
    )

    ids = spark.range(30).withColumnRenamed("id", "media_id")
    out = {
        r["media_id"]: r
        for r in extract_video_metadata(
            synthetic_webm_media(ids).select("media_id", "payload")
        ).collect()
    }
    assert len(out) == 30
    for i, r in out.items():
        assert r["decoder"] == "native_ebml" and r["format"] == "webm"
        assert r["duration_s"] == (400 + (i % 90) * 50) * 1000000.0 / 1e9
        assert (r["width"], r["height"]) == (
            256 + (i % 6) * 32, 144 + (i % 4) * 72,
        )
        assert r["n_tracks"] == 1 + i % 3
