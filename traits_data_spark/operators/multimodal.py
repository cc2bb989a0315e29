"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

Decode kernels are tiered by what the runtime offers:

1. **Library tier** — ``PIL.Image`` / ``soundfile`` when importable
   (full pixel/sample access).
2. **Native tier** — pure-stdlib container parsers, always available:
   PNG IHDR / JPEG SOF / GIF header for image dimensions, and a full
   WAV PCM decode (header via ``wave``, sample RMS via ``array``).
3. **Stub tier** — deterministic byte-derived fake for formats neither
   tier handles (documented, null-safe), so a 100 TB job never dies on
   one exotic payload.

Every tier reports itself in the ``decoder`` output column, so a
quality pipeline can quarantine or re-route rows that fell through to
the stub. The legacy ``decode_image_stub``/``decode_audio_stub``
entrypoints are kept verbatim — they back the rows-only correctness
entries and the tier-3 fallback.

Scale notes: binary payloads must never pass through a shuffle wider
than necessary — all functions here are ``mapInPandas`` (narrow,
partition-local). Repartition *before* attaching payloads, not after.
"""

from __future__ import annotations

import hashlib
import io
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # optional library tier — absent in this container, used if deployed
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised via monkeypatch
    _PILImage = None

try:  # optional library tier
    import soundfile as _soundfile
except ImportError:  # pragma: no cover
    _soundfile = None

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


# ---------------------------------------------------------------------------
# Tiered image decode: PIL → native header parse → stub
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feat_mean", DoubleType()),
        StructField("decoder", StringType()),
    ]
)

_NULL_IMAGE_META = {
    "byte_len": None,
    "sha256": None,
    "format": None,
    "width": None,
    "height": None,
    "feat_mean": None,
    "decoder": None,
}


def _parse_png(payload: bytes) -> dict | None:
    """PNG: 8-byte signature, then the IHDR chunk (must be first) holds
    big-endian u32 width/height at bytes 16..24."""
    if len(payload) < 24 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if payload[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", payload[16:24])
    return {"format": "png", "width": width, "height": height}


_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0..15 minus DHT/JPG/DAC


def _parse_jpeg(payload: bytes) -> dict | None:
    """JPEG: walk the marker segments until a Start-Of-Frame marker;
    its payload holds big-endian u16 height then width."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # standalone RST/SOI/EOI
            pos += 2
            continue
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        if marker in _JPEG_SOF_MARKERS:
            if pos + 9 > len(payload):
                return None
            height, width = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return {"format": "jpeg", "width": width, "height": height}
        pos += 2 + seg_len
    return None


def _parse_gif(payload: bytes) -> dict | None:
    """GIF87a/89a: little-endian u16 logical-screen width/height at 6..10."""
    if len(payload) < 10 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", payload[6:10])
    return {"format": "gif", "width": width, "height": height}


def decode_image(payload: bytes | None) -> dict:
    """Tiered image decode (see module docstring). Always returns the
    full ``IMAGE_META_SCHEMA`` value dict; never raises on bad bytes —
    one poisoned row must not kill an executor at 100 TB. ``decoder``
    records which tier produced the row ('pil' | 'native' | 'stub').
    """
    if payload is None:
        return dict(_NULL_IMAGE_META)
    base = {
        "byte_len": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
    }
    if _PILImage is not None:
        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                stat = img.convert("L").resize((8, 8)).getdata()
                return {
                    **base,
                    "format": (img.format or "unknown").lower(),
                    "width": img.width,
                    "height": img.height,
                    "feat_mean": float(sum(stat)) / len(stat),
                    "decoder": "pil",
                }
        except Exception:
            pass  # fall through to the native tier
    for parser in (_parse_png, _parse_jpeg, _parse_gif):
        meta = parser(payload)
        if meta is not None:
            return {
                **base,
                **meta,
                # header-only tier: no pixel access, byte-mean proxy
                "feat_mean": float(sum(payload)) / len(payload),
                "decoder": "native",
            }
    stub = decode_image_stub(payload)
    return {
        **base,
        "format": None,
        "width": None,
        "height": None,
        "feat_mean": float(stub["feat_mean"]),
        "decoder": "stub",
    }


def extract_image_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas over binary image rows using the tiered decoder.
    Same narrow, Arrow-batched shape as ``extract_image_features`` but
    with real container parsing (and PIL when deployed alongside it).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_image)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                }
            )
            for field in (
                "byte_len", "sha256", "format", "width", "height",
                "feat_mean", "decoder",
            ):
                out[field] = feats.map(lambda d, f=field: d[f])
            yield out

    return df.mapInPandas(_extract, schema=IMAGE_META_SCHEMA)


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


# ---------------------------------------------------------------------------
# Tiered audio decode: soundfile → stdlib wave (PCM WAV) → stub
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("decoder", StringType()),
    ]
)

_NULL_AUDIO_META = {
    "byte_len": None,
    "sha256": None,
    "sample_rate": None,
    "n_channels": None,
    "n_frames": None,
    "duration_s": None,
    "rms": None,
    "decoder": None,
}


def _decode_wav_native(payload: bytes) -> dict | None:
    """Full PCM WAV decode with only the stdlib: header fields via
    ``wave``, sample RMS via ``array`` over the raw frames. Handles the
    8/16/32-bit integer PCM the format itself defines; anything else
    (float WAV, ADPCM) falls through to the stub tier."""
    import array
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            sw = w.getsampwidth()
            meta = {
                "sample_rate": w.getframerate(),
                "n_channels": w.getnchannels(),
                "n_frames": w.getnframes(),
            }
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    meta["duration_s"] = (
        meta["n_frames"] / meta["sample_rate"] if meta["sample_rate"] else 0.0
    )
    typecode = {1: "b", 2: "h", 4: "i"}.get(sw)
    if typecode is None or not frames:
        meta["rms"] = 0.0
        return meta
    samples = array.array(typecode)
    samples.frombytes(frames[: len(frames) - len(frames) % sw])
    if sw == 1:  # 8-bit WAV is unsigned, centred at 128
        total = sum((s - 128) * (s - 128) for s in samples)
    else:
        total = sum(s * s for s in samples)
    meta["rms"] = (total / len(samples)) ** 0.5 if len(samples) else 0.0
    return meta


def decode_audio(payload: bytes | None) -> dict:
    """Tiered audio decode; see ``decode_image`` for the contract.
    ``decoder`` ∈ {'soundfile', 'native', 'stub'}."""
    if payload is None:
        return dict(_NULL_AUDIO_META)
    base = {
        "byte_len": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
    }
    if _soundfile is not None:
        try:
            data, rate = _soundfile.read(io.BytesIO(payload))
            n_frames = int(data.shape[0])
            n_channels = int(data.shape[1]) if data.ndim > 1 else 1
            rms = float((data.astype("float64") ** 2).mean() ** 0.5)
            return {
                **base,
                "sample_rate": int(rate),
                "n_channels": n_channels,
                "n_frames": n_frames,
                "duration_s": n_frames / rate if rate else 0.0,
                "rms": rms,
                "decoder": "soundfile",
            }
        except Exception:
            pass  # fall through to the native tier
    meta = _decode_wav_native(payload)
    if meta is not None:
        return {**base, **meta, "decoder": "native"}
    stub = decode_audio_stub(payload)
    return {
        **base,
        "sample_rate": None,
        "n_channels": None,
        "n_frames": None,
        "duration_s": None,
        "rms": float(stub["rms_stub"]),
        "decoder": "stub",
    }


def extract_audio_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas over binary audio rows using the tiered decoder."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_audio)
            out = pd.DataFrame({"media_id": pdf["media_id"]})
            for field in (
                "byte_len", "sha256", "sample_rate", "n_channels",
                "n_frames", "duration_s", "rms", "decoder",
            ):
                out[field] = feats.map(lambda d, f=field: d[f])
            yield out

    return df.mapInPandas(_extract, schema=AUDIO_META_SCHEMA)


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


# ---------------------------------------------------------------------------
# Deterministic real-container generators (stdlib-only)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """A real, spec-valid grayscale PNG built with only the stdlib
    (signature + IHDR + zlib IDAT + IEND). Deterministic in its
    arguments, so tests and oracles can predict every field the
    decoder extracts."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00"  # filter type 0 per scanline
        + bytes((x * 31 + y * 17 + seed) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("format", StringType()),
        StructField("duration_s", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_tracks", IntegerType()),
        StructField("decoder", StringType()),
    ]
)

_NULL_VIDEO_META = {
    "byte_len": None,
    "sha256": None,
    "format": None,
    "duration_s": None,
    "width": None,
    "height": None,
    "n_tracks": None,
    "decoder": None,
}


def _iter_mp4_boxes(buf: bytes, start: int, end: int):
    """Yield ``(type, payload_start, payload_end)`` for each ISO-BMFF
    box in ``buf[start:end]``; tolerates 64-bit largesize boxes and
    stops (rather than raises) on a malformed size."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _parse_mp4(payload: bytes) -> dict | None:
    """ISO-BMFF (MP4/MOV): walk top-level boxes to ``moov``; ``mvhd``
    holds the movie timescale + duration (u32 in version 0, u64 in
    version 1), each ``trak``'s ``tkhd`` holds width/height as 16.16
    fixed-point. Returns the first non-zero track dimensions (video
    tracks; audio tracks carry 0×0)."""
    if len(payload) < 16:
        return None
    # an MP4 need not start with ftyp, but for header sniffing we
    # require it (same strictness as the PNG/JPEG/GIF signatures)
    head = list(_iter_mp4_boxes(payload, 0, len(payload)))
    if not head or head[0][0] != b"ftyp":
        return None
    meta: dict = {"format": "mp4", "duration_s": None, "width": None,
                  "height": None, "n_tracks": 0}
    for btype, s, e in head:
        if btype != b"moov":
            continue
        for ctype, cs, ce in _iter_mp4_boxes(payload, s, e):
            if ctype == b"mvhd" and ce - cs >= 20:
                version = payload[cs]
                if version == 1 and ce - cs >= 32:
                    timescale = struct.unpack(">I", payload[cs + 20 : cs + 24])[0]
                    duration = struct.unpack(">Q", payload[cs + 24 : cs + 32])[0]
                else:
                    timescale = struct.unpack(">I", payload[cs + 12 : cs + 16])[0]
                    duration = struct.unpack(">I", payload[cs + 16 : cs + 20])[0]
                if timescale > 0:
                    meta["duration_s"] = duration / timescale
            elif ctype == b"trak":
                meta["n_tracks"] += 1
                for ttype, ts, te in _iter_mp4_boxes(payload, cs, ce):
                    if ttype == b"tkhd" and te - ts >= 8:
                        w16, h16 = struct.unpack(">II", payload[te - 8 : te])
                        w, h = w16 >> 16, h16 >> 16
                        if w and h and meta["width"] is None:
                            meta["width"], meta["height"] = w, h
        return meta
    return meta


# --- EBML / Matroska / WebM (round 10) ------------------------------------
# Element IDs (raw, marker bit included — EBML IDs are stored verbatim)
_EBML_MAGIC = b"\x1a\x45\xdf\xa3"
_EBML_ID_DOCTYPE = 0x4282
_EBML_ID_SEGMENT = 0x18538067
_EBML_ID_INFO = 0x1549A966
_EBML_ID_TIMESTAMP_SCALE = 0x2AD7B1
_EBML_ID_DURATION = 0x4489
_EBML_ID_TRACKS = 0x1654AE6B
_EBML_ID_TRACK_ENTRY = 0xAE
_EBML_ID_VIDEO = 0xE0
_EBML_ID_PIXEL_WIDTH = 0xB0
_EBML_ID_PIXEL_HEIGHT = 0xBA
_EBML_ID_TRACK_TYPE = 0x83


def _iter_ebml(buf: bytes, start: int, end: int):
    """Yield ``(element_id, payload_start, payload_end)`` for each EBML
    element in ``buf[start:end]`` — the Matroska counterpart of
    ``_iter_mp4_boxes``, equally tolerant: stops (never raises) on a
    malformed VINT or a size past the window. Unknown-size elements
    (all size bits set — streamed Segments) extend to the window
    end."""
    pos = start
    while pos + 2 <= end:
        b0 = buf[pos]
        if b0 == 0:
            return
        idn = 9 - b0.bit_length()  # leading zeros + 1
        if idn > 4 or pos + idn > end:
            return
        eid = int.from_bytes(buf[pos : pos + idn], "big")
        spos = pos + idn
        if spos >= end:
            return
        s0 = buf[spos]
        if s0 == 0:
            return
        sn = 9 - s0.bit_length()
        if sn > 8 or spos + sn > end:
            return
        data_bits = s0 & ((0x80 >> (sn - 1)) - 1)
        size = int.from_bytes(
            bytes([data_bits]) + buf[spos + 1 : spos + sn], "big"
        )
        max_unknown = (1 << (7 * sn)) - 1
        ps = spos + sn
        pe = end if size == max_unknown else ps + size
        if pe > end:
            return
        yield eid, ps, pe
        pos = pe


def _ebml_uint(buf: bytes, s: int, e: int) -> int | None:
    if e - s < 1 or e - s > 8:
        return None
    return int.from_bytes(buf[s:e], "big")


def _parse_webm(payload: bytes) -> dict | None:
    """EBML (WebM/Matroska): the EBML header's DocType names the
    format; Segment→Info carries TimestampScale (ns per timestamp
    unit, default 1,000,000) and Duration (float32/float64 in
    timestamp units — ``duration_s = duration · scale / 1e9``);
    Segment→Tracks→TrackEntry elements carry the track count and the
    first Video child's PixelWidth/PixelHeight."""
    if len(payload) < 8 or payload[:4] != _EBML_MAGIC:
        return None
    meta: dict = {"format": "matroska", "duration_s": None, "width": None,
                  "height": None, "n_tracks": 0}
    scale = 1_000_000
    duration_units: float | None = None
    for eid, s, e in _iter_ebml(payload, 0, len(payload)):
        if eid == int.from_bytes(_EBML_MAGIC, "big"):
            for hid, hs, he in _iter_ebml(payload, s, e):
                if hid == _EBML_ID_DOCTYPE:
                    meta["format"] = (
                        payload[hs:he].split(b"\x00")[0].decode(
                            "ascii", "replace"
                        )
                        or "matroska"
                    )
        elif eid == _EBML_ID_SEGMENT:
            for cid, cs, ce in _iter_ebml(payload, s, e):
                if cid == _EBML_ID_INFO:
                    for iid, is_, ie in _iter_ebml(payload, cs, ce):
                        if iid == _EBML_ID_TIMESTAMP_SCALE:
                            v = _ebml_uint(payload, is_, ie)
                            if v:
                                scale = v
                        elif iid == _EBML_ID_DURATION:
                            if ie - is_ == 4:
                                duration_units = struct.unpack(
                                    ">f", payload[is_:ie]
                                )[0]
                            elif ie - is_ == 8:
                                duration_units = struct.unpack(
                                    ">d", payload[is_:ie]
                                )[0]
                elif cid == _EBML_ID_TRACKS:
                    for tid, ts, te in _iter_ebml(payload, cs, ce):
                        if tid != _EBML_ID_TRACK_ENTRY:
                            continue
                        meta["n_tracks"] += 1
                        for vid, vs, ve in _iter_ebml(payload, ts, te):
                            if vid != _EBML_ID_VIDEO:
                                continue
                            w = h = None
                            for pid, p_s, p_e in _iter_ebml(
                                payload, vs, ve
                            ):
                                if pid == _EBML_ID_PIXEL_WIDTH:
                                    w = _ebml_uint(payload, p_s, p_e)
                                elif pid == _EBML_ID_PIXEL_HEIGHT:
                                    h = _ebml_uint(payload, p_s, p_e)
                            if w and h and meta["width"] is None:
                                meta["width"], meta["height"] = w, h
            break  # first Segment only
    if duration_units is not None:
        meta["duration_s"] = duration_units * scale / 1e9
    return meta


def decode_video(payload: bytes | None) -> dict:
    """Tiered video metadata decode, same contract as ``decode_image``:
    never raises (a poisoned row must not kill an executor), always
    returns the full ``VIDEO_META_SCHEMA`` value dict, and records the
    producing tier in ``decoder`` ('native' — stdlib ISO-BMFF parse —
    'native_ebml' — stdlib EBML/Matroska/WebM parse — or 'stub').
    Frame/pixel access needs a codec library (PyAV/ffmpeg,
    absent in this container) — this kernel reads CONTAINER metadata
    only, which is exactly what partition planning, duration budgeting,
    and ``frame_sample_plan`` need."""
    if payload is None:
        return dict(_NULL_VIDEO_META)
    base = {
        "byte_len": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
    }
    try:
        meta = _parse_mp4(payload)
    except Exception:  # malformed container mid-parse
        meta = None
    if meta is not None:
        return {**base, **meta, "decoder": "native"}
    try:
        meta = _parse_webm(payload)
    except Exception:
        meta = None
    if meta is not None:
        return {**base, **meta, "decoder": "native_ebml"}
    return {
        **base,
        "format": None,
        "duration_s": None,
        "width": None,
        "height": None,
        "n_tracks": None,
        "decoder": "stub",
    }


def extract_video_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas over binary video rows using the tiered decoder —
    the same narrow Arrow-batched shape as ``extract_image_metadata``
    (only ``media_id`` + ``payload`` move through Python)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_video)
            out = pd.DataFrame({"media_id": pdf["media_id"]})
            for field in (
                "byte_len", "sha256", "format", "duration_s", "width",
                "height", "n_tracks", "decoder",
            ):
                out[field] = feats.map(lambda d, f=field: d[f])
            yield out

    return df.mapInPandas(_extract, schema=VIDEO_META_SCHEMA)


def wav_bytes(
    sample_rate: int = 8_000, n_frames: int = 100, amplitude: int = 1_000
) -> bytes:
    """A real 16-bit mono PCM WAV: an ``amplitude`` square wave, so the
    decoded RMS is exactly ``amplitude`` — predictable by an arithmetic
    oracle with no audio library on the other side."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            struct.pack(
                f"<{n_frames}h",
                *(amplitude if i % 2 == 0 else -amplitude for i in range(n_frames)),
            )
        )
    return buf.getvalue()


def _mp4_box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + tag + payload


def mp4_bytes(
    duration_ms: int,
    width: int,
    height: int,
    timescale: int = 1_000,
    n_extra_tracks: int = 0,
) -> bytes:
    """A minimal spec-valid ISO-BMFF container built with only the
    stdlib: ``ftyp`` + ``moov`` holding a version-0 ``mvhd`` (movie
    timescale/duration) and one video ``trak``/``tkhd`` (16.16
    fixed-point width/height), plus ``n_extra_tracks`` zero-dimension
    (audio-style) tracks. No media data — metadata-complete is all the
    native tier reads, and tests/oracles can predict every field
    arithmetically. Deterministic in its arguments (mirror of
    ``png_bytes``/``wav_bytes``)."""
    duration = duration_ms * timescale // 1_000
    matrix = struct.pack(
        ">9I", 0x0001_0000, 0, 0, 0, 0x0001_0000, 0, 0, 0, 0x4000_0000
    )
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0, flags 0
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">IHH", 0x0001_0000, 0x0100, 0)  # rate, volume, rsvd
        + b"\x00" * 8  # reserved
        + matrix
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2 + n_extra_tracks),  # next_track_ID
    )

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return _mp4_box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIII", 0, 0, track_id, 0)
            + struct.pack(">I", duration)
            + b"\x00" * 8  # reserved
            + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/rsvd
            + matrix
            + struct.pack(">II", w << 16, h << 16),
        )

    traks = _mp4_box(b"trak", tkhd(1, width, height))
    for i in range(n_extra_tracks):
        traks += _mp4_box(b"trak", tkhd(2 + i, 0, 0))
    return (
        _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        + _mp4_box(b"moov", mvhd + traks)
    )


def _ebml_size(n: int) -> bytes:
    """Minimal EBML size VINT (marker bit + 7·len data bits)."""
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:  # all-ones is reserved (unknown)
            return ((1 << (7 * ln)) | n).to_bytes(ln, "big")
    raise ValueError("EBML size too large")


def _ebml_el(eid: int, payload: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return idb + _ebml_size(len(payload)) + payload


def _ebml_uint_bytes(n: int) -> bytes:
    return n.to_bytes(max(1, (n.bit_length() + 7) // 8), "big")


def webm_bytes(
    duration_ms: int,
    width: int,
    height: int,
    timescale_ns: int = 1_000_000,
    n_extra_tracks: int = 0,
) -> bytes:
    """A minimal spec-valid EBML/WebM container built with only the
    stdlib: EBML header (DocType 'webm') + Segment holding Info
    (TimestampScale in ns, Duration as float64 in timestamp units) and
    a Tracks element with one video TrackEntry (PixelWidth/Height)
    plus ``n_extra_tracks`` audio-style entries. No clusters/media
    data — metadata-complete is all the native_ebml tier reads, so
    tests/oracles can predict every field arithmetically (duration_s
    = duration_ms·10⁶/scale · scale/10⁹ = duration_ms/1000 exactly in
    IEEE doubles at the default scale). Mirror of ``mp4_bytes``."""
    duration_units = duration_ms * 1_000_000 / timescale_ns
    header = _ebml_el(
        int.from_bytes(_EBML_MAGIC, "big"),
        _ebml_el(_EBML_ID_DOCTYPE, b"webm"),
    )
    info = _ebml_el(
        _EBML_ID_INFO,
        _ebml_el(_EBML_ID_TIMESTAMP_SCALE, _ebml_uint_bytes(timescale_ns))
        + _ebml_el(_EBML_ID_DURATION, struct.pack(">d", duration_units)),
    )
    video_trak = _ebml_el(
        _EBML_ID_TRACK_ENTRY,
        _ebml_el(_EBML_ID_TRACK_TYPE, b"\x01")
        + _ebml_el(
            _EBML_ID_VIDEO,
            _ebml_el(_EBML_ID_PIXEL_WIDTH, _ebml_uint_bytes(width))
            + _ebml_el(_EBML_ID_PIXEL_HEIGHT, _ebml_uint_bytes(height)),
        ),
    )
    traks = video_trak + b"".join(
        _ebml_el(_EBML_ID_TRACK_ENTRY, _ebml_el(_EBML_ID_TRACK_TYPE, b"\x02"))
        for _ in range(n_extra_tracks)
    )
    segment = _ebml_el(
        _EBML_ID_SEGMENT, info + _ebml_el(_EBML_ID_TRACKS, traks)
    )
    return header + segment


def synthetic_webm_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Attach a real WebM payload per row, executor-side: duration
    ``400 + (id % 90) * 50`` ms, width ``256 + (id % 6) * 32``, height
    ``144 + (id % 4) * 72``, plus ``id % 3`` extra audio-style
    tracks — the EBML mirror of ``synthetic_mp4_media``."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": ids.map(
                        lambda i: webm_bytes(
                            duration_ms=400 + (i % 90) * 50,
                            width=256 + (i % 6) * 32,
                            height=144 + (i % 4) * 72,
                            n_extra_tracks=int(i % 3),
                        )
                    ),
                    "mime": "video/webm",
                }
            )

    return df.mapInPandas(_gen, schema=MEDIA_GEN_SCHEMA)


def synthetic_mp4_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Attach a real MP4 payload per row, executor-side: duration
    ``500 + (id % 100) * 40`` ms at timescale 1000, width
    ``320 + (id % 5) * 16``, height ``180 + (id % 3) * 60``, plus
    ``id % 2`` extra zero-dimension (audio-style) tracks."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": ids.map(
                        lambda i: mp4_bytes(
                            duration_ms=500 + (i % 100) * 40,
                            width=320 + (i % 5) * 16,
                            height=180 + (i % 3) * 60,
                            n_extra_tracks=int(i % 2),
                        )
                    ),
                    "mime": "video/mp4",
                }
            )

    return df.mapInPandas(_gen, schema=MEDIA_GEN_SCHEMA)


MEDIA_GEN_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)


def synthetic_png_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Attach a real PNG payload per row, generated executor-side in
    Arrow batches (no driver collect): width ``16 + id % 10``, height
    ``8 + id % 7``, pixels seeded by the id."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": ids.map(
                        lambda i: png_bytes(16 + i % 10, 8 + i % 7, seed=int(i))
                    ),
                    "mime": "image/png",
                }
            )

    return df.mapInPandas(_gen, schema=MEDIA_GEN_SCHEMA)


def synthetic_wav_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Attach a real WAV payload per row, executor-side: sample rate
    ``8000 + (id % 3) * 4000``, frames ``50 + id % 20``, amplitude
    ``1000 + (id % 5) * 100`` (= exact RMS)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": ids.map(
                        lambda i: wav_bytes(
                            sample_rate=8_000 + (i % 3) * 4_000,
                            n_frames=50 + i % 20,
                            amplitude=1_000 + (i % 5) * 100,
                        )
                    ),
                    "mime": "audio/wav",
                }
            )

    return df.mapInPandas(_gen, schema=MEDIA_GEN_SCHEMA)


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
