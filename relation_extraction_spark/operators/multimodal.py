"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; decode /
feature-extraction run as Arrow-batched ``mapInPandas`` stages.

Decode status: **real for uncompressed containers, stubbed for compressed
codecs**. ``decode_bmp`` / ``decode_wav`` are dependency-free byte parsers
(struct over the public BMP/RIFF layouts) that produce true width/height/
mean-brightness and channels/sample-rate/duration/RMS; ``decode_media`` runs
them distributed in one shuffle-free Arrow stage, per-item error-isolated.
Compressed formats (PNG/JPEG/MP4) genuinely need codec libraries the
container doesn't ship, so they return ``ok=false, err='unsupported…'`` —
that row-level boundary replaces the old module-level NotImplementedError
stub; plugging a real codec in means extending ``_DECODERS``.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType()),
    T.StructField("payload_sha", T.StringType()),
    T.StructField("payload_bytes", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# Real pure-Python decoders for uncompressed containers (no codec libraries
# needed): BMP (BITMAPINFOHEADER / BITMAPCOREHEADER) and RIFF/WAVE PCM.
# Byte layouts are the public file-format specifications.
# ---------------------------------------------------------------------------


def make_bmp(width: int, height: int, rgb: tuple[int, int, int] = (8, 64, 200)) -> bytes:
    """Emit a real uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER),
    solid ``rgb`` with a deterministic per-row gradient on the blue channel —
    a true image fixture for decode tests, not random bytes."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    pixel_bytes = (row_raw + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    r, g, b = rgb
    rows = bytearray()
    for y in range(height):
        px = bytes((min(255, b + y), g, r)) * width  # BGR order per spec
        rows += px + b"\x00" * pad
    return header + info + bytes(rows)


def decode_bmp(payload: bytes) -> dict:
    """Parse a BMP header (+ pixels when uncompressed 24-bit): returns
    width, height, bpp and the mean pixel brightness in [0, 1] (a real
    image-level feature). Raises ValueError on malformed input."""
    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size >= 40:       # BITMAPINFOHEADER and successors
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
    elif hdr_size == 12:     # BITMAPCOREHEADER
        width, height = struct.unpack_from("<hh", payload, 18)
        bpp = struct.unpack_from("<H", payload, 24)[0]
        compression = 0
    else:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    height_abs = abs(height)
    if width <= 0 or height_abs == 0:
        raise ValueError("BMP with non-positive dimensions")
    out = {"format": "bmp", "width": width, "height": height_abs, "bpp": bpp}
    if compression == 0 and bpp == 24:
        row = width * 3
        stride = row + (4 - row % 4) % 4
        need = data_off + stride * height_abs
        if len(payload) < need:
            raise ValueError("truncated BMP pixel data")
        total = 0
        for y in range(height_abs):
            start = data_off + y * stride
            total += sum(payload[start:start + row])
        out["mean_level"] = round(total / (row * height_abs) / 255.0, 6)
    return out


def make_wav(duration_ms: int, sample_rate: int = 8000, n_channels: int = 1,
             amplitude: int = 12000) -> bytes:
    """Emit a real 16-bit PCM RIFF/WAVE file: a deterministic triangle wave
    (no float trig, exactly reproducible) of the requested duration."""
    n_frames = sample_rate * duration_ms // 1000
    period = max(2, sample_rate // 440)
    samples = bytearray()
    for i in range(n_frames):
        phase = i % period
        tri = (4 * phase // period)  # 0..3 quadrant
        val = (amplitude * (phase * 4 % (2 * period) - period) // period)
        val = val if tri < 2 else -val
        frame = struct.pack("<h", max(-32768, min(32767, val))) * n_channels
        samples += frame
    data = bytes(samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      n_channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> dict:
    """Walk RIFF chunks of a WAVE file: returns channels, sample rate, bits,
    duration_ms and (for 16-bit PCM) the normalized RMS level in [0, 1].
    Raises ValueError on malformed input."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format, n_channels, sample_rate, byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAVE codec {audio_format} (PCM only)")
    if byte_rate == 0:
        raise ValueError("WAVE with zero byte rate")
    out = {
        "format": "wav", "n_channels": n_channels, "sample_rate": sample_rate,
        "bits": bits, "duration_ms": int(len(data) * 1000 // byte_rate),
    }
    if bits == 16 and len(data) >= 2:
        n = len(data) // 2
        acc = 0
        for (v,) in struct.iter_unpack("<h", data[: n * 2]):
            acc += v * v
        out["mean_level"] = round((acc / n) ** 0.5 / 32768.0, 6)
    return out


_MAGICS = (
    (b"\x89PNG", "png"), (b"\xff\xd8\xff", "jpeg"), (b"GIF8", "gif"),
    (b"RIFF", "riff"), (b"BM", "bmp"),
)


def sniff_format(payload: bytes) -> str:
    for magic, name in _MAGICS:
        if payload[: len(magic)] == magic:
            return name
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def _decode_any(payload: bytes) -> dict:
    kind = sniff_format(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "riff":
        return decode_wav(payload)
    raise ValueError(
        f"unsupported container format '{kind}': compressed codecs need "
        "libraries this container does not ship (plug into _DECODERS)")


DECODE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("mean_level", T.DoubleType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("err", T.StringType()),
])


def decode_media(media: DataFrame) -> DataFrame:
    """Distributed decode of binary media payloads: one shuffle-free Arrow
    stage; per-item errors are isolated into (ok=false, err) rows instead of
    failing the task — at 100 TB a corrupt payload must cost one row, not a
    stage retry."""
    src = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                rec = {"media_id": mid, "kind": kind, "format": None,
                       "width": None, "height": None, "n_channels": None,
                       "sample_rate": None, "duration_ms": None,
                       "mean_level": None, "ok": False, "err": None}
                try:
                    d = _decode_any(bytes(payload) if payload is not None else b"")
                    rec.update({k: d.get(k) for k in
                                ("format", "width", "height", "n_channels",
                                 "sample_rate", "duration_ms", "mean_level")})
                    rec["ok"] = True
                except ValueError as exc:
                    rec["err"] = str(exc)
                rows.append(rec)
            out = pd.DataFrame(rows)
            for int_col in ("width", "height", "n_channels", "sample_rate",
                            "duration_ms"):
                out[int_col] = out[int_col].astype("Int32")
            yield out

    return src.mapInPandas(run, schema=DECODE_SCHEMA)


def _feature_from_digest(digest: bytes, dim: int = FEATURE_DIM) -> list[float]:
    return [digest[i % 32] / 256.0 for i in range(dim)]


def fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode→embed: sha256 bytes → floats in [0,1).

    Marks exactly where a real decoder/encoder plugs in; everything around it
    (Arrow batching, schema, partitioning) is production-shaped.
    """
    return _feature_from_digest(hashlib.sha256(payload or b"").digest(), dim)


def extract_features(media: DataFrame, batch_size_hint: int | None = None) -> DataFrame:
    """media(MEDIA_SCHEMA) → per-item feature rows via mapInPandas.
    Each payload is hashed ONCE; the hex column and the feature vector both
    derive from that digest."""
    src = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            digests = [hashlib.sha256(p).digest() for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload_sha": [d.hex() for d in digests],
                "payload_bytes": pd.Series([len(p) for p in payloads], dtype="int32"),
                "feature": pd.Series([_feature_from_digest(d) for d in digests],
                                     dtype=object),
            })

    return src.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp —
    pure column expressions; the (stubbed) decoder consumes the plan.
    Videos with unknown (null) or zero duration plan NO frames."""
    return (
        media.where((F.col("kind") == "video") & (F.col("meta.duration_ms") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture. Image and audio payloads are REAL files
    (uncompressed BMP / PCM WAV built by make_bmp/make_wav) whose metadata
    struct matches what decode_media recovers from the bytes; video payloads
    stay opaque seeded bytes (mp4 is a documented unsupported codec)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        width, height = 16 + i % 8, 12 + i % 5
        duration_ms = 250 * (i % 7 + 1)
        if kind == "image":
            payload = make_bmp(width, height, rgb=(i % 256, (i * 7) % 256, (i * 13) % 256))
        elif kind == "audio":
            payload = make_wav(duration_ms)
        else:
            payload = hashlib.sha256(f"media{i}".encode()).digest() * (i % 4 + 1)
        meta = {
            "mime": {"image": "image/bmp", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": width if kind == "image" else None,
            "height": height if kind == "image" else None,
            "duration_ms": duration_ms if kind != "image" else None,
        }
        rows.append((f"m{i}", kind, payload,
                     (meta["mime"], meta["width"], meta["height"], meta["duration_ms"])))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
