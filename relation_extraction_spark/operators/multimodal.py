"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; decode /
feature-extraction run as Arrow-batched ``mapInPandas`` stages. The container
has no image/audio libraries, so the decode step is STUBBED — a clearly
marked deterministic fake behind the same Spark-side contract (schema,
partitioning, UDF signature, batch shape), so swapping in a real decoder is a
one-function change. See the task brief: plumbing is real and tested, decode
is fake.
"""

from __future__ import annotations

import hashlib
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


def _decode_image(payload: bytes):  # pragma: no cover - stub boundary
    """Real image decode requires PIL/opencv — not in this container."""
    raise NotImplementedError("image decode stubbed: container has no imaging libs")


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
    """Deterministic media fixture (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (i % 4 + 1)
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "duration_ms": 1000 * (i % 7 + 1) if kind != "image" else None,
        }
        rows.append((f"m{i}", kind, payload,
                     (meta["mime"], meta["width"], meta["height"], meta["duration_ms"])))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
