"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The actual codec work is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises NotImplementedError unless the
deterministic fake decoder is requested. Everything Spark-side — schema,
partition sizing, mapInPandas batch shape, feature extraction plumbing —
is real and tested, so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bloomine_spark.functions.hashing import splitmix64

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),     # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes with a tiny
    header encoding (width, height) so the fake decoder can parse shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                h = splitmix64(np.array([rid + seed], dtype=np.uint64))[0]
                w = 16 + int(h % np.uint64(48))
                ht = 16 + int((h >> np.uint64(8)) % np.uint64(48))
                body = (
                    splitmix64(
                        np.arange(w * ht, dtype=np.uint64) + np.uint64(int(h))
                    )
                    % np.uint64(256)
                ).astype(np.uint8)
                payload = struct.pack("<II", w, ht) + body.tobytes()
                rows.append(
                    {
                        "media_id": f"m{int(rid):08d}",
                        "media_type": "image",
                        "payload": payload,
                        "meta": {"codec": "fake-raw", "w": str(w), "h": str(ht)},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=max(1, n // 1000)).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    w, h = struct.unpack("<II", payload[:8])
    return np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)


def decode_image_features(
    media: DataFrame,
    decoder: str = "stub",
    grid: int = 4,
) -> DataFrame:
    """Decode images and extract a grid-pooled feature vector per image.

    decoder='stub' raises NotImplementedError (no codec libs in this
    environment — the marked integration point for PIL/ffmpeg); decoder=
    'fake' parses the synthetic payload format deterministically so the full
    Spark pipeline (batching, schema, pooling) is exercised end-to-end.
    """
    if decoder not in ("stub", "fake"):
        raise ValueError("decoder must be 'stub' or 'fake'")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "width": [], "height": [], "features": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if decoder == "stub":
                    raise NotImplementedError(
                        "real image decoding requires PIL/opencv — not "
                        "available in this container; use decoder='fake' or "
                        "plug a codec here"
                    )
                img = _fake_decode(bytes(payload))
                h, w = img.shape
                # grid-pooled mean features (the real feature extractor
                # slot): grid×grid block means, vectorized
                ys = np.linspace(0, h, grid + 1, dtype=int)
                xs = np.linspace(0, w, grid + 1, dtype=int)
                feats = np.array(
                    [
                        img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
                        for i in range(grid)
                        for j in range(grid)
                    ],
                    dtype=np.float32,
                )
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "image").mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_n: int = 10, decoder: str = "stub"
) -> DataFrame:
    """Frame-sampling plumbing for video payloads (decode stubbed)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub" and len(pdf):
                raise NotImplementedError(
                    "video frame decoding requires ffmpeg — integration "
                    "point; deterministic fake not implemented for video"
                )
            yield pd.DataFrame(
                {"media_id": [], "frame_idx": [], "frame": []}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        kernel, schema=schema
    )
