"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, batch shapes, partition-aware
mapInPandas decode) is real and tested; the actual media decode is
STUBBED deterministically because no image/audio libraries exist in
this container — swap `_decode_image_stub` for a PIL/ffmpeg call in a
real deployment (signature and batching stay identical).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StructType(
            [
                T.StructField("width", T.IntegerType(), True),
                T.StructField("height", T.IntegerType(), True),
                T.StructField("duration_ms", T.IntegerType(), True),
                T.StructField("mime", T.StringType(), True),
            ]
        ), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _decode_image_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake decode: md5-seeded pseudo-feature.

    REAL IMPLEMENTATION would be: PIL.Image.open(BytesIO(payload)) →
    resize → np.asarray → feature extractor. Not available in this
    container; raise-or-fake is controlled by the caller.
    """
    digest = hashlib.md5(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Binary payloads → feature vectors via Arrow-batched mapInPandas.

    Batch shape: one pandas DataFrame per Arrow batch; payloads stay
    bytes end-to-end (no base64 round trips).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": [True] * len(pdf),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows derived
    from metadata only — the expensive decode happens downstream on the
    exploded plan, so Spark parallelizes per-frame, not per-video."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture media table."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = f"media-{i:06d}".encode() * (i % 5 + 1)
        rows.append(
            (
                i,
                kind,
                payload,
                (64 + i, 48 + i, 1000 * (i % 7), f"application/x-{kind}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
