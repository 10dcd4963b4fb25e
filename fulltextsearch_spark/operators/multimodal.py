"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, batch shapes, partition-aware
mapInPandas decode) is real and tested. The image decode kernel is
import-guarded: environments with Pillow get a real PIL decode
(grayscale resize → normalized feature vector, per-payload failure
isolation); this container has no media libraries, so the default
`decoder="auto"` falls back to a deterministic md5-seeded stub —
signature and batching identical either way. Audio/video decode would
follow the same pattern with ffmpeg.
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

    Used when PIL is absent (this container) or ``decoder="stub"`` —
    keeps the batching/scheduling path testable without media libs.
    """
    digest = hashlib.md5(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _decode_image_pil(payload: bytes, dim: int = 16) -> np.ndarray:
    """Real decode: PIL open → grayscale → resize to a dim×1 strip →
    normalized float vector. Import happens in the caller so absence
    degrades to the stub instead of failing the executor."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        gray = im.convert("L").resize((dim, 1))
        return (np.asarray(gray, dtype=np.float32).reshape(dim)) / 255.0


def _resolve_decoder(decoder: str):
    """-> (decode_fn, is_real). "auto" probes for PIL once per executor
    process; "pil" requires it; "stub" forces the deterministic fake."""
    if decoder == "stub":
        return _decode_image_stub, False
    try:
        import PIL  # noqa: F401

        return _decode_image_pil, True
    except ImportError:
        if decoder == "pil":
            raise ImportError(
                "decoder='pil' requested but Pillow is not installed in "
                "this environment — install Pillow or use decoder='auto' "
                "(falls back to the deterministic stub)"
            )
        return _decode_image_stub, False


def extract_features(
    media: DataFrame, dim: int = 16, decoder: str = "auto"
) -> DataFrame:
    """Binary payloads → feature vectors via Arrow-batched mapInPandas.

    ``decoder``: "auto" uses PIL when importable on the executor and
    the deterministic stub otherwise; "pil" requires PIL (clear error
    if missing); "stub" forces the fake. With a real decoder, payloads
    that fail to decode yield a zero vector with ``decode_ok=False``
    instead of crashing the task — at 100 TB some inputs ARE corrupt.

    Batch shape: one pandas DataFrame per Arrow batch; payloads stay
    bytes end-to-end (no base64 round trips).
    """
    if decoder not in ("auto", "pil", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil":
        _resolve_decoder("pil")  # fail fast on the driver, not per-task

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode, is_real = _resolve_decoder(decoder)
        for pdf in batches:
            feats, oks = [], []
            for p in pdf["payload"]:
                try:
                    feats.append(decode(bytes(p), dim).tolist())
                    oks.append(True)
                except Exception:
                    if not is_real:
                        raise  # the stub never fails; surface real bugs
                    feats.append([0.0] * dim)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": oks,
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
