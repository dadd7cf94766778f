"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-aware
``mapInPandas`` decode pipelines, Arrow batch shapes, frame sampling
arithmetic. The actual codec work is stubbed (this container has no
image/audio libraries): ``decode_fn`` defaults to a deterministic fake
decoder, and ``STRICT_DECODE=True`` raises NotImplementedError so
misuse is loud.

Schema contract (one row per asset):

    media(asset_id long, kind string, payload binary,
          meta struct<width int, height int, duration_s double,
                      sample_rate int, codec string>)

At 100 TB, payloads dominate: the pipeline NEVER shuffles payload bytes
— feature extraction runs map-side (mapInPandas), outputs are compact
feature rows, and any join happens on asset_id after extraction.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_s", DoubleType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), False),
    ]
)

STRICT_DECODE = False
FEATURE_DIM = 16


def real_decode(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    """The production decode hook. Container has no codec libs."""
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "environment; inject decode_fn= or use the deterministic fake"
    )


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: FEATURE_DIM moments of the raw bytes.

    Pure numpy over the payload buffer — same vectorization profile as
    a real decoder's post-processing, and reproducible for tests.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] | None = None,
) -> DataFrame:
    """media → per-asset feature rows, map-side only (no payload shuffle)."""
    if decode_fn is None:
        decode_fn = real_decode if STRICT_DECODE else fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                decode_fn(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": [
                        0 if p is None else len(p) for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, fps: float = 1.0, max_frames: int = 32
) -> DataFrame:
    """Video frame-sample plan: one row per (asset, frame_ts). The
    timestamps are computed with built-ins (sequence over duration);
    actual frame extraction is the decode stub's job."""
    dur = F.col("meta.duration_s")
    n = F.least(
        F.greatest(F.floor(dur * F.lit(fps)), F.lit(1)).cast("int"),
        F.lit(max_frames),
    )
    idx = F.sequence(F.lit(0), n - 1)
    return (
        media.where(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.transform(idx, lambda i: i.cast("double") / F.lit(fps))
            ).alias("frame_ts"),
        )
    )


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Image resize arithmetic (short side → target, aspect kept) as
    built-in expressions; the pixel work lives behind the decode stub."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.lit(target) / F.least(w, h)
    return media.where(F.col("kind") == "image").select(
        "asset_id",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("out_width"),
        F.round(h * scale).cast("int").alias("out_height"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048))).astype(
            np.uint8
        ).tobytes()
        k = kinds[i]
        meta = {
            "width": int(rng.integers(64, 4096)) if k == "image" else None,
            "height": int(rng.integers(64, 4096)) if k == "image" else None,
            "duration_s": float(rng.uniform(1, 120)) if k == "video" else None,
            "sample_rate": 16000 if k == "audio" else None,
            "codec": {"image": "png", "audio": "pcm", "video": "h264"}[k],
        }
        rows.append((i, k, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
