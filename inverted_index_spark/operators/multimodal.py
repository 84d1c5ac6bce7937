"""Multimodal column plumbing (task rubric).

Images/audio/video ride as opaque ``binary`` columns with typed
metadata structs; decode/feature steps are Arrow-batched
``mapInPandas`` operators whose *Spark-side shape* (schema,
partitioning, batch signature) is real and tested, while the actual
media decoding is STUBBED — the sandbox has no image/audio libraries.
A deterministic fake decoder stands in so the pipeline is end-to-end
testable; swapping in PIL/ffmpeg later changes one function body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5-seeded feature
    vector. Replace with real decode when media libs are available."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype(np.float32)


def extract_features(
    media: DataFrame, out_dim: int = 64, real_decode: bool = False
) -> DataFrame:
    """media(MEDIA_SCHEMA) → (media_id, kind, feature array<float>).

    Batch shape: one Arrow batch in, one out; payload bytes never leave
    the executor, only the (small) feature vector shuffles onward.
    """
    if real_decode and not HAVE_PIL:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg — not in this container; "
            "run with real_decode=False for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        _fake_decode(bytes(p), out_dim) for p in pdf["payload"]
                    ],
                }
            )

    narrow = media.select("media_id", "kind", "payload")
    return narrow.mapInPandas(run, schema="media_id long, kind string, feature array<float>")


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → (media_id, frame_idx, frame_ts_ms) sampling grid —
    pure column math from metadata (no decode needed to plan work)."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (
                    f"{kind}/x-fake",
                    64 if kind == "image" else 0,
                    64 if kind == "image" else 0,
                    5000 if kind != "image" else 0,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
