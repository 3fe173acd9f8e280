"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The decode step is STUBBED (no image/audio libs in this container): the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partition sizing — is real and tested; `decode_image`/`decode_audio` raise
NotImplementedError unless `fake=True`, in which case a deterministic fake
decoder (seeded by the payload hash) produces stable features.

Scale notes: binary payloads dominate partition size — callers should set
spark.sql.files.maxPartitionBytes so (payload_size × rows_per_partition)
fits executor memory; feature extraction is embarrassingly parallel
(mapInPandas, no shuffle).
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
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("payload", T.BinaryType()),     # opaque bytes
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),      # typed metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HWC uint8. STUB: real decode needs
    Pillow/libjpeg (absent here)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires Pillow/opencv — not in this container; "
            "pass fake=True for the deterministic test decoder"
        )
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """media(MEDIA_SCHEMA) → per-item feature vector via mapInPandas.

    The 'feature extractor' over the fake-decoded pixels is a deterministic
    reduction, so re-runs are byte-identical — same contract as the html→
    text extraction (north rule)."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas, sizes, feats = [], [], []
            for payload in pdf["payload"].values:
                raw = bytes(payload)
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                img = decode_image(raw, fake=fake).astype(np.float64)
                pooled = img.reshape(-1)[: dim * 4].reshape(dim, -1).mean(axis=1)
                feats.append((pooled / 255.0).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "payload_sha256": shas,
                    "payload_bytes": np.asarray(sizes, dtype=np.int64),
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(_feats, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp (the decode
    itself is stubbed). Pure SQL — sequence + explode."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "sample_ms")
    )


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 32), dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                3500 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
