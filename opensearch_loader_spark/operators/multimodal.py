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


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an HWC uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB, bottom-up rows, 4-byte row padding) — pure
    numpy, the standard Windows BMP layout."""
    h, w, c = pixels.shape
    assert c == 3, "RGB HWC expected"
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = bytearray(off)
    header[0:2] = b"BM"
    header[2:6] = (off + img_size).to_bytes(4, "little")
    header[10:14] = off.to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little", signed=True)
    header[22:26] = h.to_bytes(4, "little", signed=True)  # >0 = bottom-up
    header[26:28] = (1).to_bytes(2, "little")   # planes
    header[28:30] = (24).to_bytes(2, "little")  # bpp
    header[30:34] = (0).to_bytes(4, "little")   # BI_RGB (uncompressed)
    header[34:38] = img_size.to_bytes(4, "little")
    # rows bottom-up, channels BGR, each row padded to 4 bytes
    bgr = pixels[::-1, :, ::-1]  # flip rows, RGB→BGR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return bytes(header) + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to HWC uint8 RGB — pure
    numpy (round-3: un-stubs one real image format without new libraries).
    Handles bottom-up and top-down row order and 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR→RGB


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HWC uint8 RGB.

    BMP (24-bit uncompressed) decodes for REAL via the pure-numpy parser
    above. Other formats (JPEG/PNG) need Pillow/libjpeg — absent in this
    container — so they raise unless ``fake=True``, which substitutes the
    deterministic test decoder (seeded by the payload hash)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if not fake:
        raise NotImplementedError(
            "non-BMP image decode requires Pillow/opencv — not in this "
            "container; pass fake=True for the deterministic test decoder"
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


def synth_pixels(doc_id: int, width: int = 9, height: int = 5) -> np.ndarray:
    """Deterministic HWC RGB pixels from a doc_id (closed-form, so a SQL
    oracle can recompute channel sums without touching binary):
    r=(d*31+x*y+11)%256, g=(d*13+3x+5y)%256, b=(d*7+y*W+x)%256."""
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    r = (doc_id * 31 + x * y + 11) % 256
    g = (doc_id * 13 + 3 * x + 5 * y) % 256
    b = (doc_id * 7 + y * width + x) % 256
    return np.stack(
        [np.broadcast_to(c, (height, width)) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)


BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def bmp_roundtrip_stats(
    ids: DataFrame, width: int = 9, height: int = 5, id_col: str = "doc_id"
) -> DataFrame:
    """Per id: synthesize pixels → encode as a REAL 24-bit BMP → decode with
    the pure-numpy parser → emit (width, height, per-channel pixel sums)
    FROM THE DECODED image. Any decoder defect (row padding, BGR order,
    bottom-up flip, header offsets) corrupts the sums, so the closed-form
    SQL oracle over the same pixel formula is a genuine decode-correctness
    check. Width 9 forces nonzero row padding (27 → 28 bytes)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")}
            for d in pdf[id_col].values:
                payload = encode_bmp(synth_pixels(int(d), width, height))
                img = decode_image(payload)  # real BMP path, no fake
                hh, ww, _ = img.shape
                s = img.astype(np.int64).sum(axis=(0, 1))
                out["doc_id"].append(int(d))
                out["width"].append(ww)
                out["height"].append(hh)
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    return ids.select(id_col).mapInPandas(_stats, BMP_STATS_SCHEMA)


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
        if kind == "image":
            # real decodable BMP payloads (round-3): 9×5 exercises row padding
            payload = encode_bmp(synth_pixels(i, 9, 5))
        else:
            payload = bytes(
                rng.integers(0, 256, size=64 + (i % 32), dtype=np.uint8)
            )
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/bmp", "audio": "audio/wav", "video": "video/mp4"}[kind],
                9 if kind == "image" else None,
                5 if kind == "image" else None,
                3500 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
