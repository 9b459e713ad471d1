"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training corpus carries image/audio/video spans. The container has
no codec libraries (no PIL/ffmpeg/librosa), so the *decode* step is a
clearly-marked stub (deterministic fake, or NotImplementedError for real
codecs) while everything Spark-side is real and tested: schemas, Arrow batch
shapes, partition sizing for fat binary columns, UDF signatures, and the
downstream feature pipeline.

Modality metadata struct mirrors the media table convention:
    (media_ref, modality, width, height, n_frames, sample_rate, payload)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITY_SCHEMA = (
    "media_ref string, modality string, width int, height int, n_frames int, "
    "sample_rate int, payload binary"
)

FEATURE_SCHEMA = (
    "media_ref string, modality string, feat array<float>, n_items long"
)


def fake_decode(payload: bytes, modality: str, meta: dict) -> np.ndarray:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg/librosa.

    Real deployment swaps this for the codec; the Spark plumbing (batching,
    schema, partitioning) is identical. The fake derives pixels/samples from
    a seeded hash of the payload so tests are reproducible.
    """
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**32)
    rng = np.random.default_rng(seed)
    if modality == "image":
        return rng.integers(0, 256, (meta["height"], meta["width"], 3), dtype=np.uint8)
    if modality == "audio":
        return (rng.standard_normal(meta["sample_rate"]) * 0.1).astype(np.float32)
    if modality == "video":
        return rng.integers(
            0, 256, (meta["n_frames"], meta["height"], meta["width"], 3), dtype=np.uint8
        )
    raise NotImplementedError(f"no decoder for modality {modality!r}")


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (reference uses order-0 zoom for class maps,
    src/eo_core/utils.py:82) — pure index arithmetic, no codec needed."""
    ri = (np.arange(h) * img.shape[0] // h).astype(np.int64)
    ci = (np.arange(w) * img.shape[1] // w).astype(np.int64)
    return img[ri][:, ci]


def resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear resize, center-aligned (src = (dst+0.5)·S/D − 0.5), matching
    the reference's probability-cube upsample (reference:
    src/eo_core/prithvi_adapter.py:426-432, torch interpolate bilinear,
    align_corners=False). Fixed-point integer index/weight arithmetic —
    deterministic across platforms. Accepts (H, W) or (H, W, C); returns
    float64 (callers cast)."""
    H, W = img.shape[:2]

    def axis(n_src: int, n_dst: int):
        i = np.arange(n_dst, dtype=np.int64)
        m = (2 * i + 1) * n_src - n_dst  # src coord = m / (2·n_dst)
        d = 2 * n_dst
        i0 = np.floor_divide(m, d)
        f = m - d * i0  # fractional numerator ∈ [0, d)
        return np.clip(i0, 0, n_src - 1), np.clip(i0 + 1, 0, n_src - 1), f, d

    r0, r1, fy, dy = axis(H, h)
    c0, c1, fx, dx = axis(W, w)
    a = img.astype(np.float64)
    v00, v01 = a[r0][:, c0], a[r0][:, c1]
    v10, v11 = a[r1][:, c0], a[r1][:, c1]
    trail = (1,) * (img.ndim - 2)
    wy1 = (fy / dy).reshape(-1, 1, *trail)
    wx1 = (fx / dx).reshape(1, -1, *trail)
    wy0, wx0 = 1.0 - wy1, 1.0 - wx1
    return wy0 * (wx0 * v00 + wx1 * v01) + wy1 * (wx0 * v10 + wx1 * v11)


def extract_features(media: DataFrame, target_hw: tuple[int, int] = (16, 16), n_sample_frames: int = 4) -> DataFrame:
    """Decode → resize / frame-sample → per-channel mean features.

    One Arrow batch at a time; payloads stay inside the UDF. Partition the
    input so a batch holds ~tens of payloads (see session.ARROW_MAX_RECORDS
    note) — same discipline as the GeoTIFF decode path.
    """
    import pandas as pd

    th, tw = target_hw

    def run(batches):
        for pdf in batches:
            out = {"media_ref": [], "modality": [], "feat": [], "n_items": []}
            for ref, mod, w, h, nf, sr, payload in zip(
                pdf["media_ref"], pdf["modality"], pdf["width"], pdf["height"],
                pdf["n_frames"], pdf["sample_rate"], pdf["payload"],
            ):
                # nullable ints arrive as NaN floats in pandas — coerce safely
                z = lambda v: 0 if pd.isna(v) else int(v)
                meta = {"width": z(w), "height": z(h),
                        "n_frames": z(nf), "sample_rate": z(sr)}
                arr = fake_decode(bytes(payload), mod, meta)
                if mod == "image":
                    small = _resize_nearest(arr, th, tw)
                    feat = small.mean(axis=(0, 1)).astype(np.float32)  # per channel
                    n = 1
                elif mod == "video":
                    idx = (np.arange(n_sample_frames) * arr.shape[0] // n_sample_frames)
                    frames = arr[idx]
                    small = np.stack([_resize_nearest(f, th, tw) for f in frames])
                    feat = small.mean(axis=(0, 1, 2)).astype(np.float32)
                    n = len(idx)
                elif mod == "audio":
                    # fixed-bin energy profile
                    k = 8
                    chunks = arr[: (len(arr) // k) * k].reshape(k, -1)
                    feat = np.sqrt((chunks**2).mean(axis=1)).astype(np.float32)
                    n = len(arr)
                else:
                    raise NotImplementedError(mod)
                out["media_ref"].append(ref)
                out["modality"].append(mod)
                out["feat"].append(feat.tolist())
                out["n_items"].append(n)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def synthetic_multimodal(spark, n: int = 60) -> DataFrame:
    """Deterministic multimodal corpus for tests (payload = seeded bytes)."""
    mods = F.when(F.col("id") % 3 == 0, "image").when(F.col("id") % 3 == 1, "audio").otherwise(
        "video"
    )
    base = spark.range(n).select(
        F.concat(F.lit("mm"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("media_ref"),
        mods.alias("modality"),
        F.when(F.col("id") % 3 != 1, 32).otherwise(None).cast("int").alias("width"),
        F.when(F.col("id") % 3 != 1, 24).otherwise(None).cast("int").alias("height"),
        F.when(F.col("id") % 3 == 2, 12).otherwise(None).cast("int").alias("n_frames"),
        F.when(F.col("id") % 3 == 1, 8000).otherwise(None).cast("int").alias("sample_rate"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias(
            "payload"
        ),
    )
    return base
