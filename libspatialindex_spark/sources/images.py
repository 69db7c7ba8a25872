"""Synthetic image+caption table — the BASELINE.json ``input_hint`` schema.

    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash bigint, x double, y double)

Deterministic: every column is a pure function of the row id (splitmix64
hashing), so any partition can be regenerated independently — the property
checkpoint-resume relies on.  Generation is distributed via ``mapInPandas``
over ``spark.range(n)`` (Arrow batches, vectorized numpy per batch — no
per-row Python objects in the driver).

The spatial skew knob mirrors the reference generator's ``y^skewness``
(``test/rtree/Generator.cc:61,70``): skewness > 1 piles images near y=0,
producing the hot cells the salted join must handle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from libspatialindex_spark.sources import png as codec

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, x double, y double"
)


def _splitmix64(v: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-id deterministic random source."""
    z = (v.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _unit(v: np.ndarray) -> np.ndarray:
    return (v >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def pixels_for(ids: np.ndarray, size: int = 16) -> np.ndarray:
    """Deterministic (n, size, size, 3) uint8 pixel blocks: a smooth ramp
    (compressible, JPEG-friendly) + id-keyed phase."""
    h1 = _splitmix64(ids.astype(np.uint64))
    yy, xx = np.mgrid[0:size, 0:size]
    base = (xx[None] * 7 + yy[None] * 13).astype(np.int32)
    phase = (h1 % np.uint64(251)).astype(np.int32)[:, None, None]
    r = (base + phase) & 255
    g = (base // 2 + phase * 2) & 255
    b = (255 - base + phase * 3) & 255
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def average_hash(px: np.ndarray) -> int:
    """Deterministic 64-bit perceptual-style hash: 8×8 mean-threshold of the
    grayscale image (classic aHash)."""
    g = px.astype(np.float64).mean(axis=2)
    h, w = g.shape
    blk = g[: h - h % 8, : w - w % 8].reshape(8, h // 8, 8, w // 8).mean(
        axis=(1, 3)
    )
    bits = (blk > blk.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= 1 << 63 else v


def generate_images(
    spark: SparkSession,
    n: int,
    skewness: float = 1.0,
    size: int = 16,
    jpeg_fraction: float = 0.5,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic image table of ``n`` rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            uid = ids.astype(np.uint64)
            hx = _splitmix64(uid * np.uint64(3) + np.uint64(1))
            hy = _splitmix64(uid * np.uint64(3) + np.uint64(2))
            x = _unit(hx)
            # reference skew knob: y = u^skewness (Generator.cc:70)
            y = _unit(hy) ** skewness
            is_jpeg = _unit(_splitmix64(uid + np.uint64(7))) < jpeg_fraction
            px = pixels_for(ids, size)
            out_bytes, phashes, fmts = [], [], []
            for i in range(len(ids)):
                fmt = "jpeg" if is_jpeg[i] else "png"
                out_bytes.append(codec.encode(px[i], fmt, quality=90))
                phashes.append(average_hash(px[i]))
                fmts.append(fmt)
            yield pd.DataFrame(
                {
                    "image_id": [f"img-{i:012d}" for i in ids],
                    "bytes": out_bytes,
                    "w": np.full(len(ids), size, np.int32),
                    "h": np.full(len(ids), size, np.int32),
                    "fmt": fmts,
                    "caption": [
                        f"synthetic scene {i} phase {int(h % np.uint64(251))}"
                        for i, h in zip(ids, _splitmix64(uid))
                    ],
                    "phash": np.array(phashes, np.int64),
                    "x": x,
                    "y": y,
                }
            )

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, SCHEMA)
