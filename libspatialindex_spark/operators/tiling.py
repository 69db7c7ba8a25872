"""Raster↔vector tiling: assign images to grid tiles, re-encode per tile.

North-rule stage: every image row is assigned a deterministic ``tile_id``
(the Morton-grid tile containing its point), then image bytes are
re-encoded per tile batch inside Arrow UDFs.  Invariants (BASELINE.json
``input_hint``):

* decoded-pixel fidelity — exact for lossless PNG, PSNR ≥ 40 dB for the
  lossy path (checked by :func:`fidelity_report`);
* exact ``caption`` pass-through (binary/string columns must survive the
  Arrow round-trip unmodified).

Execution shape: ``tile_id`` is a pure Column expr (codegen).  Re-encode is
``mapInPandas`` — *no shuffle at all*: tile grouping is only needed for
per-tile output files, which ``repartition(tile_id)`` achieves when
requested.  At 10^12 rows the re-encode is embarrassingly parallel and the
only data movement is the optional tile clustering."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libspatialindex_spark.config import EngineConfig
from libspatialindex_spark.functions import curves
from libspatialindex_spark.sources import png as codec


def assign_tiles(
    images: DataFrame, conf: EngineConfig, x: str = "x", y: str = "y"
) -> DataFrame:
    """Add ``tile_id`` — row-major grid cell at ``conf.tile_bits``."""
    return images.withColumn(
        "tile_id", curves.cell_id(F.col(x), F.col(y), conf, bits=conf.tile_bits)
    )


def reencode(
    images: DataFrame,
    out_fmt: str | None = None,
    quality: int = 90,
    level: int = 0,
    cluster_by_tile: bool = False,
) -> DataFrame:
    """Re-encode ``bytes`` (to ``out_fmt``, or each row's own ``fmt``).

    Arrow-batched; decoded pixels are re-encoded with the target codec.
    ``level=0`` (stored-block deflate — spec-valid, lossless) is the hot-path
    default: deflate effort dominated the Python stage 26:1 on small tiles.
    All non-image columns pass through untouched (caption equality is free
    by construction but verified in tests — Arrow round-trip fidelity)."""
    cols = images.columns
    schema = images.schema
    if "tile_id" not in cols:
        raise ValueError("run assign_tiles first")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_bytes, new_fmt = [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                px = codec.decode(bytes(data), fmt)
                tgt = out_fmt or fmt
                new_bytes.append(codec.encode(px, tgt, quality=quality, level=level))
                new_fmt.append(tgt)
            pdf = pdf.copy()
            pdf["bytes"] = new_bytes
            pdf["fmt"] = new_fmt
            yield pdf

    src = images.repartition("tile_id") if cluster_by_tile else images
    return src.mapInPandas(work, schema)


def fidelity_report(
    original: DataFrame, reencoded: DataFrame, sample: int = 256
) -> pd.DataFrame:
    """Join original↔re-encoded on image_id and compute per-row PSNR +
    caption equality (driver-side on a sample — a *check*, not a stage)."""
    a = original.select("image_id", "bytes", "fmt", "caption").limit(sample).toPandas()
    b = (
        reencoded.select(
            F.col("image_id"),
            F.col("bytes").alias("bytes2"),
            F.col("fmt").alias("fmt2"),
            F.col("caption").alias("caption2"),
        )
        .limit(sample * 4)
        .toPandas()
    )
    m = a.merge(b, on="image_id", how="inner")
    rows = []
    for _, r in m.iterrows():
        pa = codec.decode(bytes(r["bytes"]), r["fmt"])
        pb = codec.decode(bytes(r["bytes2"]), r["fmt2"])
        rows.append(
            {
                "image_id": r["image_id"],
                "psnr": codec.psnr(pa, pb),
                "caption_equal": r["caption"] == r["caption2"],
            }
        )
    return pd.DataFrame(rows)


def tile_stats(tiled: DataFrame) -> DataFrame:
    """Per-tile rows/bytes — the tiling stage's skew metrics."""
    return tiled.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("bytes")).alias("n_bytes"),
    )
