"""Negative-path robustness: corrupt payloads fail loudly, not silently."""

import numpy as np
import pytest

from libspatialindex_spark.sources import images, png


def test_corrupt_png_crc_raises():
    p = images.pixels_for(np.arange(1))[0]
    blob = bytearray(png.png_encode(p))
    blob[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        png.png_decode(bytes(blob))


def test_not_a_png_raises():
    with pytest.raises(ValueError, match="not a PNG"):
        png.png_decode(b"GIF89a....")
    with pytest.raises(ValueError, match="not a FAKEJPEG"):
        png.fake_jpeg_decode(b"\x89PNG\r\n\x1a\n")


def test_unknown_format_stubbed():
    p = images.pixels_for(np.arange(1))[0]
    with pytest.raises(NotImplementedError, match="PIL"):
        png.encode(p, "webp")
    with pytest.raises(NotImplementedError, match="PIL"):
        png.decode(b"xxxx", "webp")


def test_truncated_fake_jpeg_raises():
    p = images.pixels_for(np.arange(1))[0]
    blob = png.fake_jpeg_encode(p)
    with pytest.raises(Exception):
        png.fake_jpeg_decode(blob[: len(blob) // 2])


def test_cutlist_partitioner_requires_cuts(spark, conf, tmp_path):
    from libspatialindex_spark.operators import index_build
    from libspatialindex_spark.sources import testdata as td
    from tests.conftest import SF_DIR

    with pytest.raises(ValueError, match="cut"):
        index_build.build_index(
            td.rects(spark, SF_DIR), str(tmp_path / "x"), conf,
            partitioner="cutlist",
        )
    with pytest.raises(ValueError):
        index_build.build_index(
            td.rects(spark, SF_DIR), str(tmp_path / "y"), conf,
            partitioner="nonsense",
        )
