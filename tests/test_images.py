"""Image pipeline tests: codecs, generator determinism, tiling fidelity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.config import EngineConfig
from libspatialindex_spark.operators import tiling
from libspatialindex_spark.sources import images, png


def test_png_roundtrip_lossless():
    px = images.pixels_for(np.arange(5), size=16)
    for p in px:
        assert np.array_equal(png.png_decode(png.png_encode(p)), p)


def test_fake_jpeg_is_lossy_but_high_psnr():
    p = images.pixels_for(np.array([42]), size=32)[0]
    enc = png.fake_jpeg_encode(p, quality=90)
    dec = png.fake_jpeg_decode(enc)
    assert not np.array_equal(dec, p)  # actually lossy
    assert png.psnr(p, dec) >= 40.0
    # low quality must violate the gate — the check is not vacuous
    low = png.fake_jpeg_decode(png.fake_jpeg_encode(p, quality=5))
    assert png.psnr(p, low) < 40.0


def test_generator_deterministic_and_schema(spark):
    df1 = images.generate_images(spark, 200, skewness=2.0, partitions=4)
    df2 = images.generate_images(spark, 200, skewness=2.0, partitions=2)
    a = df1.orderBy("image_id").toPandas()
    b = df2.orderBy("image_id").toPandas()
    assert list(a.image_id) == list(b.image_id)
    assert all(bytes(x) == bytes(y) for x, y in zip(a.bytes, b.bytes))
    assert (a.caption == b.caption).all()
    assert (a.phash == b.phash).all()
    assert a.x.between(0, 1).all() and a.y.between(0, 1).all()
    # skewness piles mass toward y=0 (Generator.cc:70 semantics)
    assert a.y.median() < 0.4


def test_decoded_bytes_match_source_pixels(spark):
    pdf = images.generate_images(spark, 20, partitions=1).toPandas()
    for _, r in pdf.iterrows():
        px = png.decode(bytes(r["bytes"]), r["fmt"])
        src = images.pixels_for(np.array([int(r["image_id"][4:])]))[0]
        if r["fmt"] == "png":
            assert np.array_equal(px, src)
        else:
            assert png.psnr(px, src) >= 40.0
        assert r["phash"] == images.average_hash(src)


@pytest.fixture(scope="module")
def tiled(spark):
    conf = EngineConfig()
    df = images.generate_images(spark, 300, skewness=3.0, partitions=4)
    return conf, df, tiling.assign_tiles(df, conf)


def test_tile_assignment_deterministic_grid(tiled):
    conf, df, t = tiled
    pdf = t.select("image_id", "x", "y", "tile_id").toPandas()
    n = conf.tile_n
    want = (
        np.clip(np.floor(pdf.x * n), 0, n - 1) * n
        + np.clip(np.floor(pdf.y * n), 0, n - 1)
    ).astype(np.int64)
    assert (pdf.tile_id.to_numpy() == want.to_numpy()).all()


def test_reencode_fidelity_and_caption_passthrough(tiled):
    conf, df, t = tiled
    re = tiling.reencode(t, out_fmt=None, quality=90)
    rep = tiling.fidelity_report(t, re, sample=300)
    assert len(rep) == 300
    assert rep.caption_equal.all()
    assert (rep.psnr >= 40.0).all()


def test_reencode_to_png_is_exact_for_png_rows(tiled):
    conf, df, t = tiled
    only_png = t.filter(F.col("fmt") == "png")
    re = tiling.reencode(only_png, out_fmt="png")
    rep = tiling.fidelity_report(only_png, re, sample=100)
    assert (rep.psnr == np.inf).all()


def test_tile_stats_expose_skew(tiled):
    conf, df, t = tiled
    stats = tiling.tile_stats(t).toPandas()
    assert stats.n_rows.sum() == 300
    # skewness=3 → the hottest tile is much hotter than the median
    assert stats.n_rows.max() >= 3 * max(1, int(stats.n_rows.median()))
