"""Multimodal operator plumbing tests (image, audio, video-AVI real; compressed codecs raise)."""

import numpy as np
import pytest

from libspatialindex_spark.operators import multimodal
from libspatialindex_spark.sources import images, png


@pytest.fixture(scope="module")
def imgs(spark):
    return images.generate_images(spark, 60, partitions=3)


def test_image_features(imgs):
    pdf = multimodal.image_features(imgs).toPandas()
    assert len(pdf) == 60
    assert pdf.mean_r.between(0, 255).all()
    assert (pdf.contrast > 0).all()
    # ahash must equal the generator's phash for lossless rows; lossy rows
    # may flip a few threshold-adjacent bits
    src = imgs.select("image_id", "fmt", "phash").toPandas()
    m = pdf.merge(src, on="image_id")
    png_rows = m[m.fmt == "png"]
    assert (png_rows.ahash == png_rows.phash).all()
    jpeg_rows = m[m.fmt == "jpeg"]
    ham = [
        bin((a ^ p) & ((1 << 64) - 1)).count("1")
        for a, p in zip(jpeg_rows.ahash, jpeg_rows.phash)
    ]
    assert max(ham) <= 16


def test_image_resize_roundtrip(imgs):
    small = multimodal.image_resize(imgs, size=8).toPandas()
    assert (small.w == 8).all() and (small.h == 8).all()
    px = png.png_decode(bytes(small.bytes.iloc[0]))
    assert px.shape == (8, 8, 3)
    # captions pass through untouched
    orig = imgs.select("image_id", "caption").toPandas()
    m = small.merge(orig, on="image_id", suffixes=("", "_orig"))
    assert (m.caption == m.caption_orig).all()


def test_audio_stub_raises(spark):
    df = spark.createDataFrame([("c1", b"xx", "mp3")], ["clip_id", "bytes", "codec"])
    out = multimodal.audio_features(df)
    with pytest.raises(Exception, match="NotImplementedError|audio decode"):
        out.collect()


def test_video_frame_sample_fake_container(spark):
    frames = images.pixels_for(np.arange(6), size=8)
    blob = multimodal.fake_video_encode(frames)
    df = spark.createDataFrame(
        [("v1", bytearray(blob), "x-fake")], ["video_id", "bytes", "fmt"]
    )
    out = multimodal.video_frame_sample(df, every=2).toPandas()
    assert list(out.frame_idx) == [0, 2, 4]
    for i, row in out.iterrows():
        px = png.png_decode(bytes(row.bytes))
        assert np.array_equal(px, frames[row.frame_idx])


def test_video_real_codec_stub(spark):
    df = spark.createDataFrame(
        [("v1", b"\x00\x00", "h264")], ["video_id", "bytes", "fmt"]
    )
    with pytest.raises(Exception, match="NotImplementedError|unavailable"):
        multimodal.video_frame_sample(df).collect()


def test_avi_round_trip_bit_exact():
    from libspatialindex_spark.sources import avi

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(5, 17, 23, 3), dtype=np.uint8)
    dec, fps = avi.avi_decode(avi.avi_encode(frames, fps=12))
    assert fps == 12 and dec.shape == frames.shape
    assert (dec == frames).all()


def test_avi_rejects_compressed():
    from libspatialindex_spark.sources import avi

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    data = avi.avi_encode(frames).replace(b"DIB ", b"h264", 1)
    with pytest.raises(NotImplementedError, match="h264"):
        avi.avi_decode(data)
    with pytest.raises(ValueError):
        avi.avi_decode(b"RIFFxxxxWAVE")


def test_video_frame_sample_real_avi(spark):
    """Real-container path: sampled frames decode back to the original
    pixels (AVI and PNG are both lossless)."""
    from libspatialindex_spark.sources import avi

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, size=(7, 12, 12, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("v9", bytearray(avi.avi_encode(frames)), "avi")],
        "video_id string, bytes binary, fmt string",
    )
    out = multimodal.video_frame_sample(df, every=3).collect()
    assert sorted(r.frame_idx for r in out) == [0, 3, 6]
    for r in out:
        assert (png.png_decode(bytes(r.bytes)) == frames[r.frame_idx]).all()


def test_frame_features_match_numpy(spark):
    from libspatialindex_spark.sources import avi

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(4, 10, 10, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("v1", bytearray(avi.avi_encode(frames)), "avi")],
        "video_id string, bytes binary, fmt string",
    )
    feats = multimodal.frame_features(
        multimodal.video_frame_sample(df, every=2)
    ).collect()
    got = {r.frame_idx: (r.mean_val, r.max_val) for r in feats}
    for fi in (0, 2):
        px = frames[fi].astype(np.int64)
        assert got[fi] == (int(px.sum()) / px.size, int(px.max()))


def test_video_clips_table_decodes(spark):
    from conftest import SF_DIR
    from libspatialindex_spark.sources import avi
    from libspatialindex_spark.sources import testdata as td

    for r in td.video_clips(spark, SF_DIR).limit(4).collect():
        frames, fps = avi.avi_decode(bytes(r.bytes))
        want = td.synth_frames(int(r.video_id))
        assert fps == 10 and (frames == want).all()
