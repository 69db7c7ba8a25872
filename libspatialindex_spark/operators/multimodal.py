"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning, UDF
signatures — is real and tested.  Heavy media codecs are not in this
container, so per the build brief:

* **image**: REAL — the pure-Python PNG/fake-JPEG codecs
  (``sources/png.py``) back decode/resize/feature extraction;
* **audio**: REAL — the pure-Python WAV/PCM codec (``sources/wav.py``)
  backs decode/features/resample; compressed codecs (mp3/flac/…) raise
  ``NotImplementedError`` behind the same batch interface;
* **video**: REAL container, uncompressed frames — the pure-Python
  RIFF/AVI DIB codec (``sources/avi.py``) backs frame sampling and
  per-frame features; compressed codecs (H.264/…) and other containers
  (mp4/webm) raise ``NotImplementedError``.  The deterministic
  ``video/x-fake`` container remains as a second test path.

All operators are ``mapInPandas`` stages: Arrow-batched, no per-row Python
round trips through the JVM, schema declared up front so Catalyst can
prune/plan around them.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from libspatialindex_spark.sources import png as codec

FEATURE_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "contrast double, ahash long"
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode → per-channel means, contrast, average-hash.  Input needs
    (image_id, bytes, fmt)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from libspatialindex_spark.sources.images import average_hash

        for pdf in batches:
            out = {k: [] for k in
                   ("image_id", "mean_r", "mean_g", "mean_b", "contrast", "ahash")}
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = codec.decode(bytes(data), fmt).astype(np.float64)
                out["image_id"].append(iid)
                out["mean_r"].append(px[..., 0].mean())
                out["mean_g"].append(px[..., 1].mean())
                out["mean_b"].append(px[..., 2].mean())
                out["contrast"].append(px.std())
                out["ahash"].append(average_hash(px.astype(np.uint8)))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        work, FEATURE_SCHEMA
    )


def image_resize(images: DataFrame, size: int = 8) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode PNG.  Schema preserved
    except (bytes, w, h, fmt)."""
    schema = images.schema

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nb, nw, nh, nf = [], [], [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                px = codec.decode(bytes(data), fmt)
                h, w, _ = px.shape
                yi = (np.arange(size) * h // size).clip(0, h - 1)
                xi = (np.arange(size) * w // size).clip(0, w - 1)
                small = px[yi][:, xi]
                nb.append(codec.png_encode(small))
                nw.append(size)
                nh.append(size)
                nf.append("png")
            pdf = pdf.copy()
            pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"] = nb, nw, nh, nf
            yield pdf

    return images.mapInPandas(work, schema)


AUDIO_FEATURE_SCHEMA = (
    "clip_id long, sample_rate int, n_samples long, duration double, "
    "rms double, zcr double, peak long"
)


def audio_features(audio: DataFrame) -> DataFrame:
    """REAL audio decode + features (r4 de-stub): WAV/PCM payloads are
    decoded by the pure-Python codec (``sources/wav.py``) and reduced to

    * ``duration`` — seconds (= n_samples / sample_rate),
    * ``rms`` — sqrt(mean(sample²)) over all samples & channels
      (the integer sum of squares is exact in int64, so the double result
      is bit-deterministic — oracle-comparable),
    * ``zcr`` — zero-crossing rate of channel 0: fraction of adjacent
      pairs whose sign bit differs (denominator n−1),
    * ``peak`` — max |sample|.

    Input needs (clip_id, bytes, codec); ``codec`` must be ``"wav"`` —
    compressed codecs raise ``NotImplementedError`` (no mp3/flac library
    in this container; the Arrow-batched operator shape is the contract
    to keep when swapping one in)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from libspatialindex_spark.sources import wav as wavcodec

        for pdf in batches:
            out = {k: [] for k in (
                "clip_id", "sample_rate", "n_samples", "duration",
                "rms", "zcr", "peak",
            )}
            for cid, data, codec_name in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"]
            ):
                if codec_name != "wav":
                    raise NotImplementedError(
                        f"audio codec {codec_name!r} requires a codec "
                        "library not in this container (only 'wav' PCM "
                        "is decoded natively)"
                    )
                samples, rate = wavcodec.wav_decode(bytes(data))
                n = samples.shape[0]
                s64 = samples.astype(np.int64)
                sum_sq = int((s64 * s64).sum())
                c0 = s64[:, 0]
                flips = int(((c0[:-1] < 0) != (c0[1:] < 0)).sum()) if n > 1 else 0
                out["clip_id"].append(int(cid))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration"].append(n / rate)
                out["rms"].append(
                    float(np.sqrt(float(sum_sq) / (n * samples.shape[1])))
                    if n else 0.0
                )
                out["zcr"].append(flips / (n - 1) if n > 1 else 0.0)
                out["peak"].append(int(np.abs(s64).max()) if n else 0)
            yield pd.DataFrame(out)

    return audio.select("clip_id", "bytes", "codec").mapInPandas(
        work, AUDIO_FEATURE_SCHEMA
    )


def audio_resample(audio: DataFrame, dst_rate: int) -> DataFrame:
    """Decode → linear-interpolation resample → re-encode WAV.  Schema
    preserved except the payload bytes (and their embedded sample rate).
    Same rejection rule as :func:`audio_features` for non-WAV codecs."""
    schema = audio.schema

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from libspatialindex_spark.sources import wav as wavcodec

        for pdf in batches:
            blobs = []
            for data, codec_name in zip(pdf["bytes"], pdf["codec"]):
                if codec_name != "wav":
                    raise NotImplementedError(
                        f"audio codec {codec_name!r} not decodable here"
                    )
                samples, rate = wavcodec.wav_decode(bytes(data))
                res = wavcodec.resample_linear(samples, rate, dst_rate)
                blobs.append(wavcodec.wav_encode(res, dst_rate))
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            yield pdf

    return audio.mapInPandas(work, schema)


_FAKE_VIDEO_MAGIC = b"FAKEVID0"


def fake_video_encode(frames: np.ndarray) -> bytes:
    """Deterministic fake video container: concatenated PNG frames with an
    index — exists so frame-sampling plumbing is testable without ffmpeg."""
    import struct

    blobs = [codec.png_encode(f) for f in frames]
    head = struct.pack(">I", len(blobs)) + b"".join(
        struct.pack(">I", len(b)) for b in blobs
    )
    return _FAKE_VIDEO_MAGIC + head + b"".join(blobs)


def video_frame_sample(video: DataFrame, every: int = 2) -> DataFrame:
    """Sample every ``every``-th frame → one row per sampled frame with
    the frame re-encoded as PNG.

    Two REAL container paths: ``fmt="avi"`` decodes the standard RIFF/AVI
    uncompressed-DIB subset (``sources/avi.py`` — r5 de-stub), and
    ``fmt="x-fake"`` decodes the deterministic test container.
    Compressed codecs / other containers raise ``NotImplementedError``
    (no H.264/mp4 library here; the Arrow-batched operator shape is the
    contract to keep when swapping one in)."""
    import struct

    out_schema = "video_id string, frame_idx int, bytes binary"

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from libspatialindex_spark.sources import avi as avicodec

        for pdf in batches:
            vids, idxs, blobs = [], [], []
            for vid, data, fmt in zip(pdf["video_id"], pdf["bytes"], pdf["fmt"]):
                raw = bytes(data)
                if fmt == "avi":
                    frames, _fps = avicodec.avi_decode(raw)
                    for i in range(0, frames.shape[0], every):
                        vids.append(vid)
                        idxs.append(i)
                        blobs.append(codec.png_encode(frames[i]))
                    continue
                if fmt != "x-fake" or raw[:8] != _FAKE_VIDEO_MAGIC:
                    raise NotImplementedError(
                        f"video container {fmt!r} requires a codec library "
                        "not in this container (supported: 'avi' "
                        "uncompressed DIB, 'x-fake')"
                    )
                (n,) = struct.unpack(">I", raw[8:12])
                lens = [
                    struct.unpack(">I", raw[12 + 4 * i : 16 + 4 * i])[0]
                    for i in range(n)
                ]
                off = 12 + 4 * n
                for i in range(0, n, every):
                    start = off + sum(lens[:i])
                    vids.append(vid)
                    idxs.append(i)
                    blobs.append(raw[start : start + lens[i]])
            yield pd.DataFrame(
                {"video_id": vids,
                 "frame_idx": np.array(idxs, np.int32),
                 "bytes": blobs}
            )

    return video.select("video_id", "bytes", "fmt").mapInPandas(
        work, out_schema
    )


def frame_features(frames: DataFrame) -> DataFrame:
    """Per-sampled-frame features over PNG frame rows (the
    :func:`video_frame_sample` output): mean intensity (exact — integer
    pixel sum over a fixed count, one IEEE division) and max channel
    value.  Arrow-batched like every media stage."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "mean_val": [],
                   "max_val": []}
            for vid, fi, data in zip(
                pdf["video_id"], pdf["frame_idx"], pdf["bytes"]
            ):
                px = codec.png_decode(bytes(data)).astype(np.int64)
                out["video_id"].append(vid)
                out["frame_idx"].append(int(fi))
                out["mean_val"].append(float(int(px.sum()) / px.size))
                out["max_val"].append(int(px.max()))
            yield pd.DataFrame(out)

    return frames.select("video_id", "frame_idx", "bytes").mapInPandas(
        work,
        "video_id string, frame_idx int, mean_val double, max_val long",
    )
