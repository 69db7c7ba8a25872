"""Minimal pure-Python image codecs for the image+caption payload.

The container has no PIL/opencv, so per BASELINE.json ``input_hint`` the
image columns are real ``binary`` payloads produced by these codecs:

* **PNG** — a real, spec-conformant subset (8-bit RGB, filter 0,
  zlib-compressed IDAT, CRC-checked chunks).  Lossless: decode(encode(px))
  round-trips exactly.  Any standard viewer opens these bytes.
* **"JPEG"** — the environment has no JPEG library, so this is a
  **clearly-marked deterministic fake lossy codec** (magic ``FAKEJPEG``):
  4:4:4 pixels quantized by a quality-derived step, zlib-packed.  It is
  deterministic and *actually lossy*, so the PSNR ≥ 40 dB fidelity gate is
  exercised for real.  Swap in a real JPEG codec on a cluster with PIL —
  the Spark-side plumbing (binary columns, Arrow batches, PSNR checks) is
  identical.

All functions take/return ``numpy uint8 (h, w, 3)`` arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FAKE_JPEG_MAGIC = b"\xff\xd8FAKEJPEG"  # NOT a real JPEG; see module doc


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(px: np.ndarray, level: int = 6) -> bytes:
    """8-bit RGB numpy (h, w, 3) → PNG bytes (filter 0 scanlines)."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, level)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w, 3).  Supports the subset we emit
    (8-bit RGB, filters 0-1) and validates CRCs."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError("PNG CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = w * 3 + 1
    rows = raw.reshape(-1, stride)
    filters, body = rows[:, 0], rows[:, 1:].copy()
    if (filters > 1).any():
        raise NotImplementedError("only filters 0/1 supported")
    for r in np.nonzero(filters == 1)[0]:  # Sub filter
        line = body[r].reshape(-1, 3).astype(np.int64)
        body[r] = (np.cumsum(line, axis=0) % 256).astype(np.uint8).reshape(-1)
    return body.reshape(-1, w, 3)


def fake_jpeg_encode(px: np.ndarray, quality: int = 90, level: int = 6) -> bytes:
    """Deterministic FAKE lossy codec (see module doc) — quantizes pixels by
    step = max(1, (100-quality)//8 + 1) then zlib-packs.  quality ≥ 80 keeps
    PSNR comfortably above 40 dB; low quality degrades it — the gate is real.
    """
    h, w, c = px.shape
    step = max(1, (100 - quality) // 8 + 1)
    q = (px.astype(np.uint16) // step * step + step // 2).clip(0, 255)
    payload = zlib.compress(q.astype(np.uint8).tobytes(), level)
    return (
        _FAKE_JPEG_MAGIC
        + struct.pack(">HHBB", w, h, c, step)
        + payload
    )


def fake_jpeg_decode(data: bytes) -> np.ndarray:
    if data[: len(_FAKE_JPEG_MAGIC)] != _FAKE_JPEG_MAGIC:
        raise ValueError("not a FAKEJPEG")
    off = len(_FAKE_JPEG_MAGIC)
    w, h, c, _step = struct.unpack(">HHBB", data[off : off + 6])
    raw = zlib.decompress(data[off + 6 :])
    return np.frombuffer(raw, np.uint8).reshape(h, w, c)


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        return fake_jpeg_decode(data)
    raise NotImplementedError(f"format {fmt!r} (real decoders need PIL)")


def encode(px: np.ndarray, fmt: str, quality: int = 90, level: int = 6) -> bytes:
    """``level`` is the deflate effort (0 = stored blocks — still spec-valid
    PNG/zlib, ~26x faster on small tiles; 6 = default compression)."""
    if fmt == "png":
        return png_encode(px, level)
    if fmt == "jpeg":
        return fake_jpeg_encode(px, quality, level)
    raise NotImplementedError(f"format {fmt!r} (real encoders need PIL)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
