"""Minimal pure-Python AVI (RIFF) video codec — uncompressed DIB frames.

Completes the multimodal codec family (``png.py`` images, ``wav.py``
audio): video columns are real ``binary`` payloads in a real, standard
container — RIFF ``AVI `` with an ``hdrl`` header list (``avih`` +
``strl``/``strh``/``strf``), a ``movi`` list of ``00db`` uncompressed
DIB frames (bottom-up, BGR, 4-byte-padded rows, ``BI_RGB``), and an
``idx1`` index.  Any standard media tool opens these bytes; frames
round-trip bit-exactly (uncompressed).

Compressed codecs (H.264/VP9/…) and other containers (mp4/webm) raise
``NotImplementedError`` — swap a real library in on a full cluster; the
Spark-side plumbing is unchanged.

The reference repo is spatial-only; this module serves the build brief's
multimodal-column mandate.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIIF_KEYFRAME = 0x10


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\0" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """RGB (h, w, 3) → bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB→BGR
    row = np.zeros((h, (w * 3 + 3) // 4 * 4), np.uint8)
    row[:, : w * 3] = bgr.reshape(h, w * 3)
    return row.tobytes()


def _dib_to_frame(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data[: stride * h], np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # top-down, BGR→RGB


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """uint8 RGB ``(n, h, w, 3)`` → AVI bytes (uncompressed DIB)."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    dib_size = (w * 3 + 3) // 4 * 4 * h
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, dib_size * fps, 0, 0x10, n, 0, 1, dib_size,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n, dib_size,
            0xFFFFFFFF, 0, 0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, dib_size, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(
            b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)
        ),
    )
    movi_body = b"movi"
    idx_entries = []
    for i in range(n):
        dib = _frame_to_dib(frames[i])
        idx_entries.append(
            b"00db" + struct.pack(
                "<III", _AVIIF_KEYFRAME, len(movi_body) - 4 + 4, len(dib)
            )
        )
        movi_body += _chunk(b"00db", dib)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) over a RIFF chunk range."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield tag, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → ``(uint8 RGB (n, h, w, 3), fps)``.  Supports the
    subset we emit (single uncompressed 24-bit DIB video stream);
    compressed streams raise ``NotImplementedError``."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    fps = 10
    frames: list[np.ndarray] = []

    def visit(pos: int, end: int) -> None:
        nonlocal w, h, fps
        for tag, bstart, blen in _walk(data, pos, end):
            body_end = bstart + blen
            if tag == b"LIST":
                visit(bstart + 4, body_end)
            elif tag == b"strh":
                if data[bstart : bstart + 4] == b"vids":
                    handler = data[bstart + 4 : bstart + 8]
                    if handler not in (b"DIB ", b"\0\0\0\0"):
                        raise NotImplementedError(
                            f"AVI codec {handler!r} (only uncompressed "
                            "DIB supported; real codecs need a library)"
                        )
                    scale, rate = struct.unpack(
                        "<II", data[bstart + 20 : bstart + 28]
                    )
                    if scale:
                        fps = max(1, rate // scale)
            elif tag == b"strf":
                (_sz, bw, bh, _pl, bits, comp) = struct.unpack(
                    "<IiiHHI", data[bstart : bstart + 20]
                )
                if bits != 24 or comp != 0:
                    raise NotImplementedError(
                        f"{bits}-bit/compression={comp} DIB (only 24-bit "
                        "BI_RGB supported)"
                    )
                w, h = bw, abs(bh)
            elif tag in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("AVI frame before strf header")
                frames.append(
                    _dib_to_frame(data[bstart:body_end], w, h)
                )

    visit(12, len(data))
    if not frames:
        raise ValueError("AVI contains no frames")
    return np.stack(frames), fps
