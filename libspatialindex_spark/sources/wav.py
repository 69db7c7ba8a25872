"""Minimal pure-Python WAV/PCM audio codec for the audio payload columns.

The container has no librosa/ffmpeg/soundfile, so — mirroring the PNG
approach in ``sources/png.py`` — the audio columns are real ``binary``
payloads produced by this codec:

* **WAV (RIFF/WAVE, PCM 16-bit)** — a real, spec-conformant subset: RIFF
  container, ``fmt `` chunk with AudioFormat=1 (integer PCM), 16-bit
  little-endian samples, any channel count / sample rate.  Lossless:
  ``wav_decode(wav_encode(x, r)) == (x, r)`` bit-exact, and the bytes are
  readable by the stdlib ``wave`` module and any standard audio tool
  (cross-checked in ``tests/test_audio.py``).
* Non-PCM encodings (float WAV, ADPCM, mp3, …) are REJECTED with
  ``NotImplementedError`` — swap in a real codec library on a full
  cluster; the Spark-side plumbing (binary columns, Arrow batches,
  feature schema) is identical.

Also here: ``synth_pcm`` — the deterministic integer-arithmetic clip
generator used for test fixtures and the q57 oracle.  Every sample is a
closed-form function of (clip_id, i) using only int64 ``*``/``+``/``%``,
which Spark, numpy and DuckDB evaluate bit-identically (the same
determinism foundation as the spatial differential oracle), so a DuckDB
``generate_series`` query can reproduce the features EXACTLY while the
engine path exercises the real encode→decode round trip.

The reference repo is spatial-only (no audio surface to cite); this
module serves the build brief's multimodal-column mandate.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"

# synth_pcm constants — mirrored verbatim in the q57 oracle SQL
SYNTH_RATE = 16_000
SYNTH_MUL = 1_103_515_245
SYNTH_IMUL = 12_345
SYNTH_ADD = 6_789
SYNTH_MOD = 2_147_483_648  # 2^31


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 numpy ``(n,)`` or ``(n, channels)`` → WAV bytes (PCM 16-bit,
    little-endian, interleaved)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    assert samples.dtype == np.int16
    block_align = ch * 2
    byte_rate = rate * block_align
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, block_align, 16)
    data = samples.astype("<i2").tobytes()
    body = (
        _WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _RIFF + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ``(int16 (n, channels), rate)``.  Supports the subset
    we emit (integer PCM, 16-bit); anything else raises
    ``NotImplementedError`` loudly rather than mis-decoding."""
    if data[:4] != _RIFF or data[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = ch = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            audio_format, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1:
                raise NotImplementedError(
                    f"WAV AudioFormat {audio_format} (only integer PCM=1 "
                    "supported; float/ADPCM need a codec library)"
                )
            if bits != 16:
                raise NotImplementedError(
                    f"{bits}-bit PCM (only 16-bit supported)"
                )
        elif tag == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(payload, dtype="<i2").astype(np.int16)
    return samples.reshape(-1, ch), int(rate)


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample, per channel.  ``(n, ch) → (m, ch)``
    with ``m = round(n · dst/src)``; endpoints map to endpoints.

    Every arithmetic step is chosen to be bit-replicable in SQL (the q59
    oracle): position ``pos_j = (j·(n−1)) / (m−1)`` (exact integer
    numerator, one IEEE division), interpolant ``s_lo + (s_hi−s_lo)·frac``
    evaluated in that literal order, and rounding via ``floor(v + 0.5)``
    (numpy ``rint``'s half-to-even has no SQL twin)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if src_rate == dst_rate or n <= 1:
        return samples.copy()
    m = max(2, int(math.floor(n * dst_rate / src_rate + 0.5)))
    j = np.arange(m, dtype=np.int64)
    pos = (j * (n - 1)).astype(np.float64) / float(m - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    frac = (pos - lo)[:, None]
    s = samples.astype(np.float64)
    out = s[lo] + (s[hi] - s[lo]) * frac
    return np.clip(np.floor(out + 0.5), -32768, 32767).astype(np.int16)


def synth_n_samples(clip_id: int) -> int:
    """Deterministic per-clip length: 0.05-0.54 s at 16 kHz."""
    return 800 + (clip_id % 50) * 160


def synth_pcm(clip_id: int) -> np.ndarray:
    """Deterministic mono int16 clip — integer arithmetic only, so the
    q57 DuckDB oracle reproduces every sample bit-exactly:

        h(i) = (clip_id*SYNTH_MUL + i*SYNTH_IMUL + SYNTH_ADD) mod 2^31
        s(i) = h(i) mod 65536 - 32768

    (all terms non-negative → ``%`` agrees across numpy/Spark/DuckDB; the
    products stay far below int64 range for any realistic clip_id)."""
    n = synth_n_samples(clip_id)
    i = np.arange(n, dtype=np.int64)
    h = (clip_id * SYNTH_MUL + i * SYNTH_IMUL + SYNTH_ADD) % SYNTH_MOD
    return (h % 65536 - 32768).astype(np.int16)
