"""Audio codec + operator tests (the r4 multimodal de-stub).

Mirrors the PNG test strategy: pure-codec exactness first (round trip,
cross-check against the stdlib ``wave`` module — an independent RIFF
implementation), then the Arrow-batched Spark operators against a
pure-numpy oracle."""

import struct
import wave as stdwave
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.operators import multimodal
from libspatialindex_spark.sources import wav


def _rng(seed):
    return np.random.default_rng(seed)


# ------------------------------------------------------------------ codec --

@pytest.mark.parametrize("channels", [1, 2])
def test_wav_round_trip_bit_exact(channels):
    rng = _rng(7)
    n = 1234
    s = rng.integers(-32768, 32768, size=(n, channels), dtype=np.int16)
    data = wav.wav_encode(s if channels > 1 else s[:, 0], 8000)
    dec, rate = wav.wav_decode(data)
    assert rate == 8000
    assert dec.shape == (n, channels)
    assert (dec == s).all()


def test_wav_readable_by_stdlib_wave():
    """Our encoder's bytes must open in an independent implementation."""
    rng = _rng(11)
    s = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    data = wav.wav_encode(s, 44100)
    with stdwave.open(io.BytesIO(data)) as w:
        assert w.getnchannels() == 2
        assert w.getframerate() == 44100
        assert w.getsampwidth() == 2
        assert w.getnframes() == 500
        raw = w.readframes(500)
    assert np.frombuffer(raw, "<i2").reshape(-1, 2).tolist() == s.tolist()


def test_wav_decodes_stdlib_wave_output():
    """And the decoder must read bytes an independent encoder produced."""
    rng = _rng(13)
    s = rng.integers(-32768, 32768, size=(321, 1), dtype=np.int16)
    buf = io.BytesIO()
    with stdwave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(s.astype("<i2").tobytes())
    dec, rate = wav.wav_decode(buf.getvalue())
    assert rate == 22050
    assert (dec == s).all()


def test_wav_rejects_non_pcm():
    # float WAV (AudioFormat=3) must raise, not mis-decode
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="AudioFormat 3"):
        wav.wav_decode(data)
    with pytest.raises(ValueError):
        wav.wav_decode(b"not audio at all")


def test_resample_linear_ramp_is_exact():
    """Linear interpolation of a linear ramp reproduces the ramp."""
    s = np.linspace(-30000, 30000, 101).astype(np.int16)
    up = wav.resample_linear(s, 8000, 16000)
    assert up.shape[0] == round(101 * 2)
    # endpoints preserved, interior within rounding of the ideal line
    assert up[0, 0] == s[0] and up[-1, 0] == s[-1]
    ideal = np.linspace(s[0], s[-1], up.shape[0])
    assert np.abs(up[:, 0] - ideal).max() <= 1
    # identity when rates match
    same = wav.resample_linear(s, 8000, 8000)
    assert (same[:, 0] == s).all()


def test_synth_pcm_matches_closed_form():
    for cid in (0, 1, 17, 49, 50, 123456):
        s = wav.synth_pcm(cid)
        assert s.shape[0] == wav.synth_n_samples(cid)
        i = 7 % s.shape[0]
        h = (cid * wav.SYNTH_MUL + i * wav.SYNTH_IMUL + wav.SYNTH_ADD) % wav.SYNTH_MOD
        assert s[i] == h % 65536 - 32768


# -------------------------------------------------------------- operators --

@pytest.fixture(scope="module")
def clips(spark):
    rows = []
    for cid in range(12):
        rng = _rng(100 + cid)
        n = 400 + cid * 37
        s = rng.integers(-32768, 32768, size=(n, 1), dtype=np.int16)
        rows.append((cid, bytearray(wav.wav_encode(s, 16000)), "wav", s))
    df = spark.createDataFrame(
        [(c, b, k) for c, b, k, _ in rows],
        "clip_id long, bytes binary, codec string",
    )
    return df, {c: s for c, _, _, s in rows}


def test_audio_features_match_numpy_oracle(spark, clips):
    df, truth = clips
    got = {r.clip_id: r for r in multimodal.audio_features(df).collect()}
    assert set(got) == set(truth)
    for cid, s in truth.items():
        r = got[cid]
        s64 = s.astype(np.int64)
        n = s.shape[0]
        assert r.sample_rate == 16000
        assert r.n_samples == n
        assert r.duration == n / 16000
        assert r.rms == pytest.approx(
            float(np.sqrt((s64 * s64).sum() / n)), abs=0, rel=0
        )
        c0 = s64[:, 0]
        assert r.zcr == ((c0[:-1] < 0) != (c0[1:] < 0)).sum() / (n - 1)
        assert r.peak == int(np.abs(s64).max())


def test_audio_features_reject_compressed_codec(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04fakemp3payload"), "mp3")],
        "clip_id long, bytes binary, codec string",
    )
    with pytest.raises(Exception, match="codec 'mp3'"):
        multimodal.audio_features(df).collect()


def test_audio_resample_operator_round_trip(spark, clips):
    df, truth = clips
    out = {
        r.clip_id: bytes(r.bytes)
        for r in multimodal.audio_resample(df, 8000).collect()
    }
    for cid, s in truth.items():
        dec, rate = wav.wav_decode(out[cid])
        assert rate == 8000
        expect = wav.resample_linear(s, 16000, 8000)
        assert (dec == expect).all()


def test_audio_clips_table_decodes(spark):
    from libspatialindex_spark.sources import testdata as td

    from conftest import SF_DIR

    clips_df = td.audio_clips(spark, SF_DIR).limit(5)
    for r in clips_df.collect():
        dec, rate = wav.wav_decode(bytes(r.bytes))
        assert rate == wav.SYNTH_RATE
        assert (dec[:, 0] == wav.synth_pcm(r.clip_id)).all()
