"""Round 11: REAL stdlib WAV decoder — audio joins PNG as a decoded
modality (multimodal.py). The independent reference is the stdlib
``wave`` module: files it writes must decode identically through our
RIFF parser, and files our encoder writes must read back bit-for-bit
through ``wave``. Feature math is cross-checked against numpy on the
same samples."""

import io
import math
import struct
import wave

import numpy as np
import pytest

from mdataframe_spark.operators.multimodal import (
    _wav_features,
    decode_features,
    decode_wav,
    encode_wav,
)


def _stdlib_wav(sample_rate, channels, sampwidth, frames):
    """Write a WAV with the stdlib wave module (the independent
    encoder)."""
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(sampwidth)
    w.setframerate(sample_rate)
    body = bytearray()
    for fr in frames:
        vals = fr if isinstance(fr, (tuple, list)) else (fr,)
        for v in vals:
            if sampwidth == 1:
                body += struct.pack("<B", v & 0xFF)
            else:
                body += int(v).to_bytes(sampwidth, "little", signed=True)
    w.writeframes(bytes(body))
    w.close()
    return buf.getvalue()


def _sine_frames(n, channels, amp, rate):
    out = []
    for i in range(n):
        out.append(
            tuple(
                int(amp * math.sin(2 * math.pi * (c + 1) * 440 * i / rate))
                for c in range(channels)
            )
        )
    return out


# --- decode stdlib-written files -------------------------------------

@pytest.mark.parametrize("sampwidth,channels", [(1, 1), (2, 1), (2, 2), (4, 2), (3, 1)])
def test_decode_stdlib_written_wav(sampwidth, channels):
    rate = 8000
    amp = {1: 100, 2: 30000, 3: 8_000_000, 4: 2_000_000_000}[sampwidth]
    if sampwidth == 1:
        frames = [
            tuple(128 + int(100 * math.sin(i / 7.0)) for _ in range(channels))
            for i in range(500)
        ]
    else:
        frames = _sine_frames(500, channels, amp, rate)
    payload = _stdlib_wav(rate, channels, sampwidth, frames)
    got = decode_wav(payload)
    assert got["channels"] == channels
    assert got["sample_rate"] == rate
    assert got["sampwidth"] == sampwidth
    assert got["n_frames"] == 500
    assert got["duration_s"] == pytest.approx(500 / rate)
    # sample-exact: compare against the frames we fed in (8-bit is
    # re-biased to signed by the decoder's documented convention)
    for c in range(channels):
        want = [
            (fr[c] - 128) if sampwidth == 1 else fr[c] for fr in frames
        ]
        assert got["samples"][c] == want


# --- our encoder reads back through stdlib wave ----------------------

@pytest.mark.parametrize("sampwidth,channels", [(1, 2), (2, 2), (3, 2), (4, 1)])
def test_encode_wav_readable_by_stdlib(sampwidth, channels):
    rate = 16000
    amp = {1: 90, 2: 20000, 3: 4_000_000, 4: 1_000_000_000}[sampwidth]
    if sampwidth == 1:
        frames = [
            tuple((128 + 3 * i + c) % 256 for c in range(channels))
            for i in range(64)
        ]
    else:
        frames = _sine_frames(64, channels, amp, rate)
    payload = encode_wav(rate, channels, frames, sampwidth=sampwidth)
    r = wave.open(io.BytesIO(payload), "rb")
    assert r.getnchannels() == channels
    assert r.getsampwidth() == sampwidth
    assert r.getframerate() == rate
    assert r.getnframes() == 64
    body = r.readframes(64)
    # byte-exact roundtrip of the PCM data
    want = bytearray()
    for fr in frames:
        for v in fr:
            if sampwidth == 1:
                want += struct.pack("<B", v & 0xFF)
            else:
                want += int(v).to_bytes(sampwidth, "little", signed=True)
    assert body == bytes(want)
    # and our own decoder agrees with itself
    assert decode_wav(payload)["n_frames"] == 64


# --- feature math vs numpy -------------------------------------------

def test_wav_features_match_numpy():
    rate = 8000
    frames = _sine_frames(1000, 2, 25000, rate)
    payload = encode_wav(rate, 2, frames, sampwidth=2)
    feats = _wav_features(payload, dim=8)
    m = np.array(frames, dtype=np.int64)
    flat = m.reshape(-1)
    fs = 32768.0
    assert feats[0] == rate
    assert feats[1] == 2.0
    assert feats[2] == 1000.0
    assert feats[3] == pytest.approx(1000 / rate)
    assert feats[4] == pytest.approx(flat.mean() / fs, abs=1e-9)
    assert feats[5] == pytest.approx(
        math.sqrt((flat.astype(float) ** 2).mean()) / fs, abs=1e-9
    )
    assert feats[6] == pytest.approx(np.abs(flat).max() / fs, abs=1e-9)
    # per-channel crossings averaged across channels (round-12: the
    # interleaved-stream definition was a channel-phase artifact)
    zc = ((m[:-1] < 0) != (m[1:] < 0)).sum()
    assert feats[7] == pytest.approx(zc / (2 * (m.shape[0] - 1)), abs=1e-9)


def test_wav_features_silence_and_empty():
    silent = encode_wav(8000, 1, [0] * 100, sampwidth=2)
    f = _wav_features(silent, dim=8)
    assert f[4] == 0.0 and f[5] == 0.0 and f[6] == 0.0 and f[7] == 0.0
    empty = encode_wav(8000, 1, [], sampwidth=2)
    f2 = _wav_features(empty, dim=8)
    assert f2[2] == 0.0 and f2[5] == 0.0


# --- dispatch & graceful degradation ----------------------------------

def test_dispatch_decodes_wav_and_degrades_corrupt():
    rate = 8000
    payload = encode_wav(rate, 1, _sine_frames(200, 1, 10000, rate))
    feats = decode_features(payload, dim=8)
    assert feats[0] == rate and feats[2] == 200.0

    # float-PCM format tag (3) is honestly unsupported -> ValueError
    # from decode_wav, byte-sum fallback from the dispatch
    broken = bytearray(payload)
    fmt_at = payload.index(b"fmt ") + 8
    broken[fmt_at : fmt_at + 2] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(broken))
    fallback = decode_features(bytes(broken), dim=8)
    assert fallback is not None and len(fallback) == 8
    assert fallback != feats

    # truncated data chunk -> ValueError, fallback
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(payload[:-11])
    assert decode_features(payload[:-11], dim=8) is not None


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(b"RIFF\x04\x00\x00\x00AVI ")


# --- end-to-end through the Arrow batch decode ------------------------

def test_extract_features_decodes_wav_batches(spark):
    from mdataframe_spark.operators.multimodal import extract_features

    rows = []
    for i in range(12):
        rate = 8000 * (1 + i % 2)
        payload = encode_wav(
            rate, 1, _sine_frames(100 + i, 1, 5000 + 100 * i, rate)
        )
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_features(df, dim=8).collect()}
    assert len(got) == 12
    for i in range(12):
        feats = got[i]["feature"]
        assert feats[0] == 8000.0 * (1 + i % 2)
        assert feats[2] == 100.0 + i
        assert got[i]["n_bytes"] == len(rows[i][1])
