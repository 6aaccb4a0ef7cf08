"""IMA ADPCM WAV codec tests (operators/multimodal.py, round 13):
round-trip identity with the encoder predictor sequence, multi-block
decode, tracking quality, gates."""

from __future__ import annotations

import numpy as np
import pytest

from lswms_forage_etl_spark.operators.multimodal import (
    _adpcm_nibble_step,
    _parse_wav,
    adpcm_encode_block,
    encode_wav_adpcm,
)


def _predictor_seq(s):
    pred, idx = int(s[0]), 0
    out = [pred]
    for v in s[1:]:
        _, pred, idx = _adpcm_nibble_step(pred, idx, int(v))
        out.append(pred)
    return out


def test_decode_equals_encoder_predictors():
    rng = np.random.RandomState(7)
    for n in (1, 2, 5, 24, 52, 101):
        s = rng.randint(-32768, 32768, n).astype(np.int64)
        sr, ch, bits, nf, out = _parse_wav(encode_wav_adpcm(s, 11025))
        assert (sr, ch, bits, nf) == (11025, 1, 4, n)
        assert list(out) == _predictor_seq(s), n


def test_tracking_quality_on_smooth_signal():
    t = np.arange(400)
    s = (12000 * np.sin(t / 25.0)).astype(np.int64)
    _, _, _, _, out = _parse_wav(encode_wav_adpcm(s, 8000))
    # IMA ADPCM tracks a smooth sine well within ~2% full scale
    assert np.abs(out - s).mean() < 700


def test_multi_block_stream_hand_assembled():
    """Two hand-framed blocks in one data chunk: the walker must reset
    (pred, idx) per block header."""
    import struct
    s1 = np.array([100, 300, -50, 8000], dtype=np.int64)
    s2 = np.array([-20000, -19000, 31000, 2], dtype=np.int64)
    b1, b2 = adpcm_encode_block(s1), adpcm_encode_block(s2)
    assert len(b1) == len(b2)
    data = b1 + b2
    spb, block_align = 4, len(b1)
    fmt = struct.pack("<HHIIHHHH", 17, 1, 8000,
                      8000 * block_align // spb, block_align, 4, 2, spb)
    mid = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"fact" + struct.pack("<II", 4, 8)
           + b"data" + struct.pack("<I", len(data)) + data)
    buf = b"RIFF" + struct.pack("<I", 4 + len(mid)) + b"WAVE" + mid
    _, _, _, nf, out = _parse_wav(buf)
    assert nf == 8
    assert list(out) == _predictor_seq(s1) + _predictor_seq(s2)


def test_gates():
    s = np.arange(10)
    buf = bytearray(encode_wav_adpcm(s, 8000))
    # stereo ADPCM: patch channels to 2 -> honest raise
    i = buf.find(b"fmt ") + 8 + 2
    buf[i:i + 2] = (2).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="ADPCM mono"):
        _parse_wav(bytes(buf))
    with pytest.raises(ValueError):
        encode_wav_adpcm(np.array([40000]), 8000)   # out of int16
