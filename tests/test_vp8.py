"""Lossy WebP (VP8 key frame) codec: bool-coder roundtrip properties,
exact constant-MB frame roundtrips (skip MBs, negative residuals,
multi-row with above/left DC prediction), transform unit identities,
and the honest gates."""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lswms_forage_etl_spark.operators import vp8  # noqa: E402


# ----------------------------------------------------------- bool coder


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(1, 254)),
                min_size=1, max_size=500))
def test_bool_coder_roundtrip(seq):
    be = vp8.BoolEncoder()
    for b, p in seq:
        be.bool(b, p)
    bd = vp8.BoolDecoder(be.flush())
    assert [bd.bool(p) for _, p in seq] == [b for b, _ in seq]


def test_tree_and_literal_roundtrip():
    be = vp8.BoolEncoder()
    syms = [0, 1, 2, 3, 0, 3]
    for s in syms:
        be.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, s)
    be.literal(0xAB, 8)
    bd = vp8.BoolDecoder(be.flush())
    assert [bd.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB)
            for _ in syms] == syms
    assert bd.literal(8) == 0xAB


# ----------------------------------------------------------- transforms


def test_iwht_dc_only_identity():
    # only DC = D -> all 16 outputs (D + 3) >> 3
    for d in (0, 8, 64, 1016, -960):
        out = vp8.iwht4x4([d] + [0] * 15)
        assert out == [(d + 3) >> 3] * 16


def test_idct_dc_only_identity():
    for c in (0, 8, 127, -127):
        out = vp8.idct4x4([c] + [0] * 15)
        assert out == [(c + 4) >> 3] * 16


# -------------------------------------------------------- frame decode


def _levels_for(targets, pred0=128):
    levels, pred = [], pred0
    for v in targets:
        levels.append(8 * (v - pred))
        pred = v
    return levels


def test_frame_roundtrip_single_row():
    targets = [150, 150, 100, 190, 70, 70, 64]   # repeats force skips
    frame = vp8.encode_frame(16 * len(targets), 16,
                             _levels_for(targets))
    w, h, Y, U, V = vp8.decode_frame(frame)
    assert (w, h) == (16 * len(targets), 16)
    for i, v in enumerate(targets):
        assert (Y[:, 16 * i:16 * (i + 1)] == v).all()
    assert (U == 128).all() and (V == 128).all()


def test_frame_roundtrip_multi_row():
    """Row 1 exercises the above / above+left DC prediction rules:
    with row 0 all A and row 1 all B, MB(1,0) predicts A (above only)
    and MB(1,j>0) predicts (16A + 16B + 16) >> 5."""
    A, B = 120, 184
    cols = 3
    levels = _levels_for([A] * cols)          # row 0 left-chain
    pred = A                                   # MB(1,0): above only
    for j in range(cols):
        levels.append(8 * (B - pred))
        pred = (16 * A + 16 * B + 16) >> 5     # next MB: above+left
    frame = vp8.encode_frame(16 * cols, 32, levels)
    w, h, Y, U, V = vp8.decode_frame(frame)
    assert (Y[:16] == A).all()
    assert (Y[16:] == B).all()


def test_frame_all_skip():
    frame = vp8.encode_frame(64, 16, [0, 0, 0, 0])
    _, _, Y, U, V = vp8.decode_frame(frame)
    assert (Y == 128).all() and (U == 128).all() and (V == 128).all()


def test_webp_container_roundtrip():
    buf = vp8.encode_webp_vp8(32, 16, _levels_for([100, 200]))
    assert buf[:4] == b"RIFF" and buf[8:16] == b"WEBPVP8 "


# -------------------------------------------------------------- gates


def test_interframe_rejected():
    frame = bytearray(vp8.encode_frame(16, 16, [8]))
    frame[0] |= 1                                # frame_type = inter
    with pytest.raises(NotImplementedError):
        vp8.decode_frame(bytes(frame))


def test_bad_start_code_rejected():
    frame = bytearray(vp8.encode_frame(16, 16, [8]))
    frame[3] = 0x00
    with pytest.raises(ValueError):
        vp8.decode_frame(bytes(frame))


def _header_variant(filter_level=0, n_parts_log2=0, qindex=0):
    """Hand-build a first partition up to the gate under test."""
    be = vp8.BoolEncoder()
    be.literal(0, 1)
    be.literal(0, 1)
    be.bool(0, 128)
    be.literal(0, 1)
    be.literal(filter_level and 1 or 0, 1)
    be.literal(filter_level, 6)
    be.literal(0, 3)
    be.bool(0, 128)
    be.literal(n_parts_log2, 2)
    be.literal(qindex, 7)
    for _ in range(5):
        be.bool(0, 128)
    be.bool(1, 128)
    part1 = be.flush()
    tag = (len(part1) << 5) | (1 << 4) | 0
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    hdr += b"\x9d\x01\x2a" + struct.pack("<HH", 16, 16)
    return hdr + part1


def test_nonzero_filter_level_gated():
    with pytest.raises(NotImplementedError):
        vp8.decode_frame(_header_variant(filter_level=5))


def test_multiple_token_partitions_gated():
    with pytest.raises(NotImplementedError):
        vp8.decode_frame(_header_variant(n_parts_log2=1))


def test_qindex_beyond_table_head_gated():
    with pytest.raises(NotImplementedError):
        vp8.decode_frame(_header_variant(qindex=100))


def test_default_prob_reliance_gated():
    """A stream that does NOT embed the full coefficient-probability
    table (first update flag = 0) must raise, per the swappable-data
    policy."""
    be = vp8.BoolEncoder()
    be.literal(0, 1)
    be.literal(0, 1)
    be.bool(0, 128)
    be.literal(0, 1)
    be.literal(0, 6)
    be.literal(0, 3)
    be.bool(0, 128)
    be.literal(0, 2)
    be.literal(0, 7)
    for _ in range(5):
        be.bool(0, 128)
    be.bool(1, 128)
    for _ in range(vp8.N_PLANES * vp8.N_BANDS * vp8.N_CTX
                   * vp8.N_PROBS):
        be.bool(0, vp8.UNIFORM_PROB)         # no updates at all
    be.bool(0, 128)                          # skip disabled
    part1 = be.flush()
    tag = (len(part1) << 5) | (1 << 4)
    data = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    data += b"\x9d\x01\x2a" + struct.pack("<HH", 16, 16) + part1
    with pytest.raises(NotImplementedError):
        vp8.decode_frame(data)


# -------------------------------------------------------- Spark plumbing


def test_vp8_media_pipeline(spark):
    from lswms_forage_etl_spark.operators.multimodal import (
        synth_vp8_media, vp8_luma_table)
    docs = spark.createDataFrame(
        [(i, "word soup body text here", "en", "s", 24)
         for i in range(12)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = vp8_luma_table(synth_vp8_media(docs)).collect()
    assert len(out) == 12
    for r in out:
        nmb = 4 + r["media_id"] % 5
        assert r["decoded_width"] == 16 * nmb
        assert r["decoded_height"] == 16
        assert r["chroma_ok"] == 1
        bs = b"word soup body text here"[:nmb]
        want = sum(256 * (64 + (b % 127)) for b in bs)
        assert r["sum_luma"] == want
