"""Lossless WebP (VP8L) codec tests (operators/webp.py): twin
round-trips across all code forms, hand-built bitstreams for the
decoder paths the literal-only twin never emits (LZ77 backrefs, color
cache, subtract-green), and the honest gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lswms_forage_etl_spark.operators.webp import (
    _BitWriter,
    encode_webp,
    parse_vp8l,
    parse_webp,
)


def _wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_roundtrip_all_code_forms():
    rng = np.random.RandomState(31)
    cases = [
        rng.randint(0, 256, (9, 7, 3), dtype=np.uint8),   # normal codes
        (rng.randint(0, 2, (5, 11, 3)) * 199).astype(np.uint8),  # simple-2
        np.full((3, 4, 3), 42, dtype=np.uint8),           # simple-1
        rng.randint(0, 256, (12, 13, 4), dtype=np.uint8),  # RGBA
    ]
    for i, img in enumerate(cases):
        w, h, pix = parse_webp(encode_webp(img))
        assert (w, h) == (img.shape[1], img.shape[0])
        assert np.array_equal(pix, img[..., :3].reshape(-1)), i


def test_roundtrip_exact_power_of_two_alphabet():
    """All 256 values used in a channel — the degenerate-CL-code case
    the encoder's 3-length perturbation exists for."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[..., 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img[..., 1] = img[..., 0][::-1]
    img[..., 2] = img[..., 0] ^ 0xA7
    w, h, pix = parse_webp(encode_webp(img))
    assert np.array_equal(pix, img.reshape(-1))


class _Hand:
    """Minimal hand-assembler: header + 1-or-2-symbol simple codes, so
    crafted streams cost 0-1 bits per symbol."""

    def __init__(self, w, h, transforms=(), cache_bits=0):
        self.w = _BitWriter()
        self.w.write(w - 1, 14)
        self.w.write(h - 1, 14)
        self.w.write(0, 1)
        self.w.write(0, 3)
        for t in transforms:
            self.w.write(1, 1)
            self.w.write(t, 2)
        self.w.write(0, 1)                    # end transforms
        if cache_bits:
            self.w.write(1, 1)
            self.w.write(cache_bits, 4)
        else:
            self.w.write(0, 1)
        self.w.write(0, 1)                    # no meta-huffman

    def simple(self, syms):
        self.w.write(1, 1)
        self.w.write(len(syms) - 1, 1)
        self.w.write(1, 1)
        self.w.write(syms[0] & 0xFF, 8)
        if len(syms) == 2:
            self.w.write(syms[1] & 0xFF, 8)

    def payload(self):
        return b"\x2f" + self.w.bytes()


def _green_code_with_lengths(wtr: _BitWriter, lengths: dict[int, int],
                             alphabet: int = 280):
    """Write a normal (code-length-coded) green code whose symbol
    lengths are `lengths` (symbol -> bits); all others 0. CL code is
    hand-balanced over the distinct values present."""
    used_cl = sorted({0} | set(lengths.values()))
    cl_lengths = [0] * 19
    if len(used_cl) == 2:
        for v in used_cl:
            cl_lengths[v] = 1
    elif len(used_cl) == 3:
        cl_lengths[used_cl[0]] = 1
        cl_lengths[used_cl[1]] = 2
        cl_lengths[used_cl[2]] = 2
    else:
        raise AssertionError("hand helper supports <=3 CL symbols")
    from lswms_forage_etl_spark.operators.webp import _canonical_codes
    cl_codes = _canonical_codes(cl_lengths)
    wtr.write(0, 1)                           # normal
    wtr.write(15, 4)                          # all 19 CL lengths
    from lswms_forage_etl_spark.operators.webp import CODE_LENGTH_ORDER
    for i in range(19):
        wtr.write(cl_lengths[CODE_LENGTH_ORDER[i]], 3)
    wtr.write(0, 1)                           # no max_symbol
    for sym in range(alphabet):
        code, n = cl_codes[lengths.get(sym, 0)]
        for i in range(n - 1, -1, -1):
            wtr.write((code >> i) & 1, 1)


def test_hand_built_lz77_and_overlap_copy():
    """4x1 image: literal pixel then three 1-pixel backrefs at direct
    distance 1 — distance prefix code 13 + 5 extra bits (value 24)
    gives dist_code 96 + 24 + 1 = 121 -> distance 1; the overlap copy
    replicates the first pixel across the row."""
    hb = _Hand(4, 1)
    # green: symbols 10 (literal) and 256 (length prefix code 0 ->
    # length 1), both 1-bit; r/b/a simple-1; distance simple-1 {13}
    _green_code_with_lengths(hb.w, {10: 1, 256: 1})
    hb.simple([20]); hb.simple([30]); hb.simple([255])
    hb.simple([13])                           # distance prefix code 13
    hb.w.write(0, 1)                          # literal pixel
    for _ in range(3):
        hb.w.write(1, 1)                      # backref (green code 1)
        hb.w.write(24, 5)                     # extras -> dist_code 121
    w, h, pix = parse_webp(_wrap(hb.payload()))
    assert (w, h) == (4, 1)
    assert np.array_equal(
        pix.reshape(4, 3), np.tile([20, 10, 30], (4, 1)))


def test_hand_built_color_cache():
    """2 pixels: literal then cache hit of the same ARGB — green
    symbol 280 (first cache index alphabet slot) with cache_bits=1."""
    hb = _Hand(2, 1, cache_bits=1)
    argb = (255 << 24) | (20 << 16) | (10 << 8) | 30
    idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> 31
    _green_code_with_lengths(hb.w, {10: 1, 280 + idx: 1},
                             alphabet=280 + 2)
    hb.simple([20]); hb.simple([30]); hb.simple([255])
    hb.simple([0])                            # distance (unused)
    hb.w.write(0, 1)                          # literal
    hb.w.write(1, 1)                          # cache hit
    w, h, pix = parse_webp(_wrap(hb.payload()))
    assert np.array_equal(pix.reshape(2, 3),
                          np.tile([20, 10, 30], (2, 1)))


def test_hand_built_subtract_green():
    hb = _Hand(1, 1, transforms=(2,))         # SUBTRACT_GREEN
    hb.simple([100])                          # green
    hb.simple([10])                           # red (stored r-g)
    hb.simple([250])                          # blue (stored b-g)
    hb.simple([255])
    hb.simple([0])
    w, h, pix = parse_webp(_wrap(hb.payload()))
    # r = (10 + 100) & 255 = 110; b = (250 + 100) & 255 = 94
    assert list(pix) == [110, 100, 94]


def test_gates_raise():
    with pytest.raises(NotImplementedError, match="lossy"):
        parse_webp(b"RIFF\x10\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")
    with pytest.raises(NotImplementedError, match="extended"):
        parse_webp(b"RIFF\x10\x00\x00\x00WEBPVP8X\x00\x00\x00\x00")
    # predictor transform (type 0)
    hb = _Hand(1, 1, transforms=(0,))
    with pytest.raises(NotImplementedError, match="transform"):
        parse_vp8l(hb.payload())
    # meta-huffman
    w = _BitWriter()
    w.write(0, 14); w.write(0, 14); w.write(0, 1); w.write(0, 3)
    w.write(0, 1)                             # no transforms
    w.write(0, 1)                             # no cache
    w.write(1, 1)                             # meta-huffman!
    with pytest.raises(NotImplementedError, match="meta"):
        parse_vp8l(b"\x2f" + w.bytes())
    # neighbor-map distance (<=120): dist code symbol 0 -> value 1
    hb = _Hand(2, 1)
    _green_code_with_lengths(hb.w, {10: 1, 256: 1})
    hb.simple([20]); hb.simple([30]); hb.simple([255])
    hb.simple([0])
    hb.w.write(0, 1)                          # literal
    hb.w.write(1, 1)                          # backref, dist code 1
    with pytest.raises(NotImplementedError, match="neighbor"):
        parse_vp8l(hb.payload())
    with pytest.raises(ValueError, match="signature"):
        parse_vp8l(b"\x00\x00")


def test_dispatch_reaches_webp():
    from lswms_forage_etl_spark.operators.multimodal import (
        decode_image_bytes)
    img = np.full((2, 3, 3), 9, dtype=np.uint8)
    w, h, pix = decode_image_bytes(encode_webp(img))
    assert (w, h, list(pix[:3])) == (3, 2, [9, 9, 9])
