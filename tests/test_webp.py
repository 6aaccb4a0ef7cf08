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
    with pytest.raises(ValueError, match="signature"):
        parse_vp8l(b"\x00\x00")
    # VP8X with the animation flag set
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x02]) + b"\x00" * 9
    buf = b"RIFF" + struct.pack("<I", 4 + len(vp8x)) + b"WEBP" + vp8x
    with pytest.raises(NotImplementedError, match="animated"):
        parse_webp(buf)


def test_vp8x_wrapped_vp8l_decodes():
    """Extended container walk: VP8X header + an EXIF metadata chunk
    before the VP8L payload — the `cwebp -metadata` layout."""
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    plain = encode_webp(img)
    vp8l_chunk = plain[12:]                   # VP8L chunk (+pad)
    w, h = 5, 4
    vp8x_body = bytes([0x08]) + b"\x00" * 3 \
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    vp8x = b"VP8X" + struct.pack("<I", len(vp8x_body)) + vp8x_body
    exif = b"EXIF" + struct.pack("<I", 5) + b"exif!" + b"\x00"  # pad
    payload = vp8x + exif + vp8l_chunk
    buf = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" \
        + payload
    W, H, pix = parse_webp(buf)
    assert (W, H) == (5, 4)
    assert np.array_equal(pix, img.reshape(-1))


def test_hand_built_neighbor_map_distance():
    """2x1 image: literal then a backref through the NEIGHBOR MAP —
    dist prefix code 1 decodes to dist_code 2 -> offset (1, 0) ->
    distance 1 (the left pixel), the round-13 honest gate now live."""
    hb = _Hand(2, 1)
    _green_code_with_lengths(hb.w, {10: 1, 256: 1})
    hb.simple([20]); hb.simple([30]); hb.simple([255])
    hb.simple([1])                            # dist prefix code 1 -> 2
    hb.w.write(0, 1)                          # literal
    hb.w.write(1, 1)                          # backref, length 1
    w, h, pix = parse_webp(_wrap(hb.payload()))
    assert np.array_equal(pix.reshape(2, 3), np.tile([20, 10, 30], (2, 1)))


def test_hand_built_vertical_neighbor_distance():
    """2x2 image: three literals then a backref via offset (0, 1) —
    dist prefix code 0 -> dist_code 1 -> distance = width = 2."""
    hb = _Hand(2, 2)
    _green_code_with_lengths(hb.w, {10: 1, 256: 1})
    hb.simple([20]); hb.simple([30]); hb.simple([255])
    hb.simple([0])                            # dist prefix code 0 -> 1
    for _ in range(3):
        hb.w.write(0, 1)                      # literals
    hb.w.write(1, 1)                          # backref, length 1
    w, h, pix = parse_webp(_wrap(hb.payload()))
    assert np.array_equal(pix.reshape(4, 3), np.tile([20, 10, 30], (4, 1)))


def test_color_cache_unwritten_slot_raises():
    """A cache hit before any pixel was inserted is a corrupt stream
    (ADVICE r13: must not silently decode as ARGB 0)."""
    hb = _Hand(1, 1, cache_bits=1)
    _green_code_with_lengths(hb.w, {280: 1, 281: 1}, alphabet=282)
    hb.simple([20]); hb.simple([30]); hb.simple([255])
    hb.simple([0])
    hb.w.write(0, 1)                          # cache slot 0 — unwritten
    with pytest.raises(ValueError, match="unwritten"):
        parse_vp8l(hb.payload())


def test_roundtrip_all_variants():
    """Every encoder variant (transforms, cache+LZ77 neighbor runs,
    meta-Huffman groups) is lossless across content shapes."""
    from lswms_forage_etl_spark.operators.webp import VARIANTS
    rng = np.random.RandomState(17)
    imgs = [
        rng.randint(0, 256, (9, 7, 3), dtype=np.uint8),      # dense
        (rng.randint(0, 3, (6, 11, 3)) * 90).astype(np.uint8),  # runs
        rng.randint(0, 256, (5, 8, 4), dtype=np.uint8),      # RGBA
        np.tile(np.array([[3, 200, 77]], np.uint8), (4, 13, 1)),  # flat
    ]
    for img in imgs:
        for v in VARIANTS:
            for seed in (0, 9):
                w, h, pix = parse_webp(encode_webp(img, variant=v,
                                                   seed=seed))
                assert (w, h) == (img.shape[1], img.shape[0]), (v, seed)
                assert np.array_equal(
                    pix, img[..., :3].reshape(-1)), (v, seed)


def test_all_14_predictor_modes():
    """16x16 at block bits=2 -> 16 blocks; (i*5 + seed) % 14 covers
    all 14 modes within one image — Select / ClampAddSubtract
    included."""
    modes = {(i * 5 + 0) % 14 for i in range(16)}
    assert modes == set(range(14))
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (16, 16, 4), dtype=np.uint8)
    w, h, pix = parse_webp(encode_webp(img, variant="predictor"))
    assert np.array_equal(pix, img[..., :3].reshape(-1))


def test_palette_bundling_all_widths():
    """2/4/16/17-color images hit the 1/2/4/8-bit bundling branches
    (packed widths 3 bits .. none)."""
    rng = np.random.RandomState(5)
    for ncol in (2, 3, 4, 5, 16, 17):
        lut = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.randint(0, ncol, (7, 13))
        idx.reshape(-1)[:ncol] = np.arange(ncol)  # force all colors used
        img = lut[idx]
        w, h, pix = parse_webp(encode_webp(img, variant="palette"))
        assert np.array_equal(pix, img.reshape(-1)), ncol


def test_cache_lz77_emits_backrefs_and_cache_hits():
    """The cache_lz77 variant must actually produce copy and cache
    ops (not degrade to literals) on run-heavy content."""
    from lswms_forage_etl_spark.operators.webp import _build_ops
    img = np.zeros((6, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 7
    img[3, 4] = (1, 2, 3)
    img[5, 6] = (1, 2, 3)                     # re-seen -> cache hit
    al = np.full((6, 8), 255, np.uint8)
    argb = ((al.astype(np.uint64) << 24) | (img[..., 0].astype(np.uint64) << 16)
            | (img[..., 1].astype(np.uint64) << 8)
            | img[..., 2].astype(np.uint64)).reshape(-1)
    ops = _build_ops([int(v) for v in argb], 8, 48, 4, True)
    kinds = {op[0] for op in ops}
    assert kinds == {"lit", "copy", "cache"}
    w, h, pix = parse_webp(encode_webp(img, variant="cache_lz77"))
    assert np.array_equal(pix, img.reshape(-1))


def test_dispatch_reaches_webp():
    from lswms_forage_etl_spark.operators.multimodal import (
        decode_image_bytes)
    img = np.full((2, 3, 3), 9, dtype=np.uint8)
    w, h, pix = decode_image_bytes(encode_webp(img))
    assert (w, h, list(pix[:3])) == (3, 2, [9, 9, 9])
