"""GIF codec tests (operators/gif.py): lossless round-trips through
the REAL variable-width LZW (width growth, KwKwK, 4096-entry table
reset), interlacing, extension skipping, an external known-bytes
fixture, and the honest dispatch gates."""

from __future__ import annotations

import base64

import numpy as np
import pytest

from lswms_forage_etl_spark.operators.gif import (
    encode_gif,
    encode_gif_frames,
    lzw_decode,
    lzw_encode,
    parse_gif,
    parse_gif_frames,
    synth_palette,
)

PAL = synth_palette()


def _rt(ix: np.ndarray, interlaced: bool = False) -> None:
    w, h, pix = parse_gif(encode_gif(ix, interlaced=interlaced))
    assert (w, h) == (ix.shape[1], ix.shape[0])
    expect = PAL[ix.reshape(-1)].reshape(-1)
    assert np.array_equal(pix, expect)


def test_roundtrip_small():
    rng = np.random.RandomState(7)
    _rt(rng.randint(0, 256, (3, 5)).astype(np.uint8))
    _rt(np.zeros((1, 1), dtype=np.uint8))
    _rt(np.arange(256, dtype=np.uint8).reshape(16, 16))


def test_roundtrip_kwkwk():
    # constant rasters drive the cScSc decode path (code == next slot)
    _rt(np.full((9, 11), 65, dtype=np.uint8))
    _rt(np.tile(np.array([65, 65, 66], dtype=np.uint8), 40).reshape(8, 15))


def test_roundtrip_width_growth_and_table_reset():
    rng = np.random.RandomState(42)
    # ~30k high-entropy bytes add >4096 table entries: the code width
    # walks 9 -> 12 and the encoder must CLEAR-reset mid-stream
    big = rng.randint(0, 256, (60, 500)).astype(np.uint8)
    _rt(big)
    _rt(big, interlaced=True)


def test_roundtrip_interlaced():
    rng = np.random.RandomState(3)
    for h in (1, 2, 4, 7, 8, 9):          # every interlace-pass subset
        _rt(rng.randint(0, 256, (h, 6)).astype(np.uint8),
            interlaced=True)


def test_lzw_stream_starts_with_clear_at_width9():
    stream = lzw_encode(b"abc", 8)
    first = stream[0] | (stream[1] << 8)
    assert first & 0x1FF == 256            # CLEAR, 9 LSB-first bits


def test_lzw_raw_roundtrip_with_reset():
    rng = np.random.RandomState(1)
    data = bytes(rng.randint(0, 256, 30000).astype(np.uint8).tobytes())
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_external_fixture_1x1_transparent_gif():
    # the canonical 1x1 transparent GIF (2-entry global table, GCE
    # extension, LZW min code size 2, pixel-count termination)
    buf = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    w, h, pix = parse_gif(buf)
    assert (w, h) == (1, 1)
    assert pix.tolist() == [0, 0, 0]


def test_animated_gif_raises():
    ix = np.zeros((2, 2), dtype=np.uint8)
    buf = bytearray(encode_gif(ix))
    # splice a second image descriptor chain before the trailer
    body = bytes(buf[:-1]) + bytes(buf[13 + 768:])
    with pytest.raises(NotImplementedError, match="animated"):
        parse_gif(body)


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        parse_gif(b"NOTGIF" + b"\x00" * 20)


def test_animated_frames_roundtrip():
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (3, 7)).astype(np.uint8)
              for _ in range(4)]
    for interlaced in (False, True):
        got = parse_gif_frames(encode_gif_frames(frames,
                                                 interlaced=interlaced))
        assert [d for d, _, _, _ in got] == [4, 5, 6, 7]   # GCE delays
        for (d, w, h, pix), ix in zip(got, frames):
            assert (w, h) == (7, 3)
            assert np.array_equal(pix, PAL[ix.reshape(-1)].reshape(-1))


def test_frames_parser_reads_single_image_gif():
    ix = np.arange(20, dtype=np.uint8).reshape(4, 5)
    got = parse_gif_frames(encode_gif(ix))
    assert len(got) == 1 and got[0][0] == 0        # no GCE -> delay 0
    assert np.array_equal(got[0][3], PAL[ix.reshape(-1)].reshape(-1))


def test_frames_out_of_bounds_rect_rejected():
    # round 12: sub-rectangles COMPOSITE now; a rect that leaves the
    # logical screen (left=1 on a screen-wide image) is a hard error
    buf = bytearray(encode_gif(np.zeros((2, 3), dtype=np.uint8)))
    idesc = 6 + 7 + 768          # header + LSD + global color table
    assert buf[idesc] == 0x2C
    buf[idesc + 1] = 1
    with pytest.raises(ValueError, match="outside the screen"):
        parse_gif_frames(bytes(buf))


def test_decode_dispatch_includes_gif():
    from lswms_forage_etl_spark.operators.multimodal import (
        decode_image_bytes)
    ix = np.arange(30, dtype=np.uint8).reshape(5, 6)
    w, h, pix = decode_image_bytes(encode_gif(ix))
    assert (w, h) == (6, 5)
    assert np.array_equal(pix, PAL[ix.reshape(-1)].reshape(-1))


def _anim_gif(screen, frames, bg_index=5):
    """Hand-assembled animated GIF89a with per-frame sub-rectangle
    placement, disposal, and transparency — the byte shapes the
    encoder twin doesn't emit, so compositing is pinned against
    independently constructed streams."""
    import numpy as np

    from lswms_forage_etl_spark.operators.gif import (
        lzw_encode, synth_palette)
    sw, sh = screen
    pal = synth_palette()
    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0xF7, bg_index, 0]) + pal.astype(np.uint8).tobytes()
    for left, top, ix, disposal, transp, delay in frames:
        h, w = ix.shape
        packed = (disposal << 2) | (1 if transp is not None else 0)
        out += bytes([0x21, 0xF9, 4, packed])
        out += delay.to_bytes(2, "little")
        out += bytes([transp or 0, 0])
        out += b"\x2c" + left.to_bytes(2, "little") \
            + top.to_bytes(2, "little") \
            + w.to_bytes(2, "little") + h.to_bytes(2, "little") \
            + b"\x00\x08"
        stream = lzw_encode(np.asarray(ix, dtype=np.uint8).tobytes(), 8)
        for i in range(0, len(stream), 255):
            out += bytes([len(stream[i:i + 255])]) + stream[i:i + 255]
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_subrect_disposal_transparency_compositing():
    """Round 12 closes the last GIF gate: sub-rectangle rendering
    blocks composite onto the persistent canvas; transparency leaves
    the canvas through; disposal 2 restores the rect to background,
    disposal 3 to the pre-frame canvas."""
    import numpy as np

    from lswms_forage_etl_spark.operators.gif import (
        parse_gif_frames, synth_palette)
    pal = synth_palette()
    sw, sh = 4, 3
    full = np.full((sh, sw), 1, dtype=np.uint8)
    sub2 = np.full((2, 2), 2, dtype=np.uint8)          # at (2,1)
    mix = np.array([[7, 3]], dtype=np.uint8)           # at (0,0), 7=transp
    buf = _anim_gif((sw, sh), [
        (0, 0, full, 1, None, 4),     # f0: fill screen with idx 1
        (2, 1, sub2, 3, None, 5),     # f1: paint rect, then RESTORE
        (0, 0, mix, 2, 7, 6),         # f2: transparency + bg-restore
        (0, 0, mix, 0, 7, 7),         # f3: shows f2's rect rewound to bg
    ])
    frames = parse_gif_frames(buf)
    assert [f[0] for f in frames] == [4, 5, 6, 7]
    assert all((f[1], f[2]) == (sw, sh) for f in frames)
    c0 = frames[0][3].reshape(sh, sw, 3)
    assert (c0 == pal[1]).all()
    c1 = frames[1][3].reshape(sh, sw, 3)
    assert (c1[1:3, 2:4] == pal[2]).all()              # painted rect
    assert (c1[0, :] == pal[1]).all()                  # rest untouched
    c2 = frames[2][3].reshape(sh, sw, 3)
    assert (c2[1:3, 2:4] == pal[1]).all()              # disposal 3 undo
    assert (c2[0, 0] == pal[1]).all()                  # transparent px
    assert (c2[0, 1] == pal[3]).all()                  # painted px
    c3 = frames[3][3].reshape(sh, sw, 3)
    # f2's disposal 2 rewound its 1x2 rect to the BACKGROUND color
    # before f3 painted: f3's transparent (0,0) shows background
    assert (c3[0, 0] == pal[5]).all()
    assert (c3[0, 1] == pal[3]).all()
