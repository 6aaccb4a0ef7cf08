"""Animated WebP (VP8X/ANIM/ANMF + VP8L sub-frames): container
roundtrip, sub-rectangle placement, dispose-to-background, exact-
integer alpha blending, and the Spark frame-table pipeline."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lswms_forage_etl_spark.operators import webp  # noqa: E402


def _rgb(v, h, w):
    return np.full((h, w, 3), v, dtype=np.uint8)


def _canvas_rgb(frame, w, h):
    c = frame["canvas"].reshape(h, w)
    return ((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF)


def test_full_frame_roundtrip_durations_and_pixels():
    g = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    buf = webp.encode_webp_anim(4, 3, [
        (0, 0, g, 40, False, True),
        (0, 0, (g + 9).astype(np.uint8), 50, False, True),
    ], loops=5)
    cw, ch, loops, bg, frames = webp.parse_webp_anim(buf)
    assert (cw, ch, loops) == (4, 3, 5)
    assert [f["duration_ms"] for f in frames] == [40, 50]
    r0, g0, b0 = _canvas_rgb(frames[0], 4, 3)
    assert (r0 == g[..., 0]).all() and (b0 == g[..., 2]).all()
    r1, _, _ = _canvas_rgb(frames[1], 4, 3)
    assert (r1 == g[..., 0] + 9).all()


def test_subrectangle_composition():
    base = _rgb(10, 4, 8)
    patch = _rgb(200, 2, 4)
    buf = webp.encode_webp_anim(8, 4, [
        (0, 0, base, 40, False, True),
        (4, 2, patch, 40, False, True),     # offsets must be even
    ])
    _, _, _, _, frames = webp.parse_webp_anim(buf)
    r, _, _ = _canvas_rgb(frames[1], 8, 4)
    assert (r[2:4, 4:8] == 200).all()
    assert (r[0:2, :] == 10).all() and (r[2:4, 0:4] == 10).all()


def test_odd_offsets_rejected():
    with pytest.raises(ValueError):
        webp.encode_webp_anim(8, 4, [(1, 0, _rgb(1, 2, 2), 40,
                                      False, True)])


def test_dispose_to_background():
    bg = 0xFF000000 | (7 << 16) | (7 << 8) | 7
    buf = webp.encode_webp_anim(4, 4, [
        (0, 0, _rgb(100, 4, 4), 40, True, True),    # dispose after
        (0, 0, _rgb(50, 2, 2), 40, False, True),    # top-left patch
    ], bg_argb=bg)
    _, _, _, _, frames = webp.parse_webp_anim(buf)
    r0, _, _ = _canvas_rgb(frames[0], 4, 4)
    assert (r0 == 100).all()
    r1, _, _ = _canvas_rgb(frames[1], 4, 4)
    assert (r1[0:2, 0:2] == 50).all()
    assert (r1[2:4, :] == 7).all()      # disposed region shows bg


def test_alpha_blending_exact_integer():
    base = _rgb(100, 2, 2)
    over = np.zeros((2, 2, 4), dtype=np.uint8)
    over[..., 0] = 200                   # red
    over[..., 3] = 128                   # half alpha
    buf = webp.encode_webp_anim(2, 2, [
        (0, 0, base, 40, False, True),
        (0, 0, over, 40, False, False),  # alpha blend
    ])
    _, _, _, _, frames = webp.parse_webp_anim(buf)
    r, _, _ = _canvas_rgb(frames[1], 2, 2)
    # exact-integer 'over': aF=128, aC=255 ->
    # den = 128*255 + 255*127; num = 200*128*255 + 100*255*127
    den = 128 * 255 + 255 * 127
    num = 200 * 128 * 255 + 100 * 255 * 127
    want = (num + den // 2) // den
    assert (r == want).all()


def test_blend_none_replaces_even_with_transparent():
    base = _rgb(100, 2, 2)
    clear = np.zeros((2, 2, 4), dtype=np.uint8)   # fully transparent
    buf = webp.encode_webp_anim(2, 2, [
        (0, 0, base, 40, False, True),
        (0, 0, clear, 40, False, True),           # no blend
    ])
    _, _, _, _, frames = webp.parse_webp_anim(buf)
    c = frames[1]["canvas"]
    assert (c == 0).all()                # replaced, not blended


def test_non_animated_stream_rejected():
    g = _rgb(1, 2, 2)
    with pytest.raises(ValueError):
        webp.parse_webp_anim(webp.encode_webp(g))


def test_spark_frame_table(spark):
    from lswms_forage_etl_spark.operators.multimodal import (
        synth_webp_anim_media, webp_frame_table)
    text = "x" * 200
    docs = spark.createDataFrame(
        [(i, text, "en", "s", 200) for i in range(8)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    rows = webp_frame_table(synth_webp_anim_media(docs)).collect()
    assert len(rows) == 24               # 3 frames x 8 docs
    for r in rows:
        w = 4 + r["media_id"] % 8
        assert r["decoded_width"] == w and r["decoded_height"] == 3
        assert r["duration_ms"] == 40 + 10 * r["frame_idx"]
        b = ord("x")
        want = (255 * 3 * w + (b ^ 0x55) * 3 * w) / (9 * w)
        assert abs(r["mean_intensity"] - want) < 1e-9
