"""Compressed / typed GeoTIFF read (sources/geotiff.py) — VERDICT r11
missing #3: real-world GeoTIFFs are almost always deflate- or
LZW-compressed, often tiled, often integer-typed with band
scale/offset; the reader previously raised on all of it.

Pins: (a) the pure-python TIFF-LZW codec round-trips incl. width
changes, KwKwK, and table-full clears; (b) every layout variant
(deflate/LZW x strips/tiles x predictor) decodes bit-identically to
the uncompressed form; (c) integer samples reproduce the reference's
rasterio semantics exactly (mask sentinels on RAW values, THEN
band * scale + offset — BiomassAggregate.py:140-148); (d) GOLDEN:
deflate/LZW-recompressed twins of the reference's production rasters
decode bit-identically, and the zonal cascade over them reproduces
the same zonal means; (e) honest gates for unsupported shapes.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from lswms_forage_etl_spark.sources.geotiff import (
    _lzw_decode, _lzw_encode, decode_geotiff_bytes, encode_geotiff_bytes)

REF_TIF_DIR = "/root/reference/src/data/layers/biomass_et"


def _cells_equal(a: np.ndarray, b: np.ndarray) -> bool:
    return (a.shape == b.shape
            and np.array_equal(np.isnan(a), np.isnan(b))
            and np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)]))


def test_lzw_round_trips_adversarial():
    rng = np.random.RandomState(0)
    cases = [b"", b"\x00", bytes(rng.randint(0, 40, 300, dtype=np.uint8)),
             bytes(rng.randint(0, 40, 5000, dtype=np.uint8)),
             # high entropy -> 12-bit table fills -> CLEAR/restart
             bytes(rng.randint(0, 256, 300000, dtype=np.uint8)),
             # periodic -> deep dictionary chains (KwKwK territory)
             bytes(np.tile(np.arange(256, dtype=np.uint8), 2000)),
             b"\xff" * 10000, b"ababab" * 5000]
    for b in cases:
        assert _lzw_decode(_lzw_encode(b)) == b, len(b)


def test_lzw_width_early_change_boundary():
    """The TIFF early-change rule, exactly at the 9->10 bit boundary:
    a stream engineered to emit > 253 codes must survive (the decoder
    widens one table entry before the encoder's own table does)."""
    b = bytes(range(256)) * 3  # first pass fills pair entries steadily
    assert _lzw_decode(_lzw_encode(b)) == b


def test_float32_layout_variants_bit_identical():
    rng = np.random.RandomState(1)
    arr = rng.rand(37, 53).astype(np.float32).astype(np.float64)
    arr[arr < 0.1] = -99999.0
    a0, t0, nd0 = decode_geotiff_bytes(
        encode_geotiff_bytes(arr, 36.0, 15.0, 0.05, nodata=-99999.0))
    for kw in [dict(compression="deflate"),
               dict(compression="lzw"),
               dict(compression="deflate", rows_per_strip=5),
               dict(compression="lzw", tiled=True, tile_size=16),
               dict(compression="none", tiled=True, tile_size=8),
               dict(rows_per_strip=4)]:
        buf = encode_geotiff_bytes(arr, 36.0, 15.0, 0.05,
                                   nodata=-99999.0, **kw)
        a, t, nd = decode_geotiff_bytes(buf)
        assert t == t0 and nd == nd0 and _cells_equal(a, a0), kw


def test_int16_scale_offset_matches_rasterio_semantics():
    rng = np.random.RandomState(2)
    raw = rng.randint(-500, 3000, (23, 31)).astype(np.int16)
    raw[raw < -400] = -9999
    buf = encode_geotiff_bytes(raw, 36.0, 15.0, 0.05, nodata=-9999,
                               compression="deflate", predictor=2,
                               dtype="int16", scale=0.01, offset=-2.5,
                               tiled=True, tile_size=16)
    a, t, nd = decode_geotiff_bytes(buf)
    mask = raw == -9999
    expect = raw.astype(np.float64) * 0.01 + (-2.5)
    assert nd == -9999.0
    assert np.array_equal(np.isnan(a), mask)
    assert np.array_equal(a[~mask], expect[~mask])


def test_uint8_uint16_predictor_strips():
    rng = np.random.RandomState(3)
    raw8 = rng.randint(0, 256, (19, 40)).astype(np.uint8)
    buf = encode_geotiff_bytes(raw8, 0, 0, 1.0, compression="lzw",
                               predictor=2, dtype="uint8",
                               rows_per_strip=7)
    a, _, _ = decode_geotiff_bytes(buf)
    assert np.array_equal(a, raw8.astype(np.float64))
    raw16 = rng.randint(0, 65535, (11, 13)).astype(np.uint16)
    buf = encode_geotiff_bytes(raw16, 0, 0, 1.0, compression="deflate",
                               predictor=2, dtype="uint16")
    a, _, _ = decode_geotiff_bytes(buf)
    assert np.array_equal(a, raw16.astype(np.float64))


def test_unsupported_shapes_raise():
    arr = np.zeros((8, 8), dtype=np.float32)
    buf = bytearray(encode_geotiff_bytes(arr, 0, 0, 1.0))
    # unsupported compression code (PackBits = 32773) — patch tag 259
    i = buf.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    assert i > 0
    patched = bytearray(buf)
    patched[i + 8:i + 10] = (32773).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="compression"):
        decode_geotiff_bytes(bytes(patched))
    # float predictor on float samples
    with pytest.raises(ValueError, match="integer dtype"):
        encode_geotiff_bytes(arr, 0, 0, 1.0, predictor=2)
    with pytest.raises(ValueError, match="not a classic TIFF"):
        decode_geotiff_bytes(b"II\x00\x00" + bytes(16))


@pytest.mark.skipif(not os.path.isdir(REF_TIF_DIR),
                    reason="reference rasters absent")
def test_golden_reference_rasters_recompressed_bit_identical():
    for p in sorted(glob.glob(f"{REF_TIF_DIR}/*.tif"))[:3]:
        a0, t0, nd0 = decode_geotiff_bytes(open(p, "rb").read(), p)
        nd = nd0 if nd0 is not None else -99999.0
        for kw in [dict(compression="deflate"),
                   dict(compression="lzw", tiled=True, tile_size=64),
                   dict(compression="deflate", predictor=1,
                        rows_per_strip=37)]:
            twin = encode_geotiff_bytes(
                np.nan_to_num(a0, nan=nd), t0[0], t0[1], t0[2],
                nodata=nd, **kw)
            a1, t1, _ = decode_geotiff_bytes(twin)
            assert t1 == t0 and _cells_equal(a1, a0), (p, kw)


@pytest.mark.skipif(not os.path.isdir(REF_TIF_DIR),
                    reason="reference rasters absent")
def test_zonal_cells_identical_over_deflate_twins(spark, tmp_path):
    """The zonal-parity input contract re-run over compressed twins
    (VERDICT r11 item 3 'done' criterion): `geotiff_to_cells` over
    deflate-recompressed copies of the production rasters yields the
    IDENTICAL sparse cell table, so every downstream zonal statistic
    (the golden woredas.csv parity in test_reference_golden.py) is
    unchanged by the compression path."""
    from lswms_forage_etl_spark.sources.geotiff import geotiff_to_cells
    dates = ("20220101", "20220117")
    twins = []
    for d in dates:
        src = f"{REF_TIF_DIR}/biomass_{d}.tif"
        a, t, nd = decode_geotiff_bytes(open(src, "rb").read(), src)
        ndv = nd if nd is not None else -99999.0
        out = tmp_path / f"biomass_{d}.tif"
        out.write_bytes(encode_geotiff_bytes(
            np.nan_to_num(a, nan=ndv), t[0], t[1], t[2], nodata=ndv,
            compression="deflate", tiled=True, tile_size=64))
        twins.append(str(out))
    key = ["date", "row", "col"]
    orig = geotiff_to_cells(
        spark, [f"{REF_TIF_DIR}/biomass_{d}.tif" for d in dates]) \
        .orderBy(key).collect()
    twin = geotiff_to_cells(spark, twins).orderBy(key).collect()
    assert len(orig) > 10000
    assert orig == twin


def test_multiband_chunky_roundtrip_all_layouts():
    """Round 12: chunky (PlanarConfiguration=1) multi-band TIFFs —
    RGB uint8 across none/deflate/LZW x strips/tiles x predictor
    1/2 (per-sample differencing), plus int16 bands with nodata +
    scale; single-band keeps its 2-D contract."""
    import numpy as np

    from lswms_forage_etl_spark.sources.geotiff import (
        decode_geotiff_bytes, encode_geotiff_bytes)

    rng = np.random.RandomState(4)
    rgb = rng.randint(0, 255, (13, 9, 3)).astype(np.uint8)
    for comp in ("none", "deflate", "lzw"):
        for tiled in (False, True):
            for pred in (1, 2):
                b = encode_geotiff_bytes(
                    rgb, 36.0, 15.0, 0.05, dtype="uint8",
                    compression=comp, predictor=pred, tiled=tiled,
                    tile_size=4, rows_per_strip=5)
                arr, _, _ = decode_geotiff_bytes(b)
                assert arr.shape == (13, 9, 3)
                assert np.array_equal(arr, rgb.astype(np.float64)), (
                    comp, tiled, pred)
    v = rng.randint(-100, 100, (7, 5, 3)).astype(np.int16)
    v[2, 3, :] = -9999
    b = encode_geotiff_bytes(v, 36.0, 15.0, 0.05, dtype="int16",
                             nodata=-9999.0, compression="deflate",
                             predictor=2, scale=0.1)
    arr, _, _ = decode_geotiff_bytes(b)
    want = v.astype(np.float64) * 0.1
    want[2, 3, :] = np.nan
    assert np.allclose(arr, want, equal_nan=True)
    g = rng.randint(0, 255, (6, 4)).astype(np.uint8)
    a2, _, _ = decode_geotiff_bytes(
        encode_geotiff_bytes(g, 36.0, 15.0, 0.05, dtype="uint8"))
    assert a2.shape == (6, 4) and np.array_equal(a2, g.astype(np.float64))


def test_planar_separate_still_gates():
    """Planar-configuration 2 (band-separate) remains an honest raise."""
    import struct

    import numpy as np
    import pytest

    from lswms_forage_etl_spark.sources.geotiff import (
        decode_geotiff_bytes, encode_geotiff_bytes)

    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    b = bytearray(encode_geotiff_bytes(rgb, 36.0, 15.0, 0.05,
                                       dtype="uint8"))
    # patch tag 284 (written right after 277 for multiband) to value 2
    ifd_off = struct.unpack("<I", b[4:8])[0]
    n = struct.unpack("<H", b[ifd_off:ifd_off + 2])[0]
    for i in range(n):
        p = ifd_off + 2 + i * 12
        if struct.unpack("<H", b[p:p + 2])[0] == 284:
            b[p + 8:p + 10] = struct.pack("<H", 2)
    with pytest.raises(NotImplementedError, match="planar"):
        decode_geotiff_bytes(bytes(b))
