"""S10 — native GeoTIFF scan without GDAL.

Reference (BiomassAggregate.py:128-154): rasterio band-1 read with
scale/offset and a sentinel-nodata set. This container has no rasterio, so
the engine ships a minimal reader for the reference's own raster layout —
single-band, uncompressed, strip-organized float32 — sufficient for every
`biomass_YYYYMMDD.tif` the reference produces (`rasterize.py:63,90-91`
writes exactly this shape). Anything fancier (tiles, compression) raises
cleanly rather than guessing.

Two decode paths share one bytes-level parser (`decode_geotiff_bytes`):
`geotiff_to_cells` loops driver-side (fine for a handful of rasters, and
what the reference itself does), while `geotiff_to_cells_distributed`
scans the files with `spark.read.format("binaryFile")` and decodes inside
`mapInPandas` — the 100 TB path, where 10k rasters fan out one-per-task
across executors and only the long-format cells ever reach the shuffle."""

from __future__ import annotations

import datetime as dt
import os
import re
import struct

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from lswms_forage_etl_spark import schemas
from lswms_forage_etl_spark.functions.cleansing import mask_sentinels

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def _read_tag_values(data: bytes, endian: str, typ: int, cnt: int,
                     val_field: bytes):
    size = _TYPE_SIZE[typ] * cnt
    if size <= 4:
        raw = val_field[:size]
    else:
        off = struct.unpack(endian + "I", val_field)[0]
        raw = data[off:off + size]
    if typ == 3:
        return struct.unpack(endian + f"{cnt}H", raw)
    if typ == 4:
        return struct.unpack(endian + f"{cnt}I", raw)
    if typ == 12:
        return struct.unpack(endian + f"{cnt}d", raw)
    if typ == 2:
        return (raw.split(b"\x00")[0].decode("ascii", "replace"),)
    return (raw,)


def read_geotiff(path: str) -> tuple[np.ndarray, tuple[float, float, float],
                                     float | None]:
    """Driver-side convenience wrapper over `decode_geotiff_bytes`."""
    return decode_geotiff_bytes(open(path, "rb").read(), path)


def decode_geotiff_bytes(data: bytes, name: str = "<bytes>"
                         ) -> tuple[np.ndarray, tuple[float, float, float],
                                    float | None]:
    """-> (array[rows, cols] float64 with nodata -> NaN,
           (origin_lon, origin_lat, cell_size), nodata).

    Supports the reference's exact layout: single IFD, one band,
    uncompressed strips, 32-bit IEEE float samples. Pure bytes -> numpy,
    no filesystem access — safe to run executor-side on binaryFile rows."""
    endian = "<" if data[:2] == b"II" else ">"
    magic, ifd = struct.unpack(endian + "HI", data[2:8])
    if magic != 42:
        raise ValueError(f"not a classic TIFF: {name}")
    n = struct.unpack(endian + "H", data[ifd:ifd + 2])[0]
    tags: dict[int, tuple] = {}
    for i in range(n):
        t, typ, cnt = struct.unpack(endian + "HHI",
                                    data[ifd + 2 + i * 12:ifd + 10 + i * 12])
        val_field = data[ifd + 10 + i * 12:ifd + 14 + i * 12]
        tags[t] = _read_tag_values(data, endian, typ, cnt, val_field)

    width, height = tags[256][0], tags[257][0]
    if tags.get(259, (1,))[0] != 1:
        raise NotImplementedError("compressed TIFF not supported")
    if tags.get(258, (32,))[0] != 32 or tags.get(339, (3,))[0] != 3:
        raise NotImplementedError("only float32 samples supported")
    rows_per_strip = tags.get(278, (height,))[0]
    offsets, counts = tags[273], tags[279]

    dt_np = np.dtype(np.float32).newbyteorder(endian)
    rows = []
    for k, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, height - k * rows_per_strip)
        strip = np.frombuffer(data, dtype=dt_np, count=nrows * width,
                              offset=off)
        rows.append(strip.reshape(nrows, width))
    arr = np.vstack(rows).astype(np.float64)

    # ModelPixelScale (33550) + ModelTiepoint (33922): affine for the
    # north-up rasters the reference writes (from_origin, rasterize.py:63)
    sx, sy = tags[33550][0], tags[33550][1]
    tie = tags[33922]
    origin_lon = tie[3] - tie[0] * sx
    origin_lat = tie[4] + tie[1] * sy
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(tags[42113][0])
        except (TypeError, ValueError):
            nodata = None
    if nodata is not None:
        arr[arr == nodata] = np.nan
    return arr, (origin_lon, origin_lat, sx), nodata


_DATE_RE = re.compile(r"(\d{8})")


def encode_geotiff_bytes(arr: np.ndarray, origin_lon: float,
                         origin_lat: float, cell_size: float,
                         nodata: float | None = None) -> bytes:
    """Encode a 2-D array as the exact layout `decode_geotiff_bytes`
    parses — and the one the reference writes (rasterize.py:63,90-91 via
    rasterio from_origin): classic little-endian TIFF, single band,
    float32 samples, uncompressed single strip, ModelPixelScale +
    ModelTiepoint georeferencing, GDAL_NODATA ascii tag. No rasterio."""
    a = np.ascontiguousarray(arr, dtype="<f4")
    if a.ndim != 2:
        raise ValueError("expected a 2-D array")
    h, w = a.shape
    pix = a.tobytes()
    data_off = 8
    ifd_off = data_off + len(pix)

    SHORT, LONG, ASCII, DOUBLE = 3, 4, 2, 12
    entries: list[tuple[int, int, int, bytes]] = []  # tag, typ, cnt, inline4
    tail = b""  # external values, appended after the IFD

    def inline(typ: int, *vals: int) -> bytes:
        fmt = {SHORT: "H", LONG: "I"}[typ]
        raw = struct.pack("<" + fmt * len(vals), *vals)
        return raw.ljust(4, b"\x00")

    n_entries = 12 + (1 if nodata is not None else 0)
    ext_base = ifd_off + 2 + n_entries * 12 + 4  # external values after IFD

    def external(raw: bytes) -> bytes:
        nonlocal tail
        off = ext_base + len(tail)
        tail += raw
        return struct.pack("<I", off)

    entries.append((256, SHORT, 1, inline(SHORT, w)))
    entries.append((257, SHORT, 1, inline(SHORT, h)))
    entries.append((258, SHORT, 1, inline(SHORT, 32)))
    entries.append((259, SHORT, 1, inline(SHORT, 1)))      # uncompressed
    entries.append((262, SHORT, 1, inline(SHORT, 1)))      # min-is-black
    entries.append((273, LONG, 1, inline(LONG, data_off)))  # strip offset
    entries.append((277, SHORT, 1, inline(SHORT, 1)))      # one band
    entries.append((278, LONG, 1, inline(LONG, h)))        # rows per strip
    entries.append((279, LONG, 1, inline(LONG, len(pix))))
    entries.append((339, SHORT, 1, inline(SHORT, 3)))      # IEEE float
    ps = struct.pack("<3d", cell_size, cell_size, 0.0)
    entries.append((33550, DOUBLE, 3, external(ps)))
    tp = struct.pack("<6d", 0.0, 0.0, 0.0, origin_lon, origin_lat, 0.0)
    entries.append((33922, DOUBLE, 6, external(tp)))
    if nodata is not None:
        nd = str(nodata).encode("ascii") + b"\x00"
        entries.append((42113, ASCII, len(nd), external(nd)))

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += pix
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)  # no next IFD
    out += tail
    return bytes(out)


def _file_date(path: str) -> dt.date:
    m = _DATE_RE.search(os.path.basename(path))
    if not m:
        raise ValueError(f"no yyyymmdd date in filename: {path}")
    return dt.datetime.strptime(m.group(1), "%Y%m%d").date()


def geotiff_to_cells(spark: SparkSession, paths: list[str],
                     mask_nodata: bool = True) -> DataFrame:
    """Decode GeoTIFFs into the long-format RASTER_CELLS table (dates from
    filenames, C13), sentinel set normalized to NULL (F5). Only populated
    (non-NaN) cells are emitted — the engine-native sparse form.

    Driver-side loop — right-sized for the reference's daily handful of
    rasters; use `geotiff_to_cells_distributed` for large archives."""
    rows = []
    for p in paths:
        date = _file_date(p)
        arr, _, _ = read_geotiff(p)
        rr, cc = np.nonzero(~np.isnan(arr))
        rows.extend((date, int(r), int(c), float(arr[r, c]))
                    for r, c in zip(rr, cc))
    df = spark.createDataFrame(rows, schemas.RASTER_CELLS)
    if mask_nodata:
        df = df.withColumn("value", mask_sentinels("value"))
    return df


def geotiff_to_cells_distributed(spark: SparkSession, paths: list[str] | str,
                                 mask_nodata: bool = True) -> DataFrame:
    """Executor-side decode: `binaryFile` scan -> `decode_geotiff_bytes`
    inside `mapInPandas`, one Arrow batch of cells per raster.

    The scale path promised by the module docstring: file bytes never
    visit the driver, each raster decodes in its own task (repartition by
    path — binaryFile coalesces small files into shared splits), and the
    emitted rows are already the sparse long format, so downstream
    composites/zonal aggs shuffle only populated cells."""
    import pandas as pd

    bf = spark.read.format("binaryFile").load(paths) \
        .select("path", "content")
    n_files = bf.rdd.getNumPartitions()
    bf = bf.repartition(max(n_files, spark.sparkContext.defaultParallelism),
                        "path")

    def decode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                date = _file_date(path)
                arr, _, _ = decode_geotiff_bytes(bytes(content), path)
                rr, cc = np.nonzero(~np.isnan(arr))
                yield pd.DataFrame({
                    "date": np.repeat(np.array(date, dtype="datetime64[D]"),
                                      len(rr)),
                    "row": rr.astype(np.int32),
                    "col": cc.astype(np.int32),
                    "value": arr[rr, cc].astype(np.float64),
                })

    df = bf.mapInPandas(decode, schemas.RASTER_CELLS)
    if mask_nodata:
        df = df.withColumn("value", mask_sentinels("value"))
    return df
