"""S9 — native ESRI Shapefile polygon reader without GDAL/geopandas.

Reference (BiomassAggregate.py:86-92): `gpd.read_file` of the woredas
shapefile, key column `ADM3_PCODE` (ForecastMain.py:40-41). The engine
reads the documented binary formats directly — .shp (polygon geometry)
and .dbf (attributes) — producing the (zone_id, wkt) pairs that
`sources/geometry.py` decomposes into the zone-coverage tables.

Shapefile rings are ordered: outer rings clockwise, holes
counter-clockwise; rings are grouped into polygons by emitting each outer
ring as its own polygon shell with subsequent CCW rings as its holes.
(`geometry.zone_coverage_tables` uses even-odd containment, so exact
grouping only affects area/centroid bookkeeping.)"""

from __future__ import annotations

import struct

import numpy as np


def read_dbf_column(path: str, column: str) -> list[str]:
    """Minimal dBASE III reader: one column's values, record order."""
    data = open(path, "rb").read()
    n_records = struct.unpack("<I", data[4:8])[0]
    header_size, record_size = struct.unpack("<HH", data[8:12])
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off:off + 11].split(b"\x00")[0].decode("ascii")
        length = data[off + 16]
        fields.append((name, length))
        off += 32
    pos_map = {}
    pos = 1  # deletion flag byte
    for name, length in fields:
        pos_map[name] = (pos, length)
        pos += length
    if column not in pos_map:
        raise KeyError(f"{column!r} not in {[f[0] for f in fields]}")
    cpos, clen = pos_map[column]
    out = []
    for i in range(n_records):
        rec = data[header_size + i * record_size:
                   header_size + (i + 1) * record_size]
        out.append(rec[cpos:cpos + clen].decode("ascii", "replace").strip())
    return out


def _ring_is_clockwise(pts: np.ndarray) -> bool:
    x, y = pts[:, 0], pts[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0


def read_shp_polygons(path: str) -> list[list[list[np.ndarray]]]:
    """.shp -> per record: list of polygons, each [shell, *holes]
    ((n,2) float arrays). Null shapes yield an empty list."""
    data = open(path, "rb").read()
    out = []
    off = 100
    while off < len(data):
        content_words = struct.unpack(">I", data[off + 4:off + 8])[0]
        rec = data[off + 8:off + 8 + content_words * 2]
        off += 8 + content_words * 2
        shape_type = struct.unpack("<i", rec[:4])[0]
        if shape_type == 0:          # null shape
            out.append([])
            continue
        if shape_type not in (5, 15, 25):   # Polygon / Z / M
            raise NotImplementedError(f"shape type {shape_type}")
        num_parts, num_points = struct.unpack("<ii", rec[36:44])
        parts = struct.unpack(f"<{num_parts}i", rec[44:44 + 4 * num_parts])
        pts_off = 44 + 4 * num_parts
        pts = np.frombuffer(rec, dtype="<f8", count=num_points * 2,
                            offset=pts_off).reshape(num_points, 2)
        rings = [np.array(pts[parts[i]:
                              (parts[i + 1] if i + 1 < num_parts
                               else num_points)])
                 for i in range(num_parts)]
        polys: list[list[np.ndarray]] = []
        for ring in rings:
            if len(ring) < 3:
                continue
            if _ring_is_clockwise(ring) or not polys:
                polys.append([ring])     # new shell
            else:
                polys[-1].append(ring)   # hole of the last shell
        out.append(polys)
    return out


def _ring_wkt(ring: np.ndarray) -> str:
    return "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in ring) + ")"


def read_shapefile_zones(shp_path: str, dbf_path: str,
                         key_column: str = "ADM3_PCODE") -> list[tuple[str, str]]:
    """-> [(zone_id, MULTIPOLYGON wkt)] — the input shape for
    `geometry.zone_coverage_from_wkt`."""
    ids = read_dbf_column(dbf_path, key_column)
    shapes = read_shp_polygons(shp_path)
    if len(ids) != len(shapes):
        raise ValueError(f"dbf records {len(ids)} != shp records {len(shapes)}")
    out = []
    for zone_id, polys in zip(ids, shapes):
        if not polys:
            continue
        body = ", ".join(
            "(" + ", ".join(_ring_wkt(r) for r in rings) + ")"
            for rings in polys)
        out.append((zone_id.replace("/", "-"),   # C14 id sanitization
                    f"MULTIPOLYGON ({body})"))
    return out
