"""S9/J4-prep — the one-time polygon -> zone-coverage decomposition.

Reference (BiomassAggregate.py:86-92, 189-311): reads the woreda shapefile
with geopandas, fixes topology (`buffer(0)`), then per date per zone calls
`zonal_stats` with rasterization fallbacks. The engine does the geometry
work ONCE, driver-side (151 polygons — catalog-scale, never data-scale),
producing the ZONE_COVERAGE / ZONE_CENTROIDS tables that
`operators/zonal.py` joins against; the per-date work is then pure
relational algebra at any scale.

Pure numpy — no shapely/GDAL in this container (and none needed for
polygon->regular-grid decomposition):

  strict       cell-center-in-polygon (even-odd ray casting) — the same
               rule rasterio's default rasterization uses.
  all_touched  strict ∪ every cell crossed by a polygon edge (supercover
               grid walk per edge) — matches rasterize(all_touched=True)
               up to degenerate tangencies.
  tiny-polygon polygons smaller than 0.25 cell areas get their bbox
               expanded by half the pixel diagonal before the all_touched
               pass (the reference's buffering rule,
               BiomassAggregate.py:210-214).
  centroid     shoelace-formula area centroid snapped to its cell
               (the pass-3 fallback sample point, :251-271).

Only simple (optionally multi-ring) WKT POLYGON/MULTIPOLYGON is parsed;
holes are honored by even-odd counting across all rings.
"""

from __future__ import annotations

import math
import re

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from lswms_forage_etl_spark import schemas

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"
_RING_RE = re.compile(r"\(([^()]+)\)")
_POLY_BLOCK_RE = re.compile(r"\((\s*\([^()]+\)(?:\s*,\s*\([^()]+\))*\s*)\)")


def parse_wkt_polygon(wkt: str) -> list[list[np.ndarray]]:
    """WKT POLYGON/MULTIPOLYGON -> list of polygons; each polygon is a list
    of rings (shell first, holes after), each ring an (n, 2) lon/lat
    array. The polygon/hole structure is preserved so area and bbox are
    computed correctly for MULTIPOLYGONs."""
    head = wkt.strip().split("(", 1)[0].strip().upper()
    if head not in ("POLYGON", "MULTIPOLYGON"):
        raise ValueError(f"unsupported WKT type: {head!r}")

    def _parse_ring(ring_txt: str) -> np.ndarray | None:
        pts = []
        for pair in ring_txt.split(","):
            xy = re.findall(_NUM, pair)
            if len(xy) >= 2:
                pts.append((float(xy[0]), float(xy[1])))
        return np.asarray(pts, dtype=float) if len(pts) >= 3 else None

    body = wkt.strip().split("(", 1)[1]
    if head == "POLYGON":
        blocks = ["(" + body.rsplit(")", 1)[0] + ")"]
    else:
        blocks = [m.group(1) for m in _POLY_BLOCK_RE.finditer("(" + body)]
    polys: list[list[np.ndarray]] = []
    for block in blocks:
        rings = [r for r in (_parse_ring(t) for t in _RING_RE.findall(block))
                 if r is not None]
        if rings:
            polys.append(rings)
    if not polys:
        raise ValueError("no rings parsed from WKT")
    return polys


def _even_odd_inside(px: np.ndarray, py: np.ndarray,
                     polys: list[list[np.ndarray]]) -> np.ndarray:
    """Vectorized even-odd ray casting against every ring of every
    polygon: disjoint shells OR together, holes cancel — even-odd gives
    both for free."""
    inside = np.zeros(px.shape, dtype=bool)
    for rings in polys:
        for ring in rings:
            x0, y0 = ring[:, 0], ring[:, 1]
            x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
            for i in range(len(ring)):
                cond = ((y0[i] > py) != (y1[i] > py))
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = x0[i] + (py - y0[i]) / (y1[i] - y0[i]) * (x1[i] - x0[i])
                inside ^= cond & (px < xint)
    return inside


def _ring_signed_area_centroid(ring: np.ndarray) -> tuple[float, float, float]:
    x, y = ring[:, 0], ring[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = float(cross.sum()) / 2.0
    if abs(a) < 1e-12:
        return 0.0, float(x.mean()), float(y.mean())
    cx = float(((x + xn) * cross).sum()) / (6.0 * a)
    cy = float(((y + yn) * cross).sum()) / (6.0 * a)
    return a, cx, cy


def polygon_area(polys: list[list[np.ndarray]]) -> float:
    """Total area: sum over polygons of |shell| - sum |holes|."""
    total = 0.0
    for rings in polys:
        for k, ring in enumerate(rings):
            a, _, _ = _ring_signed_area_centroid(ring)
            total += abs(a) if k == 0 else -abs(a)
    return max(total, 0.0)


def polygon_centroid(polys: list[list[np.ndarray]]) -> tuple[float, float]:
    """Area-weighted centroid (shells positive, holes negative)."""
    aw, cxw, cyw = 0.0, 0.0, 0.0
    for rings in polys:
        for k, ring in enumerate(rings):
            a, cx, cy = _ring_signed_area_centroid(ring)
            w = abs(a) if k == 0 else -abs(a)
            aw += w
            cxw += w * cx
            cyw += w * cy
    if abs(aw) < 1e-12:
        pts = np.vstack([r for rings in polys for r in rings])
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return cxw / aw, cyw / aw


def _cell_of(lon: float, lat: float,
             origin_lon: float, origin_lat: float, cell: float,
             n_rows: int, n_cols: int) -> tuple[int, int] | None:
    col = int(math.floor((lon - origin_lon) / cell))
    row = int(math.floor((origin_lat - lat) / cell))
    if 0 <= row < n_rows and 0 <= col < n_cols:
        return row, col
    return None


def _edge_cells(polys: list[list[np.ndarray]],
                origin_lon: float, origin_lat: float,
                cell: float, n_rows: int, n_cols: int) -> set[tuple[int, int]]:
    """Supercover walk: every cell each edge segment passes through,
    sampled at sub-cell resolution (4 samples per cell length — exact for
    the regular-grid use; tangential corner touches may differ from GDAL
    by one cell, which the reference itself treats as don't-care)."""
    out: set[tuple[int, int]] = set()
    for ring in (r for rings in polys for r in rings):
        pts = np.vstack([ring, ring[:1]])
        for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
            seg_len = math.hypot(x1 - x0, y1 - y0)
            n = max(2, int(seg_len / (cell / 4.0)) + 1)
            ts = np.linspace(0.0, 1.0, n)
            for x, y in zip(x0 + ts * (x1 - x0), y0 + ts * (y1 - y0)):
                rc = _cell_of(x, y, origin_lon, origin_lat, cell,
                              n_rows, n_cols)
                if rc is not None:
                    out.add(rc)
    return out


def zone_coverage_tables(
        zones: list[tuple[str, str]],
        origin_lon: float = schemas.GRID_ORIGIN_LON,
        origin_lat: float = schemas.GRID_ORIGIN_LAT,
        cell: float = schemas.GRID_CELL_DEG,
        n_rows: int = schemas.GRID_N_ROWS,
        n_cols: int = schemas.GRID_N_COLS,
) -> tuple[list[tuple], list[tuple]]:
    """[(zone_id, wkt)] -> (coverage rows, centroid rows).

    coverage rows: (zone_id, row, col, 'strict'|'all_touched');
    centroid rows: (zone_id, centroid_row, centroid_col)."""
    cov_rows: list[tuple] = []
    cent_rows: list[tuple] = []
    for zone_id, wkt in zones:
        polys = parse_wkt_polygon(wkt)
        shells = np.vstack([rings[0] for rings in polys])
        # tiny-polygon buffering (reference :210-214): expand the bbox by
        # half a pixel diagonal before deciding what the polygon touches
        pad = 0.0
        if polygon_area(polys) < 0.25 * cell * cell:
            pad = 0.5 * cell * math.sqrt(2.0)
        lon_min, lat_min = shells.min(axis=0) - pad
        lon_max, lat_max = shells.max(axis=0) + pad
        c0 = max(0, int(math.floor((lon_min - origin_lon) / cell)))
        c1 = min(n_cols - 1, int(math.floor((lon_max - origin_lon) / cell)))
        r0 = max(0, int(math.floor((origin_lat - lat_max) / cell)))
        r1 = min(n_rows - 1, int(math.floor((origin_lat - lat_min) / cell)))
        if c1 < c0 or r1 < r0:
            strict: set[tuple[int, int]] = set()
            touched: set[tuple[int, int]] = set()
        else:
            rr, cc = np.meshgrid(np.arange(r0, r1 + 1),
                                 np.arange(c0, c1 + 1), indexing="ij")
            px = origin_lon + (cc + 0.5) * cell       # cell centers
            py = origin_lat - (rr + 0.5) * cell
            inside = _even_odd_inside(px, py, polys)
            strict = {(int(r), int(c))
                      for r, c in zip(rr[inside], cc[inside])}
            touched = strict | _edge_cells(
                polys, origin_lon, origin_lat, cell, n_rows, n_cols)
            if pad > 0.0:
                # buffered tiny polygon: every bbox cell counts as touched
                touched |= {(int(r), int(c))
                            for r, c in zip(rr.ravel(), cc.ravel())}
        for r, c in sorted(strict):
            cov_rows.append((zone_id, r, c, "strict"))
        for r, c in sorted(touched - strict):
            cov_rows.append((zone_id, r, c, "all_touched"))
        cx, cy = polygon_centroid(polys)
        rc = _cell_of(cx, cy, origin_lon, origin_lat, cell, n_rows, n_cols)
        if rc is not None:
            cent_rows.append((zone_id, rc[0], rc[1]))
    return cov_rows, cent_rows


def zone_coverage_from_wkt(spark: SparkSession,
                           zones: list[tuple[str, str]],
                           **grid_kw) -> tuple[DataFrame, DataFrame]:
    """Build the broadcastable ZONE_COVERAGE + ZONE_CENTROIDS DataFrames
    from (zone_id, wkt) pairs — the engine's replacement for the per-date
    zonal_stats geometry work."""
    cov, cent = zone_coverage_tables(zones, **grid_kw)
    return (spark.createDataFrame(cov, schemas.ZONE_COVERAGE),
            spark.createDataFrame(cent, schemas.ZONE_CENTROIDS))
