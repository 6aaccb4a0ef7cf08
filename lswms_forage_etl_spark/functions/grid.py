"""C22 — pixel <-> coordinate affine transforms, the engine's core spatial
primitive.

The reference's raster geometry is a fixed regular grid: 260x300 cells of
0.05 deg with origin (36 E, 15 N) — `from_origin(36, 15, 0.05, 0.05)` at
reference rasterize.py:63, and the inverse lookup `ds.index(x, y)` at
BiomassAggregate.py:261. On a regular grid, nearest-neighbor raster sampling
(J2/J3) degenerates into an exact *equi-join* on the snapped (row, col) —
which is why the engine never needs a geospatial library for reference
parity: snapping is a pure arithmetic expression, fully codegen'd, and the
join key is an int pair that hash-partitions evenly at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lswms_forage_etl_spark.schemas import (
    GRID_CELL_DEG,
    GRID_ORIGIN_LAT,
    GRID_ORIGIN_LON,
)


def lon_to_col(lon: Column | str,
               origin_lon: float = GRID_ORIGIN_LON,
               cell: float = GRID_CELL_DEG) -> Column:
    """Longitude -> 0-based column index (floor; origin at cell left edge)."""
    c = F.col(lon) if isinstance(lon, str) else lon
    return F.floor((c - F.lit(origin_lon)) / F.lit(cell)).cast("int")


def lat_to_row(lat: Column | str,
               origin_lat: float = GRID_ORIGIN_LAT,
               cell: float = GRID_CELL_DEG) -> Column:
    """Latitude -> 0-based row index (rows grow southward from the origin)."""
    c = F.col(lat) if isinstance(lat, str) else lat
    return F.floor((F.lit(origin_lat) - c) / F.lit(cell)).cast("int")


def cell_to_lon(col: Column | str,
                origin_lon: float = GRID_ORIGIN_LON,
                cell: float = GRID_CELL_DEG) -> Column:
    """Column index -> cell-center longitude."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lit(origin_lon) + (c.cast("double") + F.lit(0.5)) * F.lit(cell)


def cell_to_lat(row: Column | str,
                origin_lat: float = GRID_ORIGIN_LAT,
                cell: float = GRID_CELL_DEG) -> Column:
    """Row index -> cell-center latitude."""
    r = F.col(row) if isinstance(row, str) else row
    return F.lit(origin_lat) - (r.cast("double") + F.lit(0.5)) * F.lit(cell)


def snap_cell(df, lon: str = "lon", lat: str = "lat",
              row_name: str = "row", col_name: str = "col"):
    """Add snapped (row, col) columns — the J2/J3 nearest-sample key."""
    return df.withColumn(col_name, lon_to_col(lon)).withColumn(
        row_name, lat_to_row(lat))
