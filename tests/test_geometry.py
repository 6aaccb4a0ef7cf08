"""Zone-coverage builder: WKT parse, containment, all_touched edges,
holes, tiny-polygon buffering, centroids — against hand-computed cells.

Grid under test: origin (36, 15), cell 0.05 — cell (row, col) spans
lon [36+0.05c, 36+0.05(c+1)], lat [15-0.05(r+1), 15-0.05r]."""

from __future__ import annotations

import pytest

from lswms_forage_etl_spark.sources.geometry import (
    parse_wkt_polygon,
    polygon_area,
    polygon_centroid,
    zone_coverage_from_wkt,
    zone_coverage_tables,
)


def _cov_map(rows):
    out = {}
    for zone, r, c, kind in rows:
        out.setdefault(zone, {}).setdefault(kind, set()).add((r, c))
    return out


def test_parse_and_area_centroid():
    polys = parse_wkt_polygon(
        "POLYGON ((36 15, 36.1 15, 36.1 14.9, 36 14.9, 36 15))")
    assert len(polys) == 1 and len(polys[0]) == 1
    assert polys[0][0].shape == (5, 2)
    assert abs(polygon_area(polys) - 0.01) < 1e-12
    cx, cy = polygon_centroid(polys)
    assert abs(cx - 36.05) < 1e-9 and abs(cy - 14.95) < 1e-9
    # hole subtracts area
    withhole = parse_wkt_polygon(
        "POLYGON ((36 15, 36.1 15, 36.1 14.9, 36 14.9, 36 15), "
        "(36.02 14.98, 36.04 14.98, 36.04 14.96, 36.02 14.96, 36.02 14.98))")
    assert len(withhole) == 1 and len(withhole[0]) == 2
    assert abs(polygon_area(withhole) - (0.01 - 0.0004)) < 1e-12
    with pytest.raises(ValueError):
        parse_wkt_polygon("LINESTRING (0 0, 1 1)")


def test_square_coverage_exact():
    # 2x2-cell square aligned to the grid: strict = the 4 cells whose
    # centers it contains; edges touch the surrounding ring
    wkt = "POLYGON ((36.0 15.0, 36.1 15.0, 36.1 14.9, 36.0 14.9, 36.0 15.0))"
    cov, cent = zone_coverage_tables([("Z", wkt)])
    m = _cov_map(cov)["Z"]
    assert m["strict"] == {(0, 0), (0, 1), (1, 0), (1, 1)}
    # all_touched adds some boundary cells beyond strict, never cells
    # outside the grid. Which side of an exactly-grid-aligned edge a cell
    # lands on is FP-representation-dependent (GDAL has the same
    # ambiguity), so no exact cell assertions on the boundary ring.
    assert all(0 <= r < 300 and 0 <= c < 260 for r, c in m["all_touched"])
    assert m["all_touched"], "edges must touch at least one extra cell"
    # centroid (36.05, 14.95) sits on a cell corner: any adjacent cell ok
    (_, r, c), = cent
    assert r in (0, 1) and c in (0, 1)


def test_hole_is_excluded():
    wkt = ("POLYGON ((36.0 15.0, 36.25 15.0, 36.25 14.75, 36.0 14.75, 36.0 15.0), "
           "(36.05 14.95, 36.2 14.95, 36.2 14.8, 36.05 14.8, 36.05 14.95))")
    cov, _ = zone_coverage_tables([("H", wkt)])
    m = _cov_map(cov)["H"]
    # center cells of the hole (rows/cols 1..2 of the 5x5 block) excluded
    assert (2, 2) not in m["strict"]
    assert (0, 0) in m["strict"]


def test_tiny_polygon_buffered():
    # polygon much smaller than 0.25 cell areas, between cell centers:
    # strict empty, but the buffered bbox marks neighbors as touched
    wkt = ("POLYGON ((36.049 14.951, 36.051 14.951, 36.051 14.949, "
           "36.049 14.949, 36.049 14.951))")
    cov, cent = zone_coverage_tables([("T", wkt)])
    m = _cov_map(cov)["T"]
    assert not m.get("strict")
    assert {(0, 0), (0, 1), (1, 0), (1, 1)} <= m["all_touched"]
    (_, r, c), = cent
    assert r in (0, 1) and c in (0, 1)


def test_multipolygon_and_spark_tables(spark):
    wkt = ("MULTIPOLYGON (((36.0 15.0, 36.1 15.0, 36.1 14.9, 36.0 14.9, 36.0 15.0)), "
           "((36.5 15.0, 36.6 15.0, 36.6 14.9, 36.5 14.9, 36.5 15.0)))")
    cov_df, cent_df = zone_coverage_from_wkt(spark, [("M", wkt)])
    rows = cov_df.collect()
    strict = {(r["row"], r["col"]) for r in rows if r["coverage"] == "strict"}
    # both parts contribute: cols 0-1 and cols 10-11
    assert {(0, 0), (0, 1), (0, 10), (0, 11)} <= strict
    assert cov_df.schema["coverage"].dataType.typeName() == "string"
    assert cent_df.count() == 1


def test_out_of_grid_clipped():
    wkt = "POLYGON ((30 20, 31 20, 31 19, 30 19, 30 20))"  # fully outside
    cov, cent = zone_coverage_tables([("O", wkt)])
    assert cov == [] and cent == []
