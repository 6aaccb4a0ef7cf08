"""J4/A3/M4 zonal cascade and M3 rasterize against hand-computed goldens
(FIXTURES.md §5/§7/§8 shapes)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lswms_forage_etl_spark.functions.cleansing import mask_sentinels
from lswms_forage_etl_spark.operators.rasterize import (
    full_grid,
    manifest,
    rasterize_points,
)
from lswms_forage_etl_spark.operators.zonal import zonal_stats, zone_series

D1 = dt.date(2024, 1, 16)


def _cells(spark):
    # 4x4 grid, one date; sentinel at (0,1); nodata-null at (3,3)
    rows = []
    for r in range(4):
        for c in range(4):
            v = float(r * 4 + c)
            if (r, c) == (0, 1):
                v = -99999.0
            if (r, c) == (3, 3):
                v = -9999.0
            rows.append((D1, r, c, v))
    df = spark.createDataFrame(rows, "date date, row int, col int, value double")
    return df.withColumn("value", mask_sentinels("value"))


def _coverage(spark):
    # zone A: strict cells (0,0),(0,1); all_touched adds (1,0)
    # zone B: strict empty; all_touched (2,2)
    # zone C: nothing covered (falls back to centroid)
    rows = [("A", 0, 0, "strict"), ("A", 0, 1, "strict"),
            ("A", 1, 0, "all_touched"),
            ("B", 2, 2, "all_touched")]
    return spark.createDataFrame(
        rows, "zone_id string, row int, col int, coverage string")


def _centroids(spark):
    return spark.createDataFrame(
        [("C", 3, 3)], "zone_id string, centroid_row int, centroid_col int")


def test_zonal_cascade(spark):
    out = zonal_stats(_cells(spark), _coverage(spark), _centroids(spark))
    got = {r["zone_id"]: r for r in out.collect()}
    # A: strict cells (0,0)=0 and (0,1)=NULL(sentinel) -> mean of {0} = 0
    assert got["A"]["biomass_mean"] == 0.0
    assert got["A"]["pixel_count"] == 1
    assert not got["A"]["retried_all_touched"]
    # B: strict empty -> all_touched (2,2)=10
    assert got["B"]["biomass_mean"] == 10.0
    assert got["B"]["retried_all_touched"] and not got["B"]["used_fallback"]
    # C: no coverage at all -> centroid (3,3) is NULL -> 3x3 ring mean
    ring = [10.0, 11.0, 14.0]  # (2,2),(2,3),(3,2); (3,3) null
    assert got["C"]["used_fallback"]
    assert abs(got["C"]["biomass_mean"] - sum(ring) / 3) < 1e-9


def test_zonal_single_scan_plan(spark, tmp_path):
    # VERDICT r1 #1: the cascade must scan the cells table exactly once —
    # every tier is a conditional aggregate over one broadcast join, not a
    # per-tier join/scan. Assert on the physical plan of a parquet source.
    path = str(tmp_path / "cells")
    _cells(spark).write.mode("overwrite").parquet(path)
    cells = spark.read.parquet(path)
    plan = zonal_stats(cells, _coverage(spark), _centroids(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "BroadcastHashJoin" in plan


def test_zone_series_nan_to_zero(spark):
    # a zone whose every covered cell is nodata -> biomass 0.0 at the sink
    cells = spark.createDataFrame(
        [(D1, 0, 0, None)], "date date, row int, col int, value double")
    cov = spark.createDataFrame([("Z", 0, 0, "strict")],
                                "zone_id string, row int, col int, coverage string")
    out = zone_series(cells, cov).collect()
    assert out[0]["biomass"] == 0.0


def test_rasterize_dense_fill(spark):
    pts = spark.createDataFrame(
        [(36.02, 14.98, D1, 1.234), (36.02, 14.98, D1, 2.346),  # same cell
         (36.07, 14.98, D1, -0.5)],                              # abs -> 0.5
        "lon double, lat double, date date, biom double")
    out = rasterize_points(pts, spark, dense=True)
    assert out.count() == 260 * 300  # full frame for the single date
    got = {(r["row"], r["col"]): r["value"]
           for r in out.where("value != -99999.0").collect()}
    # collision resolved by mean of round(abs(v), 2)
    assert abs(got[(0, 0)] - (1.23 + 2.35) / 2) < 1e-9
    assert got[(0, 1)] == 0.5
    assert len(got) == 2  # everything else filled with nodata
    # fill is exactly the reference sentinel
    n_nodata = out.where("value = -99999.0").count()
    assert n_nodata == 260 * 300 - 2


def test_rasterize_sparse_and_manifest(spark):
    pts = spark.createDataFrame(
        [(36.02, 14.98, D1, 1.0), (36.02, 14.98, dt.date(2024, 2, 1), 0.0)],
        "lon double, lat double, date date, biom double")
    sparse = rasterize_points(pts, spark, dense=False)
    got = {(r["date"]): r["value"] for r in sparse.collect()}
    assert got[D1] == 1.0
    assert got[dt.date(2024, 2, 1)] == -99999.0  # <=0 -> nodata
    names = {r["filename"] for r in manifest(pts).collect()}
    assert names == {"biomass_20240116.tif", "biomass_20240201.tif"}


def test_full_grid_shape(spark):
    g = full_grid(spark, 3, 4)
    assert g.count() == 12
    assert g.agg(F.max("row"), F.max("col")).collect()[0][0:2] == (2, 3)
