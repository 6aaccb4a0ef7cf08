"""C22 grid transforms, C2/C3 date codecs, F5 masking, F10 jitter."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lswms_forage_etl_spark.functions.cleansing import (
    biomass_calibration,
    conditional_zero_jitter,
    mask_sentinels,
)
from lswms_forage_etl_spark.functions.dates import (
    date_to_yyyymmdd,
    yyyymmdd_to_date,
)
from lswms_forage_etl_spark.functions.grid import (
    cell_to_lat,
    cell_to_lon,
    lat_to_row,
    lon_to_col,
)


def test_grid_snap_and_inverse(spark):
    # reference cell geometry: 0.05 deg, origin (36, 15); cell centers must
    # snap back to their own (row, col)
    df = spark.range(300).select(
        (F.col("id") % 260).cast("int").alias("col"),
        (F.col("id") % 300).cast("int").alias("row"))
    rt = df.select(
        "row", "col",
        lon_to_col(cell_to_lon("col")).alias("col2"),
        lat_to_row(cell_to_lat("row")).alias("row2"))
    bad = rt.where("row != row2 OR col != col2").count()
    assert bad == 0


def test_grid_known_values(spark):
    df = spark.createDataFrame([(36.0, 15.0), (36.06, 14.97), (48.99, 0.01)],
                               "lon double, lat double")
    got = df.select(lon_to_col("lon").alias("c"),
                    lat_to_row("lat").alias("r")).collect()
    assert [(g["c"], g["r"]) for g in got] == [(0, 0), (1, 0), (259, 299)]


def test_date_codec_roundtrip(spark):
    df = spark.createDataFrame(
        [(dt.date(2026, 2, 2),), (dt.date(1999, 12, 31),)], "d date")
    got = df.select(date_to_yyyymmdd("d").alias("i"),
                    yyyymmdd_to_date(date_to_yyyymmdd("d")).alias("rt")).collect()
    assert got[0]["i"] == 20260202 and got[0]["rt"] == dt.date(2026, 2, 2)
    assert got[1]["i"] == 19991231


def test_sentinel_mask(spark):
    vals = [(-99999.0,), (-9999.0,), (-8888.0,), (-32768.0,), (-1500.0,),
            (-999.0,), (0.5,)]
    df = spark.createDataFrame(vals, "v double")
    got = [r["m"] for r in
           df.select(mask_sentinels("v").alias("m")).collect()]
    assert got[:5] == [None] * 5
    assert got[5:] == [-999.0, 0.5]


def test_calibration(spark):
    df = spark.createDataFrame([(0.5,)], "pred double")
    got = df.select(biomass_calibration("pred").alias("b")).collect()[0]["b"]
    assert abs(got - (6480.2 * 0.5 - 958.6) / 1000.0) < 1e-12


def test_zero_jitter_trigger_and_skip(spark):
    # 99% zeros -> below 4% nonzero threshold -> jitter ~10% of zeros
    rows = [(i, 0.0 if i % 100 else 5.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = conditional_zero_jitter(df, "v", ["id"], seed=3)
    jittered = out.where((F.col("v") > 0) & (F.col("v") < 0.011)).count()
    assert 50 <= jittered <= 160  # ~10% of 990 zeros
    # deterministic: same seed -> same result
    out2 = conditional_zero_jitter(df, "v", ["id"], seed=3)
    assert out.exceptAll(out2).count() == 0
    # 50% nonzero -> threshold not met -> untouched
    rows2 = [(i, 0.0 if i % 2 else 5.0) for i in range(100)]
    df2 = spark.createDataFrame(rows2, "id long, v double")
    assert conditional_zero_jitter(df2, "v", ["id"]).exceptAll(df2).count() == 0
