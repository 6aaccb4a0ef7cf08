"""J1/J2 joins and A1/A2 composite aggregations on fixture-shaped data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.composite import (
    mean_composite,
    sum_composite,
)
from lswms_forage_etl_spark.operators.joins import (
    merge_point_tables,
    sample_raster_at_points,
)
from lswms_forage_etl_spark.operators.periods import periods_df

D1 = dt.date(2024, 1, 16)


def test_merge_point_tables_rounds_then_joins(spark):
    # float drift below the 3-dp rounding must not break the join
    a = spark.createDataFrame(
        [(39.4100001, 3.271, D1, 0.2)], "lon double, lat double, date date, ndvi double")
    b = spark.createDataFrame(
        [(39.4099999, 3.271, D1, 0.05)], "lon double, lat double, date date, sm double")
    c = spark.createDataFrame(
        [(39.41, 3.2710004, D1, 0.0)], "lon double, lat double, date date, preci double")
    out = merge_point_tables([a, b, c]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ndvi"], r["sm"], r["preci"]) == (0.2, 0.05, 0.0)
    # row lost when one variable is missing (reference: 19,129 -> 19,125)
    b2 = spark.createDataFrame([], b.schema)
    assert merge_point_tables([a, b2, c]).count() == 0


def test_sample_raster_at_points_snap_join(spark):
    pts = spark.createDataFrame(
        [(36.02, 14.98, "p1"), (36.27, 14.73, "p2")],
        "lon double, lat double, pid string")
    cells = spark.createDataFrame(
        [(D1, 0, 0, 1.5), (D1, 5, 5, 2.5), (dt.date(2024, 2, 1), 0, 0, 9.0)],
        "date date, row int, col int, value double")
    out = sample_raster_at_points(pts, cells)
    got = {(r["pid"], r["date"]): r["value"] for r in out.collect()}
    assert got[("p1", D1)] == 1.5
    assert got[("p2", D1)] == 2.5           # (36.27,14.73) -> row 5, col 5
    assert got[("p1", dt.date(2024, 2, 1))] == 9.0


def test_mean_and_sum_composites(spark):
    periods = periods_df(spark, dt.date(2024, 1, 1), dt.date(2024, 2, 10))
    rows = [
        # cell (0,0), period 1 (Jan 1-16): values 1, 3, null -> mean 2, sum 4
        (dt.date(2024, 1, 2), 0, 0, 1.0),
        (dt.date(2024, 1, 10), 0, 0, 3.0),
        (dt.date(2024, 1, 16), 0, 0, None),
        # cell (0,0), period 2 (Jan 17-Feb 1): single value
        (dt.date(2024, 1, 20), 0, 0, 10.0),
        # outside any complete period -> dropped
        (dt.date(2024, 2, 9), 0, 0, 99.0),
    ]
    df = spark.createDataFrame(rows, "date date, row int, col int, value double")
    m = {(r["row"], r["col"], r["date"]): r["value_mean"]
         for r in mean_composite(df, periods).collect()}
    s = {(r["row"], r["col"], r["date"]): r["value_sum"]
         for r in sum_composite(df, periods).collect()}
    # stamped with period END dates
    assert m[(0, 0, dt.date(2024, 1, 16))] == 2.0
    assert s[(0, 0, dt.date(2024, 1, 16))] == 4.0
    assert m[(0, 0, dt.date(2024, 2, 1))] == 10.0
    assert len(m) == 2 and len(s) == 2


def test_sum_composite_all_null_slice_is_zero(spark):
    # xarray ds.sum(dim='time', skipna=True) gives 0.0 for an all-NaN
    # slice (reference :296-319); mean stays NULL (NaN). ADVICE r1.
    periods = periods_df(spark, dt.date(2024, 1, 1), dt.date(2024, 2, 10))
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 2), 0, 0, None), (dt.date(2024, 1, 10), 0, 0, None)],
        "date date, row int, col int, value double")
    s = sum_composite(df, periods).collect()
    assert len(s) == 1 and s[0]["value_sum"] == 0.0
    m = mean_composite(df, periods).collect()
    assert len(m) == 1 and m[0]["value_mean"] is None


def test_composite_no_per_period_loop_one_shuffle(spark):
    # plan sanity: a single hash aggregate over the bucket join — no union
    # of per-period subplans
    periods = periods_df(spark, dt.date(2024, 1, 1), dt.date(2024, 12, 31))
    df = spark.createDataFrame(
        [(dt.date(2024, 3, 3), 0, 0, 1.0)], "date date, row int, col int, value double")
    plan = mean_composite(df, periods)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial+final (+AQE variants)
    assert "Union" not in plan
