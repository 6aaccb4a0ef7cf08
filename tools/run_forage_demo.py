"""Run the full forage pipeline at the reference's observed scale
(BASELINE.md: 19k grid points, 78k raster cells/date, 151 zones) on
synthetic observations, and report per-stage wall times.

The reference runs this workload as ~5 sequential single-threaded scripts;
this driver executes the same dataflow as a handful of Spark jobs.

Usage: python tools/run_forage_demo.py [n_days]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from lswms_forage_etl_spark import get_spark, schemas
from lswms_forage_etl_spark.plans import forage_pipeline
from lswms_forage_etl_spark.sources.geometry import zone_coverage_from_wkt


def synth_inputs(spark, n_days: int):
    """Reference-scale synthetic observations: daily values on the full
    260x300 grid for three variables, 19k sample points, 151 square
    zones tiling the AOI."""
    start = dt.date(2024, 1, 1)
    dates = spark.createDataFrame(
        [(start + dt.timedelta(days=d),) for d in range(n_days)], "date date")
    grid = (spark.range(schemas.GRID_N_ROWS).toDF("row").crossJoin(
        spark.range(schemas.GRID_N_COLS).toDF("col"))
        .select(F.col("row").cast("int"), F.col("col").cast("int")))
    base = dates.crossJoin(grid)

    def obs(seed: int, scale: float):
        v = (F.pmod(F.xxhash64("row", "col", "date", F.lit(seed)),
                    F.lit(1000)).cast("double") / 1000.0 * scale)
        return base.select("date", "row", "col", v.alias("value"))

    rng = np.random.RandomState(7)
    n_pts = 19129
    pts = spark.createDataFrame(
        [(float(round(36.0 + rng.uniform(0, 13), 3)),
          float(round(0.0 + rng.uniform(0, 15), 3))) for _ in range(n_pts)],
        "lon double, lat double")

    # 151 square zones tiling the grid
    zones = []
    n_side = int(math.ceil(math.sqrt(151)))
    dlon, dlat = 13.0 / n_side, 15.0 / n_side
    for i in range(151):
        r, c = divmod(i, n_side)
        lo, la = 36.0 + c * dlon, 15.0 - r * dlat
        zones.append((f"ET{i:04d}",
                      f"POLYGON (({lo} {la}, {lo+dlon} {la}, {lo+dlon} "
                      f"{la-dlat}, {lo} {la-dlat}, {lo} {la}))"))
    coverage, centroids = zone_coverage_from_wkt(spark, zones)
    return {
        "ndvi_cells": obs(1, 1.0), "sm_cells": obs(2, 0.6),
        "preci_cells": obs(3, 20.0), "points": pts,
        "coverage": coverage, "centroids": centroids,
    }, start


def main():
    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    spark = get_spark("forage-demo")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    ctx, start = synth_inputs(spark, n_days)
    print(f"inputs built: {time.time()-t0:.1f}s "
          f"(zones={ctx['coverage'].select('zone_id').distinct().count()})")

    pipe = forage_pipeline(start, start + dt.timedelta(days=n_days),
                           gwr_bandwidth=60)
    t0 = time.time()
    out = pipe.run(spark, ctx)
    marks = {}
    for name, df in [("combined", out["combined"]),
                     ("results", out["results"]),
                     ("zone_series", out["zone_series"]),
                     ("forecast", out["forecast"])]:
        t1 = time.time()
        marks[name] = (df.count(), round(time.time() - t1, 1))
    total = round(time.time() - t0, 1)
    for name, (n, secs) in marks.items():
        print(f"  {name:12s} {n:>9,} rows  (+{secs}s)")
    print(f"pipeline total: {total}s for {n_days} days "
          f"({[r.status for r in pipe.results]})")


if __name__ == "__main__":
    main()
