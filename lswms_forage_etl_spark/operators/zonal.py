"""J4/A3/M4 — zonal statistics with the reference's fallback cascade.

Reference (BiomassAggregate.py:189-311): per raster date, per zone polygon,
`zonal_stats(..., stats=['mean','count'])`; if the strict rasterization
covers 0 cells retry with `all_touched=True` (:236-248); if still empty
sample the centroid pixel (:251-271), and if that pixel is nodata average
its 3x3 neighborhood (:260-267). O(dates x zones) Python loop, one raster
read per date.

Engine form: polygon geometry is decomposed ONCE into a zone->cell coverage
table (zone_id, row, col, coverage in {'strict','all_touched'}) plus a
centroid table (FIXTURES.md §7). Then the whole cascade is three shuffled-
once aggregations + a coalesce — no per-row Python, no retry loop:

  strict    = cells ⋈ coverage[strict]      -> groupBy(zone,date).avg,count
  touched   = cells ⋈ coverage[all_touched] -> groupBy(zone,date).avg,count
  centroid  = cells ⋈ centroid 3x3 window   -> groupBy(zone,date).avg
  result    = coalesce(strict.mean, touched.mean, centroid.mean)

The coverage side (~151 zones x <=78k cells) broadcasts; the raster-cell
side — the scale dimension — is scanned once per variant with partition
pruning on date, and each agg is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _zonal_agg(cells: DataFrame, coverage: DataFrame,
               value_col: str, suffix: str) -> DataFrame:
    j = cells.join(F.broadcast(coverage), ["row", "col"], "inner")
    return j.groupBy("zone_id", "date").agg(
        F.avg(value_col).alias(f"mean_{suffix}"),
        F.count(value_col).alias(f"count_{suffix}"),
    )


def zonal_stats(cells: DataFrame, coverage: DataFrame,
                centroids: DataFrame | None = None,
                value_col: str = "value",
                neighborhood: int = 1) -> DataFrame:
    """Full M4 cascade. cells: (date,row,col,value) with sentinels already
    NULLed (F5). coverage: ZONE_COVERAGE. centroids: ZONE_CENTROIDS.

    Returns (zone_id, date, biomass_mean, pixel_count, used_fallback,
    retried_all_touched) — the used_* flags reproduce the reference's
    diagnostics columns (BiomassAggregate.py:285-298).
    """
    strict = _zonal_agg(cells, coverage.where(F.col("coverage") == "strict")
                        .select("zone_id", "row", "col"), value_col, "strict")
    touched = _zonal_agg(cells, coverage.select("zone_id", "row", "col")
                         .distinct(), value_col, "touched")

    # full outer: a zone may appear only in one variant (e.g. centroid-only
    # zones with no rasterized coverage at all — BiomassAggregate.py:251).
    out = touched.join(strict, ["zone_id", "date"], "full")

    if centroids is not None:
        # 3x3 neighborhood around each centroid, built once on the tiny side
        # (W6): explode the (dr, dc) offsets driver-side — 9 rows per zone.
        n = neighborhood
        offsets = F.expr(
            f"flatten(transform(sequence({-n},{n}), dr -> "
            f"transform(sequence({-n},{n}), dc -> struct(dr, dc))))")
        cent_cells = (
            centroids.withColumn("o", F.explode(offsets))
            .select("zone_id",
                    (F.col("centroid_row") + F.col("o.dr")).alias("row"),
                    (F.col("centroid_col") + F.col("o.dc")).alias("col"),
                    (F.col("o.dr") == 0) & (F.col("o.dc") == 0))
            .toDF("zone_id", "row", "col", "is_center")
        )
        center = _zonal_agg(cells, cent_cells.where("is_center")
                            .select("zone_id", "row", "col"), value_col, "c0")
        ring = _zonal_agg(cells, cent_cells.select("zone_id", "row", "col"),
                          value_col, "c3")
        cent = ring.join(center, ["zone_id", "date"], "left").select(
            "zone_id", "date",
            F.coalesce(
                F.when(F.col("count_c0") > 0, F.col("mean_c0")),
                F.when(F.col("count_c3") > 0, F.col("mean_c3")),
            ).alias("mean_centroid"),
        )
        out = out.join(cent, ["zone_id", "date"], "full")
    else:
        out = out.withColumn("mean_centroid", F.lit(None).cast("double"))

    return out.select(
        "zone_id", "date",
        F.coalesce(
            F.when(F.col("count_strict") > 0, F.col("mean_strict")),
            F.when(F.col("count_touched") > 0, F.col("mean_touched")),
            F.col("mean_centroid"),
        ).alias("biomass_mean"),
        F.coalesce(F.col("count_strict"), F.lit(0)).alias("pixel_count"),
        (F.coalesce(F.col("count_strict"), F.lit(0)) == 0).alias("retried_all_touched"),
        ((F.coalesce(F.col("count_strict"), F.lit(0)) == 0)
         & (F.coalesce(F.col("count_touched"), F.lit(0)) == 0)).alias("used_fallback"),
    )


def zone_series(cells: DataFrame, coverage: DataFrame,
                centroids: DataFrame | None = None,
                value_col: str = "value") -> DataFrame:
    """The minimum end-to-end slice (SURVEY §7.3): the `woredas.csv` table
    (Dataset, Date, Biomass) with the sink-side NaN->0 fill
    (BiomassAggregate.py:325)."""
    return zonal_stats(cells, coverage, centroids, value_col).select(
        "zone_id", "date",
        F.coalesce(F.col("biomass_mean"), F.lit(0.0)).alias("biomass"),
    )
