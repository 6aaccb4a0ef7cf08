"""Schema-enforced source relations (SURVEY §2.1 S1-S13).

Every reader takes an explicit StructType — the engine's answer to the
reference's implicit column-name contracts (SURVEY §1.3): `spark.read`
with `schema(...)` enforces the contract at the scan, instead of pandas
dtype coercion after the fact (reference gwr_model.py:28-37).

Scale notes:
  * raster tables are parquet partitioned by `date` — the reference's
    filter-by-filename-date (data_extraction_v2.py:407-425) becomes
    partition pruning, visible as PartitionFilters in `.explain`.
  * sentinel masking happens IN the scan projection so downstream
    operators never see magic numbers (BiomassAggregate.py:136-148).
"""

from __future__ import annotations

import datetime as dt
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from lswms_forage_etl_spark import schemas
from lswms_forage_etl_spark.functions.cleansing import mask_sentinels


def read_csv_strict(spark: SparkSession, path: str,
                    schema: StructType, header: bool = True) -> DataFrame:
    """S8 — CSV scan with schema enforcement (no inference; a malformed
    row becomes NULLs, not a silently-widened column type)."""
    return (spark.read.schema(schema)
            .option("header", str(header).lower())
            .option("mode", "PERMISSIVE")
            .csv(path))


def read_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5 — the grid-points table (reference reads grid_points.xlsx,
    data_extraction_v2.py:353; pre-converted to CSV/parquet for the
    engine). Coordinates rounded to 3 dp — the reference's float-key
    discipline (:342,355) applied at the source."""
    df = read_csv_strict(spark, path, StructType(
        [schemas.POINT_SAMPLE["lon"], schemas.POINT_SAMPLE["lat"]]))
    return df.select(F.round("lon", 3).alias("lon"),
                     F.round("lat", 3).alias("lat"))


def read_raster_cells(spark: SparkSession, path: str,
                      start: dt.date | None = None,
                      end: dt.date | None = None,
                      mask_nodata: bool = True) -> DataFrame:
    """S10 — long-format raster scan with nodata normalization and date
    pruning. `path` is a parquet dataset partitioned by `date`; the date
    filter prunes partitions before any IO."""
    df = spark.read.schema(schemas.RASTER_CELLS).parquet(path)
    if start is not None:
        df = df.where(F.col("date") >= F.lit(start))
    if end is not None:
        df = df.where(F.col("date") <= F.lit(end))
    if mask_nodata:
        df = df.withColumn("value", mask_sentinels("value"))
    return df


_RASTER_NAME = re.compile(r"biomass_(\d{8})\.(tif|parquet)$")


def scan_raster_filenames(spark: SparkSession, directory: str) -> DataFrame:
    """A5/C13 — file-listing relation: (filename, date) for every raster
    artifact in `directory`. The listing is driver-side (it is catalog
    metadata, thousands of names at most — never data-scale); the date
    parse/max happens in the engine so resume-point derivation
    (data_extraction_v2.py:407-425) is one `agg(max(date))`."""
    names = []
    if os.path.isdir(directory):
        names = [n for n in sorted(os.listdir(directory))
                 if _RASTER_NAME.search(n)]
    from lswms_forage_etl_spark.lifecycle import local_df
    df = local_df(spark, [(n,) for n in names], "filename string")
    return df.withColumn(
        "date", F.to_date(F.regexp_extract("filename", r"(\d{8})", 1),
                          "yyyyMMdd"))
