"""A1/A2 — temporal composite aggregations over period buckets.

Reference: per-pixel mean over each 16-day window for NDVI / soil moisture
(data_extraction_v2.py:166-172, 268-290 — `reduce(ee.Reducer.mean())`) and
per-pixel sum for precipitation (`ds.sum(dim='time', skipna=True)`,
:296-319), each output row stamped with the period *end* date.

The reference loops over periods in Python, one remote reduce per window.
Here all periods aggregate in ONE shuffle: assign_period tags rows (broadcast
range join, no shuffle), then a single hash aggregation keyed on
(row, col, period) with map-side partial aggregation. Spark's sum/avg ignore
NULLs, matching `skipna=True`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.periods import assign_period


def composite(df: DataFrame, periods: DataFrame, agg: str = "mean",
              key_cols: list[str] = ("row", "col"),
              date_col: str = "date", value_col: str = "value",
              out_col: str | None = None) -> DataFrame:
    """Per-key, per-period composite. agg in {'mean', 'sum'}.

    Output: key_cols + (date = period end, out_col). One row per key per
    complete period, stamped with the period end date (reference :170,:285,
    :312-317).
    """
    out_col = out_col or f"{value_col}_{agg}"
    # mean of an all-NULL slice is NaN in xarray -> NULL here; but the
    # reference's precipitation sum is `ds.sum(skipna=True)`, which yields
    # 0.0 for an all-NaN slice — Spark sum() would yield NULL (ADVICE r1)
    agg_expr = {
        "mean": F.avg(value_col),
        "sum": F.coalesce(F.sum(value_col), F.lit(0.0)),
    }[agg]
    tagged = assign_period(df, periods, date_col)
    return (
        tagged.groupBy(*key_cols, "period_id", "end")
        .agg(agg_expr.alias(out_col))
        .withColumnRenamed("end", date_col)
        .drop("period_id")
    )


def mean_composite(df: DataFrame, periods: DataFrame, **kw) -> DataFrame:
    """A1 — NDVI_mean / sm_surface_mean shape."""
    return composite(df, periods, agg="mean", **kw)


def sum_composite(df: DataFrame, periods: DataFrame, **kw) -> DataFrame:
    """A2 — precipitation_sum shape."""
    return composite(df, periods, agg="sum", **kw)
