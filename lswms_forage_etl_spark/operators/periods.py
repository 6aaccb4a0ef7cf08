"""W1 — 16-day tumbling composite windows with year-boundary reset.

Reference semantics (`get_composite_periods`, data_extraction_v2.py:85-106):
periods of `length` days walk forward from `series_start`; a period that
would cross Dec 31 is truncated so its end is forced to Jan 1 of the next
year (the next period then starts Jan 2); only periods whose end is <=
`current_date` (i.e. fully elapsed) are emitted — the incomplete tail is
dropped.

Spark's `window(col, '16 days')` aligns buckets to a fixed epoch origin and
cannot express the year reset, so the engine materializes the (tiny) period
table on the driver — O(days/16) rows, a few hundred per decade — and
assigns buckets with `assign_period`'s BLOCK-KEY BROADCAST HASH JOIN:
periods explode to one row per covered 16-day block, facts compute their
block key arithmetically, and the equi-join broadcasts the tiny block
table (a naive BETWEEN range join would plan as a broadcast nested loop —
every fact row probing every period). At 100 TB the fact side streams
through untouched; no shuffle is introduced by bucketing.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lswms_forage_etl_spark.schemas import PERIODS


def composite_periods(series_start: dt.date, current_date: dt.date,
                      length_days: int = 16,
                      year_reset: bool = True) -> list[tuple[int, dt.date, dt.date]]:
    """Replay the reference walk; returns [(period_id, start, end), ...].

    Property-tested against a transliteration of the reference function
    (tests/test_periods.py) including the year-reset and drop-incomplete-tail
    rules.
    """
    out: list[tuple[int, dt.date, dt.date]] = []
    start = series_start
    pid = 0
    while True:
        end = start + dt.timedelta(days=length_days - 1)
        if year_reset and end.year > start.year:
            end = dt.date(start.year + 1, 1, 1)
        if end > current_date:
            break  # incomplete tail dropped (reference :99-101)
        out.append((pid, start, end))
        pid += 1
        start = end + dt.timedelta(days=1)
    return out


def periods_df(spark: SparkSession, series_start: dt.date, current_date: dt.date,
               length_days: int = 16, year_reset: bool = True) -> DataFrame:
    rows = composite_periods(series_start, current_date, length_days, year_reset)
    from lswms_forage_etl_spark.lifecycle import local_df
    return local_df(spark, rows, PERIODS)


def assign_period(df: DataFrame,
                  periods: DataFrame | list[tuple[int, dt.date, dt.date]],
                  date_col: str = "date",
                  length_days: int = 16) -> DataFrame:
    """Tag each row with its composite period.

    Implemented as a broadcast **hash** join on a coarse block key —
    `floor(days_since_epoch / length_days)` — with the tiny period table
    expanded to one row per overlapped block (each period spans <= 2
    blocks), plus a residual between-filter. A plain range join would be a
    BroadcastNestedLoopJoin: O(periods) struct comparisons per fact row
    and no codegen hash probe; the block trick keeps the fact side
    streaming through whole-stage codegen with one O(1) probe per row.

    Rows outside every period (e.g. after the last complete window) are
    dropped — matching the reference's only-complete-windows contract.
    """
    epoch = dt.date(1970, 1, 1)
    if isinstance(periods, DataFrame):
        rows = [(r["period_id"], r["start"], r["end"])
                for r in periods.collect()]  # tiny: O(days/16) rows
    else:
        rows = list(periods)
    expanded = []
    for pid, start, end in rows:
        b0 = (start - epoch).days // length_days
        b1 = (end - epoch).days // length_days
        for b in range(b0, b1 + 1):
            expanded.append((b, pid, start, end))
    from lswms_forage_etl_spark.lifecycle import local_df
    exp_df = local_df(
        df.sparkSession, expanded,
        "_block long, period_id int, start date, end date")
    block = F.floor(F.datediff(F.col(date_col), F.lit(epoch))
                    / length_days).cast("long")
    return (df.withColumn("_b", block)
            .join(F.broadcast(exp_df), F.col("_b") == F.col("_block"))
            .where((F.col(date_col) >= F.col("start"))
                   & (F.col(date_col) <= F.col("end")))
            .drop("_b", "_block"))
