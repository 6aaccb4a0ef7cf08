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
assigns buckets with a range join that Catalyst turns into a broadcast
nested-loop over a broadcast-sized build side. At 100 TB the fact side
streams through untouched; no shuffle is introduced by bucketing.
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
    return spark.createDataFrame(rows, PERIODS)


def assign_period(df: DataFrame, periods: DataFrame,
                  date_col: str = "date") -> DataFrame:
    """Tag each row with its composite period via a broadcast range join.

    Rows outside every period (e.g. after the last complete window) are
    dropped — matching the reference's only-complete-windows contract.
    """
    p = F.broadcast(periods)
    return df.join(
        p,
        (F.col(date_col) >= p["start"]) & (F.col(date_col) <= p["end"]),
        "inner",
    )
