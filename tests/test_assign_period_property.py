"""Property test: the block-key hash-join form of assign_period is
row-for-row equivalent to the naive broadcast range join, for arbitrary
(series_start, current_date, length) and observation dates."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.periods import (
    assign_period,
    composite_periods,
    periods_df,
)


@settings(max_examples=8, deadline=None)
@given(
    start_off=st.integers(min_value=0, max_value=400),
    span=st.integers(min_value=20, max_value=200),
    length=st.sampled_from([8, 16, 30]),
    date_offsets=st.lists(st.integers(min_value=-10, max_value=220),
                          min_size=1, max_size=40),
)
def test_block_join_matches_range_join(spark, start_off, span, length,
                                       date_offsets):
    base = dt.date(2023, 11, 20)  # near a year boundary on purpose
    series_start = base + dt.timedelta(days=start_off)
    current = series_start + dt.timedelta(days=span)
    periods = composite_periods(series_start, current, length_days=length)
    if not periods:
        return
    obs = spark.createDataFrame(
        [(series_start + dt.timedelta(days=o),) for o in date_offsets],
        "date date")

    fast = assign_period(obs, periods, length_days=length) \
        .select("date", "period_id")
    p = F.broadcast(periods_df(spark, series_start, current,
                               length_days=length))
    naive = obs.join(
        p, (F.col("date") >= F.col("start")) & (F.col("date") <= F.col("end")),
        "inner").select("date", "period_id")

    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, naive.collect()))
