"""W1 — composite-period walk property tests.

Spec (reference data_extraction_v2.py:85-106): 16-day windows from
series_start; window crossing a year boundary is truncated to end Jan 1;
only fully-elapsed windows are kept.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from lswms_forage_etl_spark.operators.periods import (
    assign_period,
    composite_periods,
    periods_df,
)


def spec_walk(start: dt.date, cur: dt.date, length: int = 16):
    """Independent re-statement of the reference walk for cross-checking."""
    out = []
    s = start
    while True:
        e = s + dt.timedelta(days=length - 1)
        if e.year != s.year:
            e = dt.date(s.year + 1, 1, 1)
        if e > cur:
            return out
        out.append((s, e))
        s = e + dt.timedelta(days=1)


@given(
    start=st.dates(dt.date(2000, 1, 1), dt.date(2030, 6, 1)),
    span=st.integers(0, 900),
    length=st.sampled_from([8, 16, 30]),
)
@settings(max_examples=200, deadline=None)
def test_matches_spec(start, span, length):
    cur = start + dt.timedelta(days=span)
    got = [(s, e) for _, s, e in composite_periods(start, cur, length)]
    assert got == spec_walk(start, cur, length)


def test_year_boundary_reset():
    ps = composite_periods(dt.date(2023, 12, 1), dt.date(2024, 3, 1))
    # the window that would cross Dec 31 must end exactly Jan 1
    crossing = [p for p in ps if p[1].year == 2023 and p[2].year == 2024]
    assert len(crossing) == 1
    assert crossing[0][2] == dt.date(2024, 1, 1)
    # and the next window starts Jan 2
    nxt = [p for p in ps if p[0] == crossing[0][0] + 1]
    assert nxt[0][1] == dt.date(2024, 1, 2)


def test_incomplete_tail_dropped():
    ps = composite_periods(dt.date(2024, 1, 1), dt.date(2024, 1, 20))
    assert len(ps) == 1  # only Jan 1-16 complete; Jan 17+ tail dropped
    assert ps[0][1:] == (dt.date(2024, 1, 1), dt.date(2024, 1, 16))


def test_empty_when_span_short():
    assert composite_periods(dt.date(2024, 1, 1), dt.date(2024, 1, 10)) == []


def test_assign_period_drops_out_of_window_rows(spark):
    periods = periods_df(spark, dt.date(2024, 1, 1), dt.date(2024, 2, 10))
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 5),), (dt.date(2024, 2, 9),)], "date date")
    tagged = assign_period(df, periods)
    rows = {r["date"]: r["period_id"] for r in tagged.collect()}
    assert rows[dt.date(2024, 1, 5)] == 0
    # Feb 9 is inside the incomplete tail -> dropped
    assert dt.date(2024, 2, 9) not in rows
