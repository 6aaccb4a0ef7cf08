"""Gap-based sessionization against hand-computed session boundaries."""

from __future__ import annotations

import datetime as dt

from lswms_forage_etl_spark.operators.sessions import sessionize, session_stats

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark):
    # user 1: events at +0, +10min, +50min (gap>30 -> split), +55min
    # user 2: single event
    rows = [
        (1, 1, T0), (1, 2, T0 + dt.timedelta(minutes=10)),
        (1, 3, T0 + dt.timedelta(minutes=50)),
        (1, 4, T0 + dt.timedelta(minutes=55)),
        (2, 5, T0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp")


def test_sessionize_boundaries(spark):
    out = sessionize(_events(spark), gap_minutes=30,
                     order_cols=("event_id",)).collect()
    by_event = {r["event_id"]: r for r in out}
    assert by_event[1]["session_idx"] == 1 and by_event[1]["is_session_start"]
    assert by_event[2]["session_idx"] == 1 and not by_event[2]["is_session_start"]
    assert by_event[3]["session_idx"] == 2 and by_event[3]["is_session_start"]
    assert by_event[4]["session_idx"] == 2
    assert by_event[5]["session_idx"] == 1


def test_session_stats(spark):
    out = session_stats(_events(spark), gap_minutes=30,
                        order_cols=("event_id",)).collect()
    got = {(r["user_id"], r["session_idx"]): r for r in out}
    assert got[(1, 1)]["n_events"] == 2
    assert got[(1, 2)]["n_events"] == 2
    assert got[(1, 2)]["session_start"] == T0 + dt.timedelta(minutes=50)
    assert got[(2, 1)]["n_events"] == 1


def test_exact_gap_is_same_session(spark):
    # gap exactly == threshold stays in the same session (> not >=)
    rows = [(1, 1, T0), (1, 2, T0 + dt.timedelta(minutes=30))]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = {r["event_id"]: r["session_idx"]
           for r in sessionize(df, gap_minutes=30).collect()}
    assert out[1] == out[2] == 1
