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


def test_session_pattern_match_semantics(spark):
    """MATCH_RECOGNIZE-lite: the v[^e]*c[^e]*p pattern fires only when
    view->click->purchase occur in order within ONE session with no
    error between; sessions split at the gap."""
    import datetime as dt

    from lswms_forage_etl_spark.operators.sessions import (
        session_pattern_match)
    t = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1, session 1: v c p -> match
        (1, t, 1, "view"), (1, t + m, 2, "click"),
        (1, t + 2 * m, 3, "purchase"),
        # user 2: v e c p -> error between view and click: no match
        (2, t, 4, "view"), (2, t + m, 5, "error"),
        (2, t + 2 * m, 6, "click"), (2, t + 3 * m, 7, "purchase"),
        # user 3: v c ... 40-minute gap ... p -> split sessions: no match
        (3, t, 8, "view"), (3, t + m, 9, "click"),
        (3, t + 41 * m, 10, "purchase"),
        # user 4: interleaved signups don't block: v s c s p -> match
        (4, t, 11, "view"), (4, t + m, 12, "signup"),
        (4, t + 2 * m, 13, "click"), (4, t + 3 * m, 14, "signup"),
        (4, t + 4 * m, 15, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string")
    out = {(r["user_id"], r["session_idx"]): r
           for r in session_pattern_match(
               df, r"v[^e]*c[^e]*p",
               {"view": "v", "click": "c", "purchase": "p",
                "error": "e", "signup": "s"}).collect()}
    assert out[(1, 1)]["matched"] and out[(1, 1)]["seq"] == "vcp"
    assert not out[(2, 1)]["matched"] and out[(2, 1)]["seq"] == "vecp"
    assert not out[(3, 1)]["matched"] and (3, 2) in out
    assert not out[(3, 2)]["matched"]
    assert out[(4, 1)]["matched"] and out[(4, 1)]["seq"] == "vscsp"
