"""Unit tests for TWAP and resample-ffill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from lswms_forage_etl_spark.operators.timeseries import (
    resample_ffill_daily,
    time_weighted_daily,
)

SCHEMA = "event_id long, ts timestamp, user_id long, value double"
D1 = dt.datetime(2024, 1, 1)


def test_twap_interval_weights(spark):
    # user 1: value 1.0 for 6h, then 3.0 for the remaining 18h
    ev = spark.createDataFrame(
        [(1, D1, 1, 1.0),
         (2, D1 + dt.timedelta(hours=6), 1, 3.0)], SCHEMA)
    r = time_weighted_daily(ev).collect()[0]
    assert r["sec_covered"] == 86400
    # twap = (10000*21600 + 30000*64800) // 86400 = 25000
    assert r["twap4"] == 25000
    assert r["n_events"] == 2


def test_twap_last_event_holds_to_midnight(spark):
    ev = spark.createDataFrame(
        [(1, D1 + dt.timedelta(hours=23), 1, 2.0)], SCHEMA)
    r = time_weighted_daily(ev).collect()[0]
    assert r["sec_covered"] == 3600
    assert r["twap4"] == 20000


def test_resample_ffill_carries_and_nulls(spark):
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 5), 1, 5.0),
         (2, dt.datetime(2024, 1, 2, 9), 1, 7.0),   # later same day wins
         (3, dt.datetime(2024, 1, 4, 1), 1, 9.0)], SCHEMA)
    out = {r["day"].isoformat(): r for r in
           resample_ffill_daily(ev, dt.date(2024, 1, 1),
                                dt.date(2024, 1, 5)).collect()}
    assert len(out) == 5
    assert out["2024-01-01"]["v4_filled"] is None      # before activity
    assert out["2024-01-02"]["v4_filled"] == 70000     # last of the day
    assert out["2024-01-03"]["v4_filled"] == 70000     # carried
    assert out["2024-01-03"]["observed"] is False
    assert out["2024-01-04"]["v4_filled"] == 90000
    assert out["2024-01-05"]["v4_filled"] == 90000


def test_cdc_apply_latest_wins_and_tombstones(spark):
    from lswms_forage_etl_spark.operators.timeseries import cdc_apply
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: upsert, upsert -> survives with last value
        (1, t, 10, 1.0, "U"), (1, t + s, 11, 2.5, "U"),
        # user 2: upsert then DELETE last -> gone from snapshot
        (2, t, 20, 3.0, "U"), (2, t + s, 21, 0.0, "D"),
        # user 3: delete then resurrect -> survives, n_deletes = 1
        (3, t, 30, 4.0, "D"), (3, t + s, 31, 5.0, "U"),
        # user 4: same-ts tie broken by event_id DESC
        (4, t, 40, 6.0, "U"), (4, t, 41, 7.0, "U"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "value double, op string")
    out = {r["user_id"]: r for r in cdc_apply(df).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["last_v4"] == 25000 and out[1]["n_changes"] == 2
    assert out[1]["n_deletes"] == 0
    assert out[3]["last_v4"] == 50000 and out[3]["n_deletes"] == 1
    assert out[4]["last_event_id"] == 41 and out[4]["last_v4"] == 70000


def test_merge_intervals_islands(spark):
    from lswms_forage_etl_spark.operators.timeseries import (
        merge_intervals)
    t = dt.datetime(2024, 1, 1)

    def iv(u, m0, m1, eid):
        return (u, eid, t + dt.timedelta(minutes=m0),
                t + dt.timedelta(minutes=m1))

    rows = [
        iv(1, 0, 10, 1), iv(1, 5, 20, 2),     # overlap -> one island
        iv(1, 30, 40, 3),                     # gap -> new island
        iv(1, 35, 36, 4),                     # contained
        iv(2, 0, 5, 5), iv(2, 5, 9, 6),       # touching (half-open:
                                              # s == prev end merges)
        iv(3, 0, 1, 7), iv(3, 0, 1, 8),       # exact duplicates
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, start timestamp, "
              "end timestamp")
    out = {(r["user_id"], r["island"]): r
           for r in merge_intervals(df, order_cols=("event_id",))
           .collect()}
    e = int(t.timestamp())
    assert out[(1, 1)]["start_s"] == e and out[(1, 1)]["end_s"] == e + 1200
    assert out[(1, 1)]["n_merged"] == 2
    assert out[(1, 2)]["start_s"] == e + 1800
    assert out[(1, 2)]["end_s"] == e + 2400 and out[(1, 2)]["n_merged"] == 2
    assert out[(2, 1)]["n_merged"] == 2 and out[(2, 1)]["end_s"] == e + 540
    assert out[(3, 1)]["n_merged"] == 2 and len(
        [k for k in out if k[0] == 3]) == 1


def test_merge_intervals_tied_duplicates_deterministic(spark):
    """ADVICE r12 medium: with tied (start,end) rows, the island
    cumulative-sum window must use the SAME total order as the
    boundary-flag window, or a _new=0 twin can sort before its _new=1
    twin and join the PREVIOUS island. Construct the trap: island A,
    then a gap, then exact-duplicate intervals opening island B —
    under any tie resolution the duplicates must both land in B, and
    the result must be invariant to input order and partitioning."""
    from lswms_forage_etl_spark.operators.timeseries import (
        merge_intervals)
    t = dt.datetime(2024, 1, 1)

    def iv(u, m0, m1, eid):
        return (u, eid, t + dt.timedelta(minutes=m0),
                t + dt.timedelta(minutes=m1))

    rows = [iv(1, 0, 10, 1),                    # island 1
            iv(1, 30, 40, 2), iv(1, 30, 40, 3),  # tied twins: island 2
            iv(1, 30, 40, 4)]
    schema = ("user_id long, event_id long, start timestamp, "
              "end timestamp")
    want = None
    for perm in ([0, 1, 2, 3], [3, 2, 1, 0], [1, 3, 0, 2]):
        df = spark.createDataFrame([rows[i] for i in perm], schema) \
            .repartition(4)
        got = sorted(
            (r["island"], r["start_s"], r["end_s"], r["n_merged"])
            for r in merge_intervals(df, order_cols=("event_id",))
            .collect())
        if want is None:
            want = got
        assert got == want, perm
    e = int(t.timestamp())
    assert want == [(1, e, e + 600, 1),
                    (2, e + 1800, e + 2400, 3)]
