"""Unit tests for event-funnel / cohort-retention analytics
(operators/funnels.py) on hand-computable fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.funnels import (
    cohort_retention,
    funnel_reach,
    funnel_summary,
    pivot_event_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, t)
         for i, (d, h, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string")


def test_funnel_strict_ordering(spark):
    # u1 completes in order; u2 clicks BEFORE viewing (click must not
    # count); u3 views only; u4 never views (excluded from step 1)
    ev = _ev(spark, [
        (1, 1, 1, "view"), (1, 2, 1, "click"), (2, 3, 1, "purchase"),
        (1, 1, 2, "click"), (1, 2, 2, "view"), (1, 3, 2, "click"),
        (1, 5, 3, "view"),
        (1, 1, 4, "purchase"),
    ])
    reach = {r["user_id"]: r for r in
             funnel_reach(ev, ["view", "click", "purchase"]).collect()}
    assert set(reach) == {1, 2, 3}
    assert reach[1]["t3"] == dt.datetime(2024, 1, 2, 3)
    # u2's only counted click is the one AFTER the view
    assert reach[2]["t2"] == dt.datetime(2024, 1, 1, 3)
    assert reach[2]["t3"] is None
    assert reach[3]["t2"] is None

    s = {r["step"]: r for r in
         funnel_summary(ev, ["view", "click", "purchase"]).collect()}
    assert (s["view"]["n_users"], s["click"]["n_users"],
            s["purchase"]["n_users"]) == (3, 2, 1)
    assert s["view"]["conv_ppm"] == 1_000_000
    assert s["click"]["conv_ppm"] == 2 * 1_000_000 // 3
    assert s["purchase"]["conv_ppm"] == 500_000


def test_funnel_same_timestamp_not_counted(spark):
    # strict > : a click at exactly the view instant does not convert
    ev = _ev(spark, [(1, 1, 1, "view"), (1, 1, 1, "click")])
    r = funnel_reach(ev, ["view", "click"]).collect()[0]
    assert r["t2"] is None


def test_cohort_retention_grid(spark):
    # u1 first active week of Jan 1 (Mon), returns week of Jan 8;
    # u2 only week 1; u3 first active week 2
    ev = _ev(spark, [
        (1, 1, 1, "view"), (8, 1, 1, "view"),
        (2, 1, 2, "view"),
        (9, 1, 3, "view"),
    ])
    rows = {(r["cohort_week"].isoformat(), r["week_offset"]): r
            for r in cohort_retention(ev).collect()}
    w1, w2 = "2024-01-01", "2024-01-08"
    assert rows[(w1, 0)]["n_users"] == 2
    assert rows[(w1, 0)]["retention_ppm"] == 1_000_000
    assert rows[(w1, 1)]["n_users"] == 1
    assert rows[(w1, 1)]["retention_ppm"] == 500_000
    assert rows[(w2, 0)]["n_users"] == 1
    assert rows[(w2, 0)]["cohort_size"] == 1


def test_pivot_counts_fill_zero(spark):
    ev = _ev(spark, [
        (1, 1, 1, "view"), (1, 2, 2, "view"), (1, 3, 1, "click"),
        (2, 1, 1, "view"),
    ])
    out = {r["day"].isoformat(): r for r in
           pivot_event_counts(ev, ["view", "click", "purchase"]).collect()}
    assert out["2024-01-01"]["view"] == 2
    assert out["2024-01-01"]["click"] == 1
    assert out["2024-01-01"]["purchase"] == 0
    assert out["2024-01-02"]["view"] == 1
    # explicit value list means unseen types still appear as columns
    assert set(out["2024-01-02"].asDict()) == {
        "day", "view", "click", "purchase"}


def test_anomaly_flags_integer_zscore(spark):
    from lswms_forage_etl_spark.operators.funnels import anomaly_flags
    # 7 flat days at 10 events, then a 40-event spike on day 8
    rows = []
    eid = 0
    for d in range(1, 9):
        n = 10 if d <= 7 else 40
        for i in range(n):
            rows.append((eid, dt.datetime(2024, 1, d, i % 24), 1, "view"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r["day"].isoformat(): r
           for r in anomaly_flags(ev, sigma=2, trailing_days=7).collect()}
    # zero-variance trailing window + deviation -> flagged
    assert got["2024-01-08"]["is_anomaly"] is True
    # incomplete trailing windows emit NULL, never a verdict
    assert all(got[f"2024-01-0{d}"]["is_anomaly"] is None
               for d in range(1, 8))
    assert got["2024-01-08"]["n_events"] == 40


def test_session_assoc_rules_exact(spark):
    from lswms_forage_etl_spark.lifecycle import release_tracked
    from lswms_forage_etl_spark.operators.funnels import (
        session_assoc_rules)
    # 3 single-session users: {view,click} x2 sessions, {view} x1
    ev = _ev(spark, [
        (1, 1, 1, "view"), (1, 1, 1, "click"),
        (2, 1, 2, "view"), (2, 1, 2, "click"),
        (3, 1, 3, "view"),
    ])
    rows = {(r["ant"], r["cons"]): r for r in
            session_assoc_rules(ev, min_pair_sessions=1).collect()}
    release_tracked()
    # N=3 sessions; n(view)=3, n(click)=2, n(view,click)=2
    r = rows[("view", "click")]
    assert r["n_both"] == 2
    assert r["support_ppm"] == 2 * 1_000_000 // 3
    assert r["confidence_ppm"] == 2 * 1_000_000 // 3
    assert r["lift_ppm"] == (2 * 1_000_000 // 3) * 3 // 2  # = 1.0x
    r2 = rows[("click", "view")]
    assert r2["confidence_ppm"] == 1_000_000  # every click-session views


def test_markov_transitions_exact(spark):
    from lswms_forage_etl_spark.operators.funnels import (
        markov_transitions)
    # u1: view -> click -> view ; u2: view -> purchase
    ev = _ev(spark, [
        (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "view"),
        (2, 1, 2, "view"), (2, 2, 2, "purchase"),
    ])
    rows = {(r["src_type"], r["dst_type"]): r for r in
            markov_transitions(ev).collect()}
    # transitions: view->click, click->view, view->purchase
    assert set(rows) == {("view", "click"), ("click", "view"),
                         ("view", "purchase")}
    assert rows[("view", "click")]["n_transitions"] == 1
    # view row total = 2 -> each view-transition prob = 500000 ppm
    assert rows[("view", "click")]["prob_ppm"] == 500_000
    assert rows[("view", "purchase")]["prob_ppm"] == 500_000
    assert rows[("click", "view")]["prob_ppm"] == 1_000_000


def test_unpivot_inverts_pivot(spark):
    from lswms_forage_etl_spark.operators.funnels import (
        pivot_event_counts, unpivot_counts)
    ev = _ev(spark, [
        (1, 1, 1, "view"), (1, 2, 2, "view"), (1, 3, 1, "click"),
        (2, 1, 1, "view"),
    ])
    types = ["click", "view", "purchase"]
    wide = pivot_event_counts(ev, types)
    tall = unpivot_counts(wide, "day", types)
    got = {(str(r["day"]), r["event_type"]): r["n_events"]
           for r in tall.collect()}
    # lossless melt: |days| x |types| rows, zeros kept
    assert len(got) == 2 * 3
    assert got[("2024-01-01", "view")] == 2
    assert got[("2024-01-01", "click")] == 1
    assert got[("2024-01-01", "purchase")] == 0
    assert got[("2024-01-02", "view")] == 1
    # round-trip: re-pivoting the tall table reproduces the wide one
    repivot = (tall.groupBy("day").pivot("event_type", types)
               .sum("n_events"))
    assert sorted(map(tuple, repivot.collect())) \
        == sorted(map(tuple, wide.collect()))
