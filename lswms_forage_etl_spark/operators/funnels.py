"""Event-funnel and cohort-retention analytics over event streams.

Beyond the reference surface (no event concept there — the closest
analogue is the per-date completeness scan in ``data_extraction_v2.py``
resume logic, §2.10), but core operators for the event/telemetry side of
a large-scale data platform: ordered conversion funnels, cohort
retention matrices, and typed pivots.

Scale shape (100 TB events):

* ``funnel_reach`` — each step filters events to ONE event type before
  any join (the filtered slice is a small fraction of the corpus), then
  joins on ``user_id``. Every stage shuffles on the same uniform user
  key, and reach tables shrink monotonically step over step, so the
  expensive side of each join is a pre-filtered scan with pushdown.
  No window over the full event stream, no per-user collect.
* ``cohort_retention`` — two aggregations on the user key plus one
  broadcast of per-cohort sizes (bounded by the number of cohorts, not
  users).

Ratio discipline: conversion/retention are emitted as parts-per-million
via BIGINT floor division (``n * 1_000_000 div base``) — exact and
engine-portable, no float rounding contract needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def funnel_reach(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Per-user ordered funnel: for each user, the earliest time each
    step was reached STRICTLY AFTER the previous step (classic ordered
    conversion semantics). Returns one row per user who completed step 1,
    with nullable ``t1..tk`` reach timestamps."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    reach = (events.where(F.col(type_col) == steps[0])
             .groupBy(user_col).agg(F.min(ts_col).alias("t1")))
    for i, step in enumerate(steps[1:], start=2):
        nxt = (events.where(F.col(type_col) == step)
               .join(reach.select(user_col, F.col(f"t{i-1}")), user_col)
               .where(F.col(ts_col) > F.col(f"t{i-1}"))
               .groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}")))
        reach = reach.join(nxt, user_col, "left")
    return reach


def funnel_summary(events: DataFrame, steps: list[str],
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type") -> DataFrame:
    """Funnel rollup: (step_idx, step, n_users, conv_ppm) where conv_ppm
    is the exact-integer users-retained ratio vs the previous step
    (step 1 = 1_000_000). The per-step counts are single-row aggregates;
    the lag window runs over k rows (k = number of steps), bounded."""
    reach = funnel_reach(events, steps, user_col, ts_col, type_col)
    # ONE aggregate pass over reach (a per-step union would re-execute
    # the whole reach pipeline k times), unstacked into step rows
    agg = reach.agg(*[F.count(F.col(f"t{i}")).alias(f"n{i}")
                      for i in range(1, len(steps) + 1)])
    cells = ", ".join(
        f"{i}, '{step}', n{i}" for i, step in enumerate(steps, start=1))
    counts = agg.select(F.expr(
        f"stack({len(steps)}, {cells}) as (step_idx, step, n_users)"))
    # k-row window (k = number of steps) — bounded, never corpus-sized
    w = Window.orderBy("step_idx")
    prev = F.lag("n_users").over(w)
    return counts.select(
        "step_idx", "step", "n_users",
        F.when(prev.isNull() | (prev == 0), F.lit(PPM).cast("long"))
        .otherwise(F.expr(f"(n_users * {PPM}) div lag(n_users) over "
                          f"(order by step_idx)"))
        .alias("conv_ppm"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: cohort_week = ISO week of each user's
    first event; one row per (cohort_week, week_offset) with the distinct
    active-user count and the exact-ppm retention vs the cohort size."""
    day = F.col(ts_col).cast("date")
    first = (events.groupBy(user_col)
             .agg(F.min(day).alias("first_d"))
             .withColumn("cohort_week",
                         F.date_trunc("week", F.col("first_d"))
                         .cast("date"))
             .select(user_col, "cohort_week"))
    active = (events.select(
        user_col,
        F.date_trunc("week", day).cast("date").alias("week"))
        .distinct())
    j = active.join(first, user_col)
    grid = (j.groupBy(
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7).cast("int")
        .alias("week_offset"))
        .agg(F.countDistinct(user_col).alias("n_users")))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    return (grid.join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week", "week_offset", "n_users", "cohort_size",
                    F.expr(f"(n_users * {PPM}) div cohort_size")
                    .alias("retention_ppm")))


def pivot_event_counts(events: DataFrame, event_types: list[str],
                       ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """Daily event-type pivot with an EXPLICIT type list — at scale the
    implicit form first runs a distinct scan over the corpus to discover
    pivot values; passing them keeps this a single groupBy."""
    day = F.col(ts_col).cast("date").alias("day")
    out = (events.groupBy(day)
           .pivot(type_col, event_types)
           .agg(F.count(F.lit(1))))
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
                 for t in event_types])


def unpivot_counts(pivoted: DataFrame, id_col: str,
                   value_cols: list[str],
                   key_name: str = "event_type",
                   value_name: str = "n_events") -> DataFrame:
    """UNPIVOT (melt): the inverse of `pivot_event_counts` — wide
    per-type count columns back to (id, key, value) rows via one
    `stack()` projection. Scan-side expression, zero shuffle, output
    exactly |rows| x |value_cols| (zero counts kept: the melt is
    lossless, so pivot∘unpivot round-trips)."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    return pivoted.select(
        id_col,
        F.expr(f"stack({len(value_cols)}, {pairs}) "
               f"AS ({key_name}, {value_name})"))


def markov_transitions(events: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts",
                       type_col: str = "event_type",
                       order_cols: tuple = ("event_id",)) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: count every consecutive (prev_type -> type) pair in each
    user's (ts, *order_cols)-ordered stream and emit the row-normalized
    transition probability in exact ppm — the user-journey summary next
    to funnels (which fix the path) and association rules (which ignore
    order within a session).

    Scale shape: ONE window (lag) on the uniform user key, then a
    groupBy on (src, dst) — output bounded by the type alphabet
    squared, counts aggregate map-side. No session reconstruction, no
    self-join."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    steps = (events.select(
        user_col, F.col(type_col).alias("dst_type"),
        F.lag(type_col).over(w).alias("src_type"))
        .where(F.col("src_type").isNotNull()))
    counts = (steps.groupBy("src_type", "dst_type")
              .agg(F.count(F.lit(1)).alias("n_transitions")))
    totals = (counts.groupBy("src_type")
              .agg(F.sum("n_transitions").alias("_row_total")))
    return (counts.join(F.broadcast(totals), "src_type")
            .select("src_type", "dst_type", "n_transitions",
                    F.expr(f"(n_transitions * {PPM}) div _row_total")
                    .alias("prob_ppm")))


def anomaly_flags(events: DataFrame, sigma: int = 2,
                  trailing_days: int = 7, ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Integer-exact z-score anomaly flags on daily event counts: day d
    is anomalous iff |x - mean| > sigma * stddev over the TRAILING
    `trailing_days` window — evaluated without any float by clearing
    denominators:  (m*x - s)^2 > sigma^2 * (m*sxx - s^2)  with
    m = window row count, s = sum, sxx = sum of squares. Engine-
    portable (no sqrt, no division) and safe in int64 for daily counts
    up to ~1e8 ((m*x)^2 <= 9e18). Days with an incomplete trailing
    window emit NULL. The window runs over the DAILY AGGREGATE (365
    rows/year/type), never raw events."""
    daily = (events.groupBy(type_col,
                            F.col(ts_col).cast("date").alias("day"))
             .agg(F.count(F.lit(1)).alias("n_events")))
    w = (Window.partitionBy(type_col).orderBy("day")
         .rowsBetween(-trailing_days, -1))
    x = F.col("n_events")
    s = F.sum(x).over(w)
    sxx = F.sum(x * x).over(w)
    m = F.count(x).over(w)
    lhs = (m * x - s) * (m * x - s)
    rhs = F.lit(sigma * sigma) * (m * sxx - s * s)
    return (daily.select(
        type_col, "day", "n_events",
        F.when(m == trailing_days, lhs > rhs).alias("is_anomaly")))


def session_assoc_rules(events: DataFrame, gap_minutes: int = 30,
                        min_pair_sessions: int = 2,
                        user_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type") -> DataFrame:
    """Market-basket association rules over sessions: for each ordered
    event-type pair (A -> B), support / confidence / lift from
    co-presence in the same session — all exact-integer ppm. Lift is
    the two-step floor ((conf_ppm * N) div n_B), deterministic on both
    engines and overflow-safe (conf_ppm <= 1e6, N bounded by int64/1e6).

    Scale shape: the session item sets are ONE distinct over (session,
    type) — fan-in per session bounded by the type alphabet, so the
    session-key self-join for pairs is bounded-fan (|types|^2 rows per
    session max). Pair/antecedent counts are two-phase aggregates."""
    from lswms_forage_etl_spark.operators.sessions import sessionize
    s = sessionize(events, gap_minutes, user_col, ts_col,
                   order_cols=("event_id",))
    from lswms_forage_etl_spark.lifecycle import stage_table
    # one distinct shuffle; persisted — three consumers (pair join
    # sides, item counts, session count) would re-run it otherwise
    items = stage_table(
        s.select(user_col, "session_idx", F.col(type_col).alias("item"))
        .distinct())
    n_sessions = (items.select(user_col, "session_idx").distinct()
                  .agg(F.count(F.lit(1)).alias("_N")))
    a = items.select(user_col, "session_idx", F.col("item").alias("ant"))
    b = items.select(user_col, "session_idx", F.col("item").alias("cons"))
    pairs = (a.join(b, [user_col, "session_idx"])
             .where(F.col("ant") != F.col("cons"))
             .groupBy("ant", "cons")
             .agg(F.count(F.lit(1)).alias("n_both"))
             .where(F.col("n_both") >= min_pair_sessions))
    n_item = items.groupBy(F.col("item")).agg(
        F.count(F.lit(1)).alias("n_item"))
    na = n_item.select(F.col("item").alias("ant"),
                       F.col("n_item").alias("n_ant"))
    nb = n_item.select(F.col("item").alias("cons"),
                       F.col("n_item").alias("n_cons"))
    out = (pairs.join(F.broadcast(na), "ant")
           .join(F.broadcast(nb), "cons")
           .crossJoin(F.broadcast(n_sessions)))
    conf = F.expr("(n_both * 1000000) div n_ant")
    return out.select(
        "ant", "cons", "n_both",
        F.expr("(n_both * 1000000) div _N").alias("support_ppm"),
        conf.alias("confidence_ppm"),
        F.expr("(((n_both * 1000000) div n_ant) * _N) div n_cons")
        .alias("lift_ppm"))
