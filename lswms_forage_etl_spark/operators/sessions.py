"""Gap-based sessionization over event streams.

Beyond the reference surface (it has no event/session concept) but a core
operator for the training-data/event pipelines this engine targets: group
a user's events into sessions split at inactivity gaps.

Relational form — two window functions, one shuffle on the user key:

    new_session = (ts - lag(ts) over user-ordered) > gap  (or first event)
    session_idx = running sum of new_session over the same window

At 100 TB this is the canonical "shuffle once on user_id, then linear
scan per partition" shape; Structured Streaming's
`session_window(ts, gap)` is the streaming twin (same semantics,
watermark-closed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               order_cols: tuple[str, ...] = ()) -> DataFrame:
    """Add (session_idx, is_session_start) per user. Deterministic given a
    total per-user order (pass tie-break columns via order_cols)."""
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap_s = gap_minutes * 60
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts))
           > gap_s), 1).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (events
            .withColumn("is_session_start", new_sess == 1)
            .withColumn("session_idx",
                        F.sum(new_sess).over(running).cast("int")))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  order_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-session rollup: span, event count, value sum."""
    s = sessionize(events, gap_minutes, user_col, ts_col, order_cols)
    return (s.groupBy(user_col, "session_idx")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events")))


def session_pattern_match(events: DataFrame, pattern: str,
                          codes: dict[str, str],
                          gap_minutes: int = 30,
                          user_col: str = "user_id",
                          ts_col: str = "ts",
                          type_col: str = "event_type",
                          order_cols: tuple[str, ...] = ("event_id",),
                          ) -> DataFrame:
    """MATCH_RECOGNIZE-lite: per session, encode the ordered event-type
    stream as one character per event (via `codes`; unknown types
    become '?') and test a regex over it — the idiomatic Spark
    re-expression of row-pattern matching (sequence detection like
    "a view, then a click, then a purchase, with no error between" is
    `v[^e]*c[^e]*p` over the code string). One shuffle on the user key
    (sessionize + per-session aggregate share it); the regex runs on
    session-bounded strings, never across rows.

    Both engines use RE2-compatible pattern syntax (character classes,
    `*`/`+`, anchors) — keep patterns inside that common subset so the
    DuckDB oracle replays the match bit-for-bit.

    Emits (user, session_idx, n_events, seq, matched)."""
    code_col = F.create_map(
        *[F.lit(x) for kv in codes.items() for x in kv])[F.col(type_col)]
    s = sessionize(events, gap_minutes, user_col, ts_col, order_cols)
    order_struct = F.struct(
        F.col(ts_col), *[F.col(c) for c in order_cols],
        F.coalesce(code_col, F.lit("?")).alias("_c"))
    seq = F.concat_ws("", F.transform(
        F.array_sort(F.collect_list(order_struct)), lambda r: r["_c"]))
    return (s.groupBy(F.col(user_col), "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"), seq.alias("seq"))
            .withColumn("matched", F.col("seq").rlike(pattern)))
