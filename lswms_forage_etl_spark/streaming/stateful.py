"""Custom stateful streaming operators (§2.10 scale path).

Two shapes:

  * `stream_session_stats` — Structured Streaming's native
    `session_window(ts, gap)`: the streaming twin of
    `operators/sessions.py` (same gap semantics, watermark-closed).
  * `running_composite_state` — `applyInPandasWithState`: a custom
    per-key accumulator that Spark's built-in windowed aggs can't express
    (running sum AND count AND last-seen carried across micro-batches with
    explicit state). This is the pattern for any reference-style
    incremental statistic — e.g. a per-cell composite that must survive
    restarts mid-period.

State is keyed by the grouping columns, bounded by processing-time
timeouts, and checkpointed with the query — at 1000 executors each key's
state lives with its shuffle partition; no driver state."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def stream_session_stats(events_stream: DataFrame,
                         gap_minutes: int = 30,
                         watermark_delay: str = "1 hour",
                         user_col: str = "user_id",
                         ts_col: str = "ts") -> DataFrame:
    """Watermarked session-window aggregation: sessions close when the
    watermark passes start + gap; identical gap semantics to the batch
    `sessionize` (split at inactivity > gap)."""
    return (events_stream
            .withWatermark(ts_col, watermark_delay)
            .groupBy(F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
                     F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("value_sum"))
            .select(F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    user_col, "n_events", "value_sum"))


STATE_SCHEMA = StructType([
    StructField("total", DoubleType()),
    StructField("n", LongType()),
])

RUNNING_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("running_sum", DoubleType()),
    StructField("running_n", LongType()),
    StructField("running_mean", DoubleType()),
])


def _running_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += int(pdf["value"].count())
    state.update((total, n))
    yield pd.DataFrame({
        "key": [str(key[0])],
        "running_sum": [total],
        "running_n": [n],
        "running_mean": [total / n if n else None],
    })


DEDUP_STATE = StructType([StructField("seen", LongType())])
DEDUP_SCHEMA = StructType([
    StructField("fp", StringType()),
    StructField("doc_id", LongType()),
    StructField("dup_in_batch", LongType()),
])


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()       # fingerprint forgotten after the TTL
            return
        seen = state.get[0] if state.exists else 0
        keeper = None
        n = 0
        max_ts = None
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf) > 0:
                if seen == 0:
                    first = int(pdf["doc_id"].min())
                    keeper = first if keeper is None else min(keeper, first)
                if ttl_ms is not None:
                    t = pdf["ts"].max()
                    max_ts = t if max_ts is None else max(max_ts, t)
        state.update((seen + n,))
        if ttl_ms is not None and max_ts is not None:
            state.setTimeoutTimestamp(
                int(pd.Timestamp(max_ts).value // 1_000_000) + ttl_ms)
        if seen == 0 and keeper is not None:
            yield pd.DataFrame({"fp": [str(key[0])], "doc_id": [keeper],
                                "dup_in_batch": [n]})
    return _dedup_fn


def stream_exact_dedup(docs_stream: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", ts_col: str | None = None,
                       ttl_minutes: int | None = None,
                       watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: the first document ever seen per normalized-
    text fingerprint is emitted (min id inside its arrival batch); every
    later arrival of the same fingerprint — same batch or any future
    micro-batch — is suppressed by per-key GroupState. The streaming twin
    of `operators/dedup.exact_dedup`: an ingest pipeline runs this in
    front of the corpus sink so replays/backfills cannot re-admit dups.
    State is one counter per fingerprint, sharded with the shuffle
    partition — no driver state, no global set.

    Unbounded keys mean unbounded state; pass `ts_col` + `ttl_minutes` to
    bound it: a fingerprint not re-seen for the TTL (event time, advanced
    by the watermark) is dropped and a much-later duplicate would be
    re-admitted — the standard state-size/recall trade every streaming
    dedup at 100 TB makes explicit."""
    from lswms_forage_etl_spark.functions.text import fingerprint

    if ttl_minutes is not None and ts_col is None:
        raise ValueError("ttl_minutes requires ts_col (event-time TTL)")
    if ttl_minutes is None:
        src = docs_stream.select(fingerprint(text_col).alias("fp"),
                                 F.col(id_col).cast("long").alias("doc_id"))
        timeout = GroupStateTimeout.NoTimeout
        ttl_ms = None
    else:
        src = (docs_stream.withWatermark(ts_col, watermark_delay)
               .select(fingerprint(text_col).alias("fp"),
                       F.col(id_col).cast("long").alias("doc_id"),
                       F.col(ts_col).alias("ts")))
        timeout = GroupStateTimeout.EventTimeTimeout
        ttl_ms = ttl_minutes * 60_000
    return (src.groupBy("fp")
            .applyInPandasWithState(
                _make_dedup_fn(ttl_ms),
                outputStructType=DEDUP_SCHEMA,
                stateStructType=DEDUP_STATE,
                outputMode="update",
                timeoutConf=timeout))


def running_composite_state(events_stream: DataFrame,
                            key_col: str = "user_id",
                            value_col: str = "value") -> DataFrame:
    """Per-key running (sum, count, mean) carried across micro-batches via
    explicit GroupState — the engine's custom stateful-operator surface.
    Emits one updated row per key per batch (update output mode)."""
    src = events_stream.select(F.col(key_col).cast("string").alias("key"),
                               F.col(value_col).alias("value"))
    return (src.groupBy("key")
            .applyInPandasWithState(
                _running_fn,
                outputStructType=RUNNING_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
