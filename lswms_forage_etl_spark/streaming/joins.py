"""Stream-stream joins: watermarked interval attribution.

The remaining Structured Streaming join primitive next to the
stream-static enrichments in `incremental.py`: attribute each
conversion event to the triggering impression of the same user within
an attribution window — a stream-stream INNER join with BOTH sides
watermarked and a time-interval predicate, so Spark can bound the join
state (impressions age out `window + watermark` after their event
time; unmatched state is dropped, never grows).

At scale this is the canonical click-attribution topology: both streams
shuffle once on the user key, state lives in the state store keyed by
(user, time-bucket), and the watermark bounds memory regardless of
throughput. The same plan runs batch (finite DataFrames) and streaming
(readStream) — tested both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_attribution_join(
        impressions: DataFrame, conversions: DataFrame,
        window_minutes: int = 30, watermark_minutes: int = 60,
        user_col: str = "user_id") -> DataFrame:
    """conversions ⋈ impressions on user within
    (imp.ts <= conv.ts < imp.ts + window). Emits one row per
    (impression, conversion) pair inside the window; downstream
    dedup/first-touch policies are a groupBy away. Watermarks apply
    only to streaming inputs (isStreaming guards keep the operator
    usable on batch frames for oracle tests)."""
    imp = impressions.select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("imp_id"),
        F.col("ts").alias("imp_ts"))
    conv = conversions.select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"))
    if imp.isStreaming:
        imp = imp.withWatermark("imp_ts", f"{watermark_minutes} minutes")
    if conv.isStreaming:
        conv = conv.withWatermark("conv_ts",
                                  f"{watermark_minutes} minutes")
    cond = ((imp.user_id == conv.user_id)
            & (conv.conv_ts >= imp.imp_ts)
            & (conv.conv_ts
               < imp.imp_ts + F.expr(f"INTERVAL {window_minutes} MINUTES")))
    return (imp.join(conv, cond)
            .select(imp.user_id.alias("user_id"), "imp_id", "imp_ts",
                    "conv_id", "conv_ts"))
