"""§2.10 — the incremental/streaming layer.

The reference is an *incremental batch* pipeline with streaming semantics
(SURVEY §2.10): resume from the last processed raster date
(data_extraction_v2.py:427-435), a 2-day availability latency buffer
(:441), emit only fully-elapsed 16-day windows (:99-101), skip
already-downloaded inputs (:202-204), and no-op cleanly on empty input
(funcs.py:5-17).

Engine form, two tiers:

  1. `incremental_composite_run` — Structured Streaming file source over
     the observation parquet directory with `trigger(availableNow)` +
     `foreachBatch`: each micro-batch applies the SAME batch operators
     (periods/composites are identical code), the checkpoint directory IS
     the resume state, and re-running after new files land processes only
     the new files — exactly-once, idempotent-skip for free. This is the
     reference-faithful incremental mode.

  2. `stream_windowed_counts` — a genuine continuous-stream surface
     (withWatermark + fixed `window()` aggregation, append mode) for the
     stream tables (`events`) where epoch-aligned windows are the right
     semantics. The W1 year-reset composite windows deliberately do NOT
     use `window()` — they can't (SURVEY §2.6 W1) — and flow through tier
     1 instead.

Completeness gating (`complete_periods_only`) is the watermark analogue
for tier 1: a period is emitted only when `end + latency <= max seen
date`, the break-on-incomplete rule at data_extraction_v2.py:99-101.
"""

from __future__ import annotations

import datetime as dt
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lswms_forage_etl_spark.schemas import RASTER_CELLS


def resume_start_date(spark: SparkSession, raster_dir: str,
                      override: dt.date | None = None,
                      default: dt.date | None = None) -> dt.date | None:
    """Resume-point derivation (A5): next start = max processed raster
    date + 1 day (data_extraction_v2.py:427-435), overridable (:428)."""
    if override is not None:
        return override
    from lswms_forage_etl_spark.sources.readers import scan_raster_filenames
    listing = scan_raster_filenames(spark, raster_dir)
    row = listing.agg(F.max("date").alias("m")).collect()[0]
    if row["m"] is None:
        return default
    return row["m"] + dt.timedelta(days=1)


def complete_periods_only(periods: DataFrame, observed_max_date: dt.date,
                          latency_days: int = 2) -> DataFrame:
    """Watermark-style completeness gate: keep only periods whose end has
    fully elapsed given the availability latency (the reference's
    break-on-incomplete + DATA_LATENCY_DAYS, :99-101,:441)."""
    cutoff = observed_max_date - dt.timedelta(days=latency_days)
    return periods.where(F.col("end") <= F.lit(cutoff))


def incremental_composite_run(
        spark: SparkSession, input_dir: str, checkpoint_dir: str,
        batch_fn: Callable[[DataFrame, int], None],
        schema=RASTER_CELLS) -> None:
    """Incremental batch over a growing parquet directory.

    readStream(file source) -> foreachBatch(batch_fn) with
    trigger(availableNow=True): processes everything not yet recorded in
    `checkpoint_dir`, then stops. Re-invocation after new files arrive
    processes ONLY the new files — the checkpoint is the resume state
    (§2.10), replacing the reference's filename-scan + skip-if-exists.

    `batch_fn(batch_df, batch_id)` runs the normal batch operators (the
    same composite/zonal/etc. functions) and writes its own sink —
    idempotent by batch_id if the sink needs exactly-once."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_dir))
    q = (stream.writeStream
         .foreachBatch(batch_fn)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_windowed_counts(events_stream: DataFrame,
                           window_duration: str = "1 hour",
                           watermark_delay: str = "2 days",
                           ts_col: str = "ts") -> DataFrame:
    """Continuous-stream surface: watermarked tumbling-window aggregation
    in append mode — late rows beyond the watermark are dropped, windows
    emit once closed (the semantics the reference approximates with its
    latency buffer). Returns the streaming DataFrame; caller attaches the
    sink."""
    return (events_stream
            .withWatermark(ts_col, watermark_delay)
            .groupBy(F.window(F.col(ts_col), window_duration),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("value_sum"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    "event_type", "n", "value_sum"))
