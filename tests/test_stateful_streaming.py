"""Custom stateful streaming: session_window twin + applyInPandasWithState
running accumulator, state carried across micro-batches/restarts."""

from __future__ import annotations

import datetime as dt

from lswms_forage_etl_spark.streaming.stateful import (
    running_composite_state,
    stream_session_stats,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "user_id long, ts timestamp, value double"


def test_stream_session_window(spark, tmp_path):
    src = str(tmp_path / "ev")
    rows = [(1, T0, 1.0), (1, T0 + dt.timedelta(minutes=10), 2.0),
            (1, T0 + dt.timedelta(minutes=50), 3.0),
            (2, T0, 4.0)]
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = stream_session_stats(stream, gap_minutes=30)
    q = (agg.writeStream.format("memory").queryName("sess")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["session_start"]): r
           for r in spark.sql("SELECT * FROM sess").collect()}
    # user 1 splits at the 40-min gap -> two sessions; user 2 one
    assert len(got) == 3
    assert got[(1, T0)]["n_events"] == 2
    assert got[(1, T0 + dt.timedelta(minutes=50))]["n_events"] == 1
    assert got[(2, T0)]["value_sum"] == 4.0


def test_running_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "ev2")
    ckpt = str(tmp_path / "ckpt")

    def run_batch():
        # foreachBatch sink: supports checkpoint recovery (memory sink
        # does not); collected driver-side per micro-batch
        rows = []
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = running_composite_state(stream)
        q = (out.writeStream
             .foreachBatch(lambda df, bid: rows.extend(df.collect()))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r["key"]: r for r in rows}

    spark.createDataFrame([(1, T0, 2.0), (1, T0, 4.0)], SCHEMA) \
        .write.mode("append").parquet(src)
    got = run_batch()
    assert got["1"]["running_n"] == 2 and got["1"]["running_sum"] == 6.0
    assert got["1"]["running_mean"] == 3.0

    # second batch: state (sum, n) survives the restart via the checkpoint
    spark.createDataFrame([(1, T0, 6.0)], SCHEMA) \
        .write.mode("append").parquet(src)
    got = run_batch()
    assert got["1"]["running_n"] == 3 and got["1"]["running_sum"] == 12.0
    assert got["1"]["running_mean"] == 4.0


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    from lswms_forage_etl_spark.streaming.stateful import stream_exact_dedup

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "dckpt")
    schema = "doc_id long, text string"

    def run_batch():
        rows = []
        stream = spark.readStream.schema(schema).parquet(src)
        out = stream_exact_dedup(stream)
        q = (out.writeStream
             .foreachBatch(lambda df, bid: rows.extend(df.collect()))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r["doc_id"]: r for r in rows}

    # batch 1: X appears twice (keep min id 1), Y once
    spark.createDataFrame(
        [(5, "same text"), (1, "same  TEXT"), (3, "other text")],
        schema).write.mode("append").parquet(src)
    got = run_batch()
    assert set(got) == {1, 3}
    assert got[1]["dup_in_batch"] == 2      # both X arrivals counted
    # batch 2 (fresh stream, recovered state): X replays -> suppressed;
    # Z is new -> emitted
    spark.createDataFrame(
        [(9, "same text"), (7, "brand new")], schema) \
        .write.mode("append").parquet(src)
    got2 = run_batch()
    assert set(got2) == {7}


def test_stream_dedup_ttl_state_expiry(spark, tmp_path):
    """Event-time TTL bounds dedup state: a fingerprint unseen past the
    TTL (watermark-advanced) is forgotten, so a much-later replay is
    re-admitted — the explicit state-size/recall trade."""
    from lswms_forage_etl_spark.streaming.stateful import stream_exact_dedup

    src = str(tmp_path / "docs3")
    ckpt = str(tmp_path / "tckpt")
    schema = "doc_id long, text string, ts timestamp"

    def run_batch():
        rows = []
        stream = spark.readStream.schema(schema).parquet(src)
        out = stream_exact_dedup(stream, ts_col="ts", ttl_minutes=30,
                                 watermark_delay="0 seconds")
        q = (out.writeStream
             .foreachBatch(lambda df, bid: rows.extend(df.collect()))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r["doc_id"] for r in rows}

    def add(doc_id, text, minutes):
        spark.createDataFrame(
            [(doc_id, text, T0 + dt.timedelta(minutes=minutes))],
            schema).write.mode("append").parquet(src)

    add(1, "ephemeral doc", 0)
    assert run_batch() == {1}
    # within TTL: replay suppressed; watermark advances to t+10
    add(2, "ephemeral doc", 10)
    assert run_batch() == set()
    # batch at t+120 advances the watermark far past the t+10+30min
    # timeout -> state expires during this batch
    add(3, "unrelated fresh doc", 120)
    assert run_batch() == {3}
    # replay after expiry is re-admitted (state was dropped)
    add(4, "ephemeral doc", 125)
    assert run_batch() == {4}
