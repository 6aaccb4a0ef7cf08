"""Stream-stream watermarked interval join (streaming/joins.py):
the same operator must produce identical pairs in batch and in a
two-stream availableNow run, and respect the attribution window."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lswms_forage_etl_spark.streaming.joins import (
    interval_attribution_join,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "event_id long, ts timestamp, user_id long"


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


IMPS = [(1, T0, 1), (2, _mins(10), 1), (3, T0, 2)]
CONVS = [(10, _mins(5), 1),    # matches imp 1 (and NOT imp 2: before it)
         (11, _mins(25), 1),   # matches imp 1 (25 < 30) and imp 2
         (12, _mins(45), 2),   # outside imp 3's 30-min window
         (13, _mins(1), 9)]    # no impression for user 9
EXPECTED = {(1, 10), (1, 11), (2, 11)}


def test_interval_join_batch_semantics(spark):
    imp = spark.createDataFrame(IMPS, SCHEMA)
    conv = spark.createDataFrame(CONVS, SCHEMA)
    got = {(r["imp_id"], r["conv_id"]) for r in
           interval_attribution_join(imp, conv, 30).collect()}
    assert got == EXPECTED


def test_interval_join_stream_stream(spark, tmp_path):
    imp_dir, conv_dir = str(tmp_path / "imp"), str(tmp_path / "conv")
    spark.createDataFrame(IMPS, SCHEMA).write.parquet(imp_dir)
    spark.createDataFrame(CONVS, SCHEMA).write.parquet(conv_dir)
    imp = spark.readStream.schema(SCHEMA).parquet(imp_dir)
    conv = spark.readStream.schema(SCHEMA).parquet(conv_dir)
    out = interval_attribution_join(imp, conv, 30)
    assert out.isStreaming
    rows = []
    q = (out.writeStream
         .foreachBatch(lambda df, bid: rows.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert {(r["imp_id"], r["conv_id"]) for r in rows} == EXPECTED
