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


def test_interval_join_state_ages_out_across_triggers(spark, tmp_path):
    """VERDICT r9 item 8: the documented state-bounding property
    (impressions age out window + watermark after their event time;
    late conversions are dropped, not matched) exercised for real
    across 3 micro-batches — not just asserted in the docstring.

    trigger 1: imp A (user 1, t=0) + conv at t=5  -> pair emits
    trigger 2: imp/conv pair at t=300/305 for user 2 -> watermark
               advances to ~245, far past imp A's t=0+30+60 horizon
    trigger 3: LATE conversion (user 1, t=10) — inside A's window by
               event time, but behind the watermark: must NOT emit."""
    imp_dir, conv_dir = str(tmp_path / "imp"), str(tmp_path / "conv")
    ckpt = str(tmp_path / "ckpt")
    # seed trigger-1 files
    spark.createDataFrame([(1, T0, 1)], SCHEMA).write.parquet(imp_dir)
    spark.createDataFrame([(10, _mins(5), 1)], SCHEMA) \
        .write.parquet(conv_dir)
    imp = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", "1").parquet(imp_dir))
    conv = (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1").parquet(conv_dir))
    out = interval_attribution_join(imp, conv, 30, watermark_minutes=60)
    rows = []
    q = (out.writeStream
         .foreachBatch(lambda df, bid: rows.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        assert {(r["imp_id"], r["conv_id"]) for r in rows} == {(1, 10)}
        # trigger 2: both event times jump to ~t+300 -> the min-of-
        # streams watermark moves to 305 - 60 = 245
        spark.createDataFrame([(2, _mins(300), 2)], SCHEMA) \
            .write.mode("append").parquet(imp_dir)
        spark.createDataFrame([(11, _mins(305), 2)], SCHEMA) \
            .write.mode("append").parquet(conv_dir)
        q.processAllAvailable()
        assert {(r["imp_id"], r["conv_id"]) for r in rows} \
            == {(1, 10), (2, 11)}
        # trigger 3: late conversion behind the watermark — dropped
        spark.createDataFrame([(12, _mins(10), 1)], SCHEMA) \
            .write.mode("append").parquet(conv_dir)
        q.processAllAvailable()
        # and one more empty-ish trigger to flush any deferred emit
        spark.createDataFrame([(13, _mins(400), 7)], SCHEMA) \
            .write.mode("append").parquet(conv_dir)
        q.processAllAvailable()
        got = {(r["imp_id"], r["conv_id"]) for r in rows}
        assert (1, 12) not in got, "late conversion matched aged state"
        assert got == {(1, 10), (2, 11)}
    finally:
        q.stop()


def test_last_touch_matches_pair_join_pick_latest(spark):
    from lswms_forage_etl_spark.streaming.joins import (
        last_touch_attribution)
    imp = spark.createDataFrame(IMPS, SCHEMA)
    conv = spark.createDataFrame(CONVS, SCHEMA)
    got = {(r["conv_id"]): (r["imp_id"], r["imp_ts"]) for r in
           last_touch_attribution(imp, conv, 30).collect()}
    # conv 10 (t=5): only imp 1 in window -> 1; conv 11 (t=25): imps 1
    # and 2 in window, LAST is imp 2 (t=10); conv 12/13: none
    assert got == {10: (1, T0), 11: (2, _mins(10))}
    # same-instant: an impression at exactly conv ts claims it, and
    # ts ties among impressions go to the higher event_id
    imp2 = spark.createDataFrame(
        [(1, T0, 1), (2, T0, 1)], SCHEMA)           # two imps, same ts
    conv2 = spark.createDataFrame([(10, T0, 1)], SCHEMA)
    r = last_touch_attribution(imp2, conv2, 30).collect()
    assert len(r) == 1 and r[0]["imp_id"] == 2
    # out-of-window last impression yields NO row even though an older
    # (also out-of-window) impression exists
    imp3 = spark.createDataFrame(
        [(1, T0, 1), (2, _mins(5), 1)], SCHEMA)
    conv3 = spark.createDataFrame([(10, _mins(40), 1)], SCHEMA)
    assert last_touch_attribution(imp3, conv3, 30).count() == 0


def test_streaming_pair_log_plus_view_equals_batch_last_touch(
        spark, tmp_path):
    """The streaming last-touch recipe the operator docstring names:
    append-only pair log (the watermarked stream-stream join run over
    micro-batches) + a read-time pick-latest view. Across 2 triggers
    the view over the accumulated log must equal the batch
    last_touch_attribution over the full data — including a pair that
    only becomes claimable in a later trigger."""
    from lswms_forage_etl_spark.streaming.joins import (
        last_touch_attribution)
    imp_dir, conv_dir = str(tmp_path / "imp"), str(tmp_path / "conv")
    log_dir, ckpt = str(tmp_path / "pairs"), str(tmp_path / "ckpt")
    imps = [(1, T0, 1), (2, _mins(10), 1)]
    convs1 = [(10, _mins(5), 1)]
    convs2 = [(11, _mins(25), 1)]        # claims imp 2 over imp 1
    spark.createDataFrame(imps, SCHEMA).write.parquet(imp_dir)
    spark.createDataFrame(convs1, SCHEMA).write.parquet(conv_dir)
    imp = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", "1").parquet(imp_dir))
    conv = (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1").parquet(conv_dir))
    out = interval_attribution_join(imp, conv, 30)
    q = (out.writeStream.format("parquet")
         .option("path", log_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(convs2, SCHEMA) \
            .write.mode("append").parquet(conv_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    log = spark.read.parquet(log_dir)
    w = (F.expr("row_number() OVER (PARTITION BY conv_id "
                "ORDER BY imp_ts DESC, imp_id DESC)"))
    view = (log.withColumn("_rk", w).where(F.col("_rk") == 1)
            .select("user_id", "imp_id", "imp_ts", "conv_id",
                    "conv_ts"))
    batch = last_touch_attribution(
        spark.createDataFrame(imps, SCHEMA),
        spark.createDataFrame(convs1 + convs2, SCHEMA), 30)
    assert sorted(map(tuple, view.collect())) \
        == sorted(map(tuple, batch.collect()))
    # and the late-claim actually happened: conv 11 -> imp 2
    got = {r["conv_id"]: r["imp_id"] for r in view.collect()}
    assert got == {10: 1, 11: 2}


def test_last_touch_randomized_vs_bruteforce(spark):
    """Randomized equivalence: on random event streams (shared ts
    collisions included), the window-scan operator must equal the
    brute-force pick (max (ts, id) impression within the window per
    conversion)."""
    import random
    from lswms_forage_etl_spark.streaming.joins import (
        last_touch_attribution)
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        imps, convs = [], []
        eid = 0
        for _ in range(120):
            u = rng.randint(1, 6)
            t = _mins(rng.randint(0, 200))
            eid += 1
            (imps if rng.random() < 0.5 else convs).append((eid, t, u))
        imp = spark.createDataFrame(imps, SCHEMA)
        conv = spark.createDataFrame(convs, SCHEMA)
        got = {r["conv_id"]: (r["imp_id"], r["imp_ts"], r["conv_ts"])
               for r in last_touch_attribution(imp, conv, 30).collect()}
        want = {}
        for cid, cts, cu in convs:
            cands = [(its, iid) for iid, its, iu in imps
                     if iu == cu and its <= cts
                     and cts < its + dt.timedelta(minutes=30)]
            if cands:
                its, iid = max(cands)
                want[cid] = (iid, its, cts)
        assert got == want, f"seed {seed}"


def test_topk_randomized_vs_bruteforce(spark):
    """Randomized equivalence for the bounded pair form (VERDICT r11
    item 6): interval_attribution_topk(k) must equal the brute-force
    pick — per conversion, the k most recent in-window impressions by
    (ts, id) recency, with 1-based recency ranks."""
    import random
    from lswms_forage_etl_spark.streaming.joins import (
        interval_attribution_topk)
    for seed, k in ((1, 1), (7, 3), (42, 5)):
        rng = random.Random(seed)
        imps, convs = [], []
        eid = 0
        for _ in range(150):
            u = rng.randint(1, 5)
            t = _mins(rng.randint(0, 150))
            eid += 1
            (imps if rng.random() < 0.6 else convs).append((eid, t, u))
        imp = spark.createDataFrame(imps, SCHEMA)
        conv = spark.createDataFrame(convs, SCHEMA)
        got = {(r["conv_id"], r["touch_rank"]): r["imp_id"]
               for r in interval_attribution_topk(imp, conv, k=k,
                                                  window_minutes=30)
               .collect()}
        want = {}
        for cid, cts, cu in convs:
            cands = sorted(((its, iid) for iid, its, iu in imps
                            if iu == cu and its <= cts
                            and cts < its + dt.timedelta(minutes=30)),
                           reverse=True)
            for rk, (its, iid) in enumerate(cands[:k], start=1):
                want[(cid, rk)] = iid
        assert got == want, f"seed {seed} k {k}"
        # k=1 rows must equal last-touch's picks
        if k == 1:
            from lswms_forage_etl_spark.streaming.joins import (
                last_touch_attribution)
            lt = {r["conv_id"]: r["imp_id"]
                  for r in last_touch_attribution(imp, conv, 30)
                  .collect()}
            assert {c: i for (c, _), i in got.items()} == lt


def test_topk_output_bounded_on_whale_user(spark):
    """A whale user with w impressions and c conversions all in-window
    produces exactly k*c pairs (the unbounded join would produce ~w*c)."""
    from lswms_forage_etl_spark.streaming.joins import (
        interval_attribution_topk)
    imps = [(i, _mins(i % 20), 1) for i in range(1, 201)]
    convs = [(1000 + j, _mins(21), 1) for j in range(10)]
    out = interval_attribution_topk(
        spark.createDataFrame(imps, SCHEMA),
        spark.createDataFrame(convs, SCHEMA),
        k=3, window_minutes=30).collect()
    assert len(out) == 3 * len(convs)
    assert {r["touch_rank"] for r in out} == {1, 2, 3}
