"""HyperLogLog sketch: estimate accuracy, register mergeability,
partition invariance. (Cross-engine register/sum/estimate parity is
owned by the oracle gate — sketch_hll_distinct in check_oracle.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def _keys(spark, n, group="g", start=0):
    return (spark.range(start, start + n)
            .select(F.lit(group).alias("grp"),
                    F.concat(F.lit("key"), F.col("id")).alias("k")))


def test_hll_estimate_accuracy(spark):
    """m=256 gives sigma = 1.04/sqrt(256) ~ 6.5 %; a fixed-hash run is
    deterministic, so assert a generous 3-sigma band around the true
    cardinalities (duplicated keys must not move the estimate)."""
    df = _keys(spark, 5000).unionAll(_keys(spark, 5000))   # dups: same 5000
    out = hll_distinct(df, "k", ["grp"]).collect()
    assert len(out) == 1
    est = out[0]["hll_est"]
    assert abs(est - 5000) / 5000 < 0.20, est
    small = hll_distinct(_keys(spark, 300, "s"), "k", ["grp"]).collect()
    # raw HLL biases high below ~2.5m without linear counting; just
    # sanity-bound it
    assert 100 < small[0]["hll_est"] < 900, small[0]["hll_est"]


def test_hll_registers_merge_by_max(spark):
    """The sketch state is mergeable: registers(A ∪ B) equals
    max-merge(registers(A), registers(B)) — the property that makes
    per-partition partial aggregation and incremental maintenance
    correct."""
    a = _keys(spark, 2000)
    b = _keys(spark, 2000, start=1500)       # overlapping ranges
    whole = {(r["bucket"], r["reg"])
             for r in hll_registers(a.unionAll(b), "k", ["grp"]).collect()}
    merged = {(r["bucket"], r["reg"])
              for r in (hll_registers(a, "k", ["grp"])
                        .unionAll(hll_registers(b, "k", ["grp"]))
                        .groupBy("grp", "bucket")
                        .agg(F.max("reg").alias("reg"))).collect()}
    assert whole == merged
    # and the folded estimate agrees exactly
    w = hll_estimate(hll_registers(a.unionAll(b), "k", ["grp"]),
                     ["grp"]).collect()[0]
    m = hll_estimate(
        hll_registers(a, "k", ["grp"])
        .unionAll(hll_registers(b, "k", ["grp"]))
        .groupBy("grp", "bucket").agg(F.max("reg").alias("reg")),
        ["grp"]).collect()[0]
    assert w["hll_sum48"] == m["hll_sum48"]
    assert w["hll_est"] == m["hll_est"]


def test_hll_partition_invariance(spark):
    df = _keys(spark, 3000)
    one = hll_distinct(df, "k", ["grp"]).collect()[0]
    two = hll_distinct(df.repartition(17), "k", ["grp"]).collect()[0]
    assert one["hll_sum48"] == two["hll_sum48"]
    assert one["n_zero_regs"] == two["n_zero_regs"]
    assert one["hll_est"] == two["hll_est"]


def test_cms_never_underestimates_and_bounds(spark):
    """CMS guarantees estimate >= true count; with w=64 << 500 distinct
    keys collisions are forced, so the overestimate property is
    actually exercised (not vacuous)."""
    from lswms_forage_etl_spark.operators.sketches import (
        cms_lookup, cms_table)
    # key i occurs i%7+1 times
    rows = [(f"key{i}",) for i in range(500) for _ in range(i % 7 + 1)]
    df = spark.createDataFrame(rows, "k string")
    true = {r["k"]: r["n"] for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    cms = cms_table(df, "k", d=4, w=64)
    keys = df.select("k").distinct()
    est = {r["k"]: r["cms_estimate"]
           for r in cms_lookup(cms, keys, "k", d=4, w=64).collect()}
    n_total = sum(true.values())
    assert set(est) == set(true)
    over = 0
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
        over += est[k] > t
    assert over > 0                        # collisions really happened
    # Markov bound sanity: most estimates within 2N/w of truth
    within = sum(est[k] - true[k] <= 2 * n_total / 64 for k in true)
    assert within / len(true) > 0.9


def test_cms_merge_by_sum(spark):
    """Sketches of disjoint halves SUM-merge to the whole's sketch —
    the union/streaming-maintenance property."""
    from lswms_forage_etl_spark.operators.sketches import cms_table
    rows = [(f"key{i}",) for i in range(400) for _ in range(i % 5 + 1)]
    df = spark.createDataFrame(rows, "k string")
    a = df.where(F.length("k") % 2 == 0)
    b = df.where(F.length("k") % 2 == 1)
    whole = {(r["r"], r["c"]): r["n"]
             for r in cms_table(df, "k").collect()}
    merged: dict = {}
    for part in (a, b):
        for r in cms_table(part, "k").collect():
            merged[(r["r"], r["c"])] = \
                merged.get((r["r"], r["c"]), 0) + r["n"]
    assert whole == merged


def test_hll_streaming_maintenance(spark, tmp_path):
    """The sketch maintains INCREMENTALLY in a streaming loop: per
    micro-batch, registers(batch) max-merge into a persisted register
    table (localCheckpoint before the overwrite — the round-9
    recacheByPath/read-path lesson), and after all batches the table
    equals the batch-built sketch of the full corpus, estimate
    included."""
    inp = str(tmp_path / "in")
    reg = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")
    schema = "grp string, k string"
    spark.createDataFrame([], "grp string, bucket int, reg int") \
        .write.parquet(reg)

    def gate(batch_df, batch_id):
        sp = batch_df.sparkSession
        new = hll_registers(batch_df, "k", ["grp"])
        merged = (sp.read.parquet(reg).unionAll(new)
                  .groupBy("grp", "bucket")
                  .agg(F.max("reg").alias("reg"))
                  .localCheckpoint())          # truncate: target path in lineage
        merged.write.mode("overwrite").parquet(reg)

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(inp)
        q = (spark.readStream.schema(schema).parquet(inp)
             .writeStream.foreachBatch(gate)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    b1 = [("g", f"key{i}") for i in range(1500)]
    b2 = [("g", f"key{i}") for i in range(1000, 2500)]   # overlap
    run(b1)
    run(b2)
    whole = hll_registers(
        spark.createDataFrame(b1 + b2, schema), "k", ["grp"])
    assert {(r["bucket"], r["reg"]) for r in
            spark.read.parquet(reg).collect()} == \
        {(r["bucket"], r["reg"]) for r in whole.collect()}
    streamed = hll_estimate(spark.read.parquet(reg), ["grp"]).collect()[0]
    batch = hll_estimate(whole, ["grp"]).collect()[0]
    assert streamed["hll_sum48"] == batch["hll_sum48"]
    assert abs(streamed["hll_est"] - 2500) / 2500 < 0.20


def test_kmv_jaccard_estimates(spark):
    """Bottom-k Jaccard: on sets with known overlap the estimate lands
    within the sketch's sampling error (sd ~ sqrt(J(1-J)/k) ~ 0.035
    at k=256, J=0.33); when the union fits inside k the sketch is
    EXACT."""
    from lswms_forage_etl_spark.operators.sketches import (
        kmv_jaccard_pairs, kmv_sketch)
    # A = [0, 4000), B = [2000, 6000): |inter|=2000, |union|=6000, J=1/3
    rows = ([("A", f"k{i}") for i in range(4000)]
            + [("B", f"k{i}") for i in range(2000, 6000)])
    df = spark.createDataFrame(rows, "g string, k string")
    est = kmv_jaccard_pairs(kmv_sketch(df, "k", ["g"], k=256),
                            "g", k=256).collect()[0]
    assert est["m_size"] == 256
    assert abs(est["kmv_jaccard"] - 1 / 3) < 0.15, est["kmv_jaccard"]
    # small sets: union (60) < k -> exact
    small = ([("A", f"s{i}") for i in range(40)]
             + [("B", f"s{i}") for i in range(20, 60)])
    sdf = spark.createDataFrame(small, "g string, k string")
    e2 = kmv_jaccard_pairs(kmv_sketch(sdf, "k", ["g"], k=256),
                           "g", k=256).collect()[0]
    assert e2["m_size"] == 60 and e2["n_shared"] == 20
    assert abs(e2["kmv_jaccard"] - 20 / 60) < 1e-12


def test_hll_sliding_equals_batch_union(spark):
    """A sliding window's merged registers must equal the sketch of the
    window's raw rows — merge-by-max is lossless for HLL state."""
    import datetime as dt
    from lswms_forage_etl_spark.operators.sketches import (
        hll_distinct, hll_sliding_distinct)
    rows = [(dt.date(2024, 1, 1 + d % 5), 100 * d + i)
            for d in range(5) for i in range(40)]
    df = spark.createDataFrame(rows, "day date, uid long")
    slid = {r["window_end"]: r for r in
            hll_sliding_distinct(df, "uid", F.col("day"),
                                 window_days=3, p=6).collect()}
    # window ending Jan 3 covers days 1-3: sketch those raw rows directly
    sub = df.where(F.col("day") <= dt.date(2024, 1, 3)) \
            .withColumn("g", F.lit(1))
    direct = hll_distinct(sub, "uid", ["g"], p=6).collect()[0]
    got = slid[dt.date(2024, 1, 3)]
    assert got["hll_sum48"] == direct["hll_sum48"]
    assert got["n_zero_regs"] == direct["n_zero_regs"]
    assert got["hll_est"] == direct["hll_est"]
    # trailing partial windows exist out to max_day + W - 1
    assert dt.date(2024, 1, 5 + 2) in slid


def test_binned_quantiles_vs_exact(spark):
    """The sketch quantile must land within one bin width of the exact
    percentile, and the sketch state must merge by sum."""
    from lswms_forage_etl_spark.operators.sketches import (
        binned_quantile_sketch, binned_quantiles)
    vals = [(float(v), "g") for v in range(1, 1001)]  # 1..1000 uniform
    df = spark.createDataFrame(vals, "v double, g string")
    out = binned_quantiles(df, "v", ["g"], [500000, 990000],
                           bin_width=10).collect()[0]
    assert out["n"] == 1000
    # exact p50 = 500 -> bin edge in [490, 500]; p99 = 990
    assert abs(out["q500000"] - 500) <= 10
    assert abs(out["q990000"] - 990) <= 10
    # merge-by-sum: sketch(all) == sketch(half1) union sketch(half2) re-sum
    h1 = binned_quantile_sketch(
        df.where(F.col("v") <= 500), "v", ["g"], 10)
    h2 = binned_quantile_sketch(
        df.where(F.col("v") > 500), "v", ["g"], 10)
    merged = (h1.unionByName(h2).groupBy("g", "bin")
              .agg(F.sum("c").alias("c")))
    direct = binned_quantile_sketch(df, "v", ["g"], 10)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, direct.collect())))


def test_winsorize_clips_to_sketch_edges(spark):
    from lswms_forage_etl_spark.lifecycle import release_tracked
    from lswms_forage_etl_spark.operators.sketches import winsorize
    vals = [(float(v), "g") for v in range(1, 101)] + [(1000.0, "g")]
    df = spark.createDataFrame(vals, "v double, g string")
    out = winsorize(df, "v", ["g"], lo_ppm=100000, hi_ppm=900000,
                    bin_width=10)
    rows = out.collect()
    release_tracked()
    clipped = {r["v"]: r["v_clipped"] for r in rows}
    # the 1000.0 outlier clamps to the p90 bin edge; mid values pass
    assert clipped[1000.0] < 1000.0
    assert clipped[50.0] == 50.0
    assert clipped[1.0] >= 1.0  # clamped UP to the p10 edge or kept
    lo = min(v for v in clipped.values())
    assert lo >= 10.0 - 10  # within one bin of exact p10


def test_cms_heavy_hitters_recall_and_visible_fp(spark):
    """phi-heavy hitters: CMS never underestimates, so every TRUE
    phi-frequent key must appear (100% recall); collision-driven
    false positives surface as is_heavy=false rows, never silently."""
    from lswms_forage_etl_spark.operators.sketches import (
        cms_heavy_hitters)
    rows = (["hot1"] * 400 + ["hot2"] * 300
            + [f"cold{i}" for i in range(300)])
    df = spark.createDataFrame([(k,) for k in rows], "g string")
    # tiny sketch (w=64) so collisions actually happen
    out = {r["g"]: r for r in cms_heavy_hitters(
        df, "g", phi=(1, 10), d=4, w=64).collect()}
    n = len(rows)
    truth = {k for k in set(rows)
             if rows.count(k) * 10 >= n * 1}
    assert truth == {"hot1", "hot2"}
    for k in truth:                       # recall is guaranteed
        assert k in out and out[k]["is_heavy"], k
    for k, r in out.items():              # estimates never understate
        assert r["cms_estimate"] >= r["exact_n"]
        assert r["is_heavy"] == (r["exact_n"] * 10 >= n)
