"""Deterministic sampling operators: reproducibility, rate accuracy,
partitioning-invariance (properties Spark's rand()-based sample lacks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.sampling import (
    group_cap,
    hash_sample,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"))


def test_hash_sample_rate_and_determinism(spark):
    df = _docs(spark)
    s1 = hash_sample(df, 0.3, "doc_id")
    n = s1.count()
    assert abs(n / 2000 - 0.3) < 0.05                 # rate is honest
    ids1 = {r["doc_id"] for r in s1.collect()}
    # identical sample regardless of physical partitioning
    ids2 = {r["doc_id"] for r in
            hash_sample(df.repartition(13), 0.3, "doc_id").collect()}
    assert ids1 == ids2
    # different seed -> different (but same-rate) sample
    ids3 = {r["doc_id"] for r in
            hash_sample(df, 0.3, "doc_id", seed=9).collect()}
    assert ids3 != ids1


def test_stratified_rates_per_group(spark):
    df = _docs(spark)
    out = stratified_sample(df, "grp", {"g0": 1.0, "g1": 0.5}, "doc_id",
                            default_rate=0.0)
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts["g0"] == 500                        # rate 1.0 keeps all
    assert abs(counts.get("g1", 0) / 500 - 0.5) < 0.1
    assert "g2" not in counts and "g3" not in counts  # default 0.0


def test_group_cap_exact_k_and_stable(spark):
    df = _docs(spark)
    out = group_cap(df, ["grp"], k=7, key_col="doc_id")
    counts = [r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()]
    assert counts == [7, 7, 7, 7]
    a = {(r["grp"], r["doc_id"]) for r in out.collect()}
    b = {(r["grp"], r["doc_id"]) for r in
         group_cap(df.repartition(17), ["grp"], 7, "doc_id").collect()}
    assert a == b                                     # partition-invariant


def test_assign_splits_deterministic_and_total(spark):
    from lswms_forage_etl_spark.operators.sampling import assign_splits
    import pytest as _pt
    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = assign_splits(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    again = {r["doc_id"]: r["split"] for r in assign_splits(
        docs.repartition(13), {"train": 0.9, "val": 0.05, "test": 0.05})
        .collect()}
    assert got == again                      # partition-invariant
    from collections import Counter
    c = Counter(got.values())
    assert c["train"] + c["val"] + c["test"] == 2000
    assert 0.85 < c["train"] / 2000 < 0.95   # ~binomial around 0.9
    # growth stability: a subset keeps its assignments
    sub = {r["doc_id"]: r["split"] for r in assign_splits(
        docs.where("doc_id < 500"), {"train": 0.9, "val": 0.05,
                                     "test": 0.05}).collect()}
    assert all(got[k] == v for k, v in sub.items())
    with _pt.raises(ValueError):
        assign_splits(docs, {"train": 0.5, "val": 0.1})
    with _pt.raises(ValueError):
        assign_splits(docs, {})


def test_temperature_rebalance_sqrt_flattening(spark):
    """tau=1/2 mix: the smallest group keeps everything; a group 100x
    larger keeps ~sqrt(1/100) = 10% (hash-exact, deterministic)."""
    from lswms_forage_etl_spark.operators.sampling import (
        temperature_rebalance)
    rows = ([(i, "small") for i in range(50)]
            + [(1000 + i, "big") for i in range(5000)])
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = temperature_rebalance(df, "grp", "doc_id")
    counts = {r["grp"]: r["count"]
              for r in out.groupBy("grp").count().collect()}
    assert counts["small"] == 50                    # binding group: all
    expect_big = 5000 * (50 / 5000) ** 0.5          # ~= 500
    assert abs(counts["big"] - expect_big) < 60, counts
    # determinism: the same plan yields the identical row set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"]
         for r in temperature_rebalance(df, "grp", "doc_id").collect()}
    assert a == b
