"""Scale machinery: salted joins/aggs produce identical results to their
naive forms while spreading hot keys; bucketed tables join without a
shuffle (plan-shape assertion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.skew import salted_agg_count, salted_join


def _skewed(spark, n=10_000):
    # 90% of rows share key 0; the rest spread over 100 keys
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.pmod(F.col("id"), F.lit(100))).alias("k"),
        F.col("id").alias("v"))


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(100)], "k long, name string")
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, "k", num_salts=8) \
        .select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = _skewed(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    n_buckets = (left.where("k = 0").select(salt.alias("s"))
                 .distinct().count())
    assert n_buckets == 8  # hot key occupies every salt bucket


def test_salted_agg_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["count"]
             for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"]
              for r in salted_agg_count(df, "k", num_salts=8).collect()}
    assert plain == salted


@pytest.fixture()
def warehouse_tables(spark, tmp_path_factory):
    # bucketed tables need saveAsTable; session warehouse is ./spark-warehouse
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = spark.createDataFrame(
        [(i, f"o{i}") for i in range(1000)], "okey long, oval string")
    li = spark.createDataFrame(
        [(i % 1000, float(i)) for i in range(5000)], "okey long, qty double")
    (o.write.bucketBy(8, "okey").sortBy("okey").mode("overwrite")
     .saveAsTable("b_orders"))
    (li.write.bucketBy(8, "okey").sortBy("okey").mode("overwrite")
     .saveAsTable("b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    j = (spark.table("b_lineitem").join(spark.table("b_orders"), "okey")
         .groupBy("okey").agg(F.sum("qty").alias("q")))
    # force sort-merge so the join would need an Exchange if not bucketed
    plan = (spark.table("b_lineitem").hint("merge")
            .join(spark.table("b_orders"), "okey")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan.split("AdaptiveSparkPlan")[-1] or \
        "Exchange" not in plan, plan
    # and the result is correct
    got = {r["okey"]: r["q"] for r in j.collect()}
    assert got[0] == sum(float(i) for i in range(5000) if i % 1000 == 0)
