"""Bucketed co-located joins: the shuffle-elimination layout for the
repeated big-big join at 100 TB (facts bucketed by the join key join
WITHOUT an Exchange on either side — the bucketing IS the shuffle,
paid once at write time and amortized over every later join)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    # warehouse.dir is static on a live session; a per-database
    # LOCATION keeps the table files inside the test tmpdir instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt "
              f"LOCATION '{tmp_path / 'wh'}'")
    try:
        a = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        (a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
         .saveAsTable("bkt.fact_a"))
        (b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
         .saveAsTable("bkt.fact_b"))
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = (spark.table("bkt.fact_a")
                 .join(spark.table("bkt.fact_b"), "k")
                 .agg(F.sum(F.col("va") + F.col("vb")).alias("s")))
            plan = j._jdf.queryExecution().executedPlan().toString()
            # the join itself must carry NO shuffle: bucketing provides
            # the co-partitioning (any Exchange left is the 1-row final
            # aggregate, never a hashpartitioning on the join key)
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert "Exchange hashpartitioning(k" not in plan, plan[:2000]
            got = j.collect()[0]["s"]
            assert got == sum(i * 2 + i * 3 for i in range(10000))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt.fact_a")
        spark.sql("DROP TABLE IF EXISTS bkt.fact_b")
        spark.sql("DROP DATABASE IF EXISTS bkt")
