"""AQE skew-join handling — the engine's documented answer to hot keys
(SCALE.md: 'skewed keys -> salting or AQE skew-join'). This pins that
the session config actually delivers: a pathologically hot join key is
split by AQE at runtime (skew=true in the final adaptive plan) instead
of serializing one giant task."""

import pytest
from pyspark.sql import functions as F

from lswms_forage_etl_spark import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-aqe-skew")


def test_skewed_join_is_split_by_aqe(spark):
    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor")}
    try:
        # force a sort-merge join and make the skew detector fire on
        # test-sized data
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # 300k rows on ONE key plus a uniform tail; payload pads bytes
        left = (spark.range(0, 330_000)
                .select(F.when(F.col("id") < 300_000, F.lit(7))
                        .otherwise(F.col("id") % 1000).alias("k"),
                        F.concat(F.lit("x" * 64),
                                 F.col("id").cast("string"))
                        .alias("pad")))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        # the inspected plan is the BARE join: a downstream aggregation
        # that reuses the join's partitioning makes AQE skip the skew
        # split (it would need an extra shuffle), which is itself the
        # documented behavior — pipelines that need both add
        # spark.sql.adaptive.forceOptimizeSkewedJoin
        # pad must survive projection pruning: a k-only hot partition is
        # constant longs that lz4-compress below the skew threshold
        joined = left.join(right, "k").select("k", "v", "pad")
        # drive execution through the DataFrame's OWN QueryExecution
        # (df.write clones the plan, leaving this one un-finalized)
        joined.rdd.count()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, (
            "AQE did not mark the hot partition as skewed:\n" + final[:2000])
        # correctness under the split: 300k hot rows + 30 tail rows with
        # residue 7 (30k tail ids, each residue 0..999 appears 30 times)
        rows = {r["k"]: r["count"]
                for r in joined.groupBy("k").count().collect()}
        assert rows[7] == 300_030
    finally:
        for k, v in saved.items():
            conf.set(k, v)
