"""Equality pin for the r16 `ann_recall_at_k` fused ranking (VERDICT
r15 item 2): ranking row-disjoint method sides through ONE window
partitioned by the method tag must reproduce each side's own global
row_number exactly — including ties on the sort value, where only the
vec_id tie-break orders rows. The real query's graded hash is further
pinned by the DuckDB oracle gate; this test pins the transform itself
on adversarial data (duplicated sort values, negative values, values
shared across methods)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


SIDES = {
    "lsh": [(5, 0.9), (3, 0.9), (7, -0.2), (1, 0.0), (2, 0.0)],
    "ivf": [(5, 0.9), (9, 0.9), (7, 0.9), (4, 0.1)],
    "pq_rr": [(8, -1.0), (6, -1.0), (2, -1.0)],
}


def _side_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, cosine_sim double")


def test_method_partitioned_window_equals_per_side_global_windows(spark):
    w_global = Window.orderBy(F.col("cosine_sim").desc(), "vec_id")
    per_side = {}
    for name, rows in SIDES.items():
        ranked = (_side_df(spark, rows)
                  .select(F.lit(name).alias("method"), "vec_id",
                          F.row_number().over(w_global).alias("a_rk")))
        for r in ranked.collect():
            per_side[(r["method"], r["vec_id"])] = r["a_rk"]

    u = None
    for name, rows in SIDES.items():
        tagged = _side_df(spark, rows).select(
            F.lit(name).alias("method"), "vec_id", "cosine_sim")
        u = tagged if u is None else u.unionByName(tagged)
    w_fused = Window.partitionBy("method").orderBy(
        F.col("cosine_sim").desc(), "vec_id")
    fused = {(r["method"], r["vec_id"]): r["a_rk"]
             for r in u.select("method", "vec_id",
                               F.row_number().over(w_fused).alias("a_rk"))
             .collect()}

    assert fused == per_side
    # ties broke on vec_id inside every method partition:
    # desc order is 0.9 (ids 3,5), 0.0 (ids 1,2), -0.2 (id 7)
    assert fused[("lsh", 3)] == 1 and fused[("lsh", 5)] == 2
    assert fused[("lsh", 1)] == 3 and fused[("lsh", 2)] == 4
    assert fused[("lsh", 7)] == 5
