"""Z-order layout key: correctness vs a Python Morton reference and the
file-stats locality property the layout exists for."""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F

from lswms_forage_etl_spark.functions.layout import zorder_key, zorder_layout


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference(spark):
    rng = random.Random(3)
    rows = [(i, rng.randrange(1 << 16), rng.randrange(1 << 16))
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"]: r["z"] for r in
           df.select("id", zorder_key("x", "y", 16).alias("z")).collect()}
    for i, x, y in rows:
        assert got[i] == _morton_ref(x, y, 16)


def test_zorder_layout_improves_two_dim_locality(spark):
    """After the layout rewrite, each output partition covers a small
    rectangle of (x, y): the summed per-partition bounding-box area must
    be far below the unclustered baseline (each partition ~ the full
    square)."""
    rng = random.Random(9)
    n, side, parts = 4000, 1 << 10, 16
    rows = [(i, rng.randrange(side), rng.randrange(side))
            for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    def bbox_area_sum(frame):
        stats = (frame.withColumn("p", F.spark_partition_id())
                 .groupBy("p")
                 .agg((F.max("x") - F.min("x")).alias("dx"),
                      (F.max("y") - F.min("y")).alias("dy"))
                 .collect())
        return sum((r["dx"] + 1) * (r["dy"] + 1) for r in stats)

    base = bbox_area_sum(df.repartition(parts))
    clustered = bbox_area_sum(zorder_layout(df, "x", "y", bits=10,
                                            num_files=parts))
    # random partitions each span ~the whole square (16x full area);
    # z-ordered tiles should cut the summed area by >4x
    assert clustered * 4 < base, (clustered, base)


def test_zonemap_guarantee_and_write_scan_prunes(spark, tmp_path):
    """Zone-map invariants end-to-end: (1) an unselected shard never
    contains a matching row; (2) the materialized layout's probe scan
    carries literal PartitionFilters (file listing skips pruned shards)
    and returns exactly the rows a plain filter returns."""
    from lswms_forage_etl_spark.functions.layout import (
        zonemap_scan,
        zonemap_selected,
        zonemap_stats,
        zonemap_write,
    )
    # v clustered on id so shards carry tight [min, max] ranges
    rows = [(i, i // 2) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v long")
    shard = F.floor(F.col("id") / F.lit(500)).cast("long")
    lo, hi = 300, 700

    pred = (F.col("v") >= lo) & (F.col("v") < hi)
    man = zonemap_stats(df, shard, "v", predicate=pred)
    for r in man.collect():
        selected = r["max_v"] >= lo and r["min_v"] < hi
        if not selected:
            assert r["n_matched"] == 0, r  # the skip-safety guarantee

    path = str(tmp_path / "zm")
    zonemap_write(df, path, shard, "v")
    got = zonemap_scan(spark, path, "v", lo, hi)
    want = sorted(r["id"] for r in df.where(pred).collect())
    assert sorted(r["id"] for r in got.collect()) == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan.split(
        "PartitionFilters")[1].split("]")[0]


def test_compact_bins_contiguous_and_bounded(spark):
    """Bin packing: contiguous in shard order, per-bin totals correct,
    and no bin exceeds target + max_shard - 1."""
    from lswms_forage_etl_spark.functions.layout import compact_bins
    target = 100
    sizes = [40, 40, 40, 10, 90, 5, 5, 200, 30, 30, 30, 30]
    man = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "shard_id long, n_rows long")
    rows = sorted(compact_bins(man, target=target).collect(),
                  key=lambda r: r["shard_id"])
    bins = [r["bin_id"] for r in rows]
    assert bins == sorted(bins)                  # contiguous, monotone
    import collections
    tot = collections.Counter()
    for r in rows:
        tot[r["bin_id"]] += r["n"]
    for r in rows:
        assert r["bin_rows"] == tot[r["bin_id"]]
    assert all(t <= target + max(sizes) - 1 for t in tot.values())
    # replay the definition exactly
    cum = 0
    for r in rows:
        assert r["bin_id"] == cum // target, r
        cum += r["n"]
