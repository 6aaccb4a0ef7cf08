"""Measure wall-clock scaling of the heaviest dedup/ANN queries:
sf0.1 vs the 10x block-diagonal slice built by tools/make_scale10x.py
(VERDICT r4 item 8). Prints a markdown table for SCALE.md.

Usage: python tools/scale_measure.py [ten_x_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from lswms_forage_etl_spark import get_spark, lifecycle

QUERIES = [
    "dedup_lsh_pairs",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_semantic",
    "text_contamination",
    "ann_ivf_topk",
]


def best_of(qs, name, sf_dir, spark, n=3):
    best, rows = 9e9, None
    for _ in range(n):
        lifecycle.release_tracked()
        spark.catalog.clearCache()
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    rows = qs[name](spark, sf_dir).count()
    lifecycle.release_tracked()
    spark.catalog.clearCache()
    return best, rows


def main() -> None:
    ten_x = sys.argv[1] if len(sys.argv) > 1 else "/root/scale10x"
    spark = get_spark("scale-measure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in QUERIES:  # warm codegen/JIT at the small sf
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop").mode("overwrite").save()
        except Exception:
            pass
    print("| query | sf0.1 s | 10x s | wall x | rows sf0.1 | rows 10x | rows x |")
    print("|---|---|---|---|---|---|---|")
    for name in QUERIES:
        t1, r1 = best_of(qs, name, "/root/testdata/sf0.1", spark)
        t10, r10 = best_of(qs, name, ten_x, spark)
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f}x "
              f"| {r1} | {r10} | {r10 / max(r1, 1):.1f}x |", flush=True)


if __name__ == "__main__":
    main()
