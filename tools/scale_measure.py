"""Measure wall-clock scaling of the heaviest dedup/ANN queries across
block-diagonal slices built by tools/make_scale10x.py (VERDICT r4 item
8). Prints a markdown row per (query, dir) for SCALE.md.

Usage: python tools/scale_measure.py [dir ...]
  default dirs: /root/testdata/sf0.1 /root/scale10x

`dedup_embedding` follows the operator's own scale guidance (planes ~
log2(n/target_bucket)): num_planes grows with the corpus so bucket
occupancy stays constant — measuring a fixed 8-plane bucketing at 100x
would measure bucket saturation, not the operator (the docstring's
documented re-index rule).
"""

from __future__ import annotations

import math
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
    "dedup_substrings",
    "dedup_incremental",
    "text_contamination",
    "ann_ivf_topk",
    "ann_pq_topk",
    # round-6 operators
    "dedup_remove_spans",
    "dedup_bloom_probe",
    "kmeans_assign",
    "text_eval_overlap",
    "pack_manifest",
    # round-9 operators
    "text_bm25_topk",
    "sample_weighted_k",
    "sketch_hll_distinct",
    "text_bm25_join",
    "sketch_cms_counts",
    "sample_rebalance",
]


def make_embedding_query(n_vecs: int):
    """dedup_embedding with planes scaled to hold ~80 vectors/bucket."""
    from pyspark.sql import functions as F  # noqa: F401

    from lswms_forage_etl_spark.operators.similarity import \
        embedding_near_dups

    planes = max(8, math.ceil(math.log2(max(n_vecs, 1) / 80)))

    def q(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return embedding_near_dups(emb, threshold=0.3, num_bands=4,
                                   num_planes=planes)
    return q, planes


def best_of(fn, sf_dir, spark, n=2):
    best = 9e9
    for _ in range(n):
        lifecycle.release_tracked()
        spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    rows = fn(spark, sf_dir).count()
    lifecycle.release_tracked()
    spark.catalog.clearCache()
    return best, rows


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/scale10x"]
    spark = get_spark("scale-measure", extra_conf={
        # a 500 MB slice file must split to feed 32 cores (the cluster-
        # sizing rule from CLAUDE.md applied to the local harness)
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in QUERIES:  # warm codegen/JIT at the small sf
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop").mode("overwrite").save()
        except Exception:
            pass
    print("| query | dir | wall s | rows |")
    print("|---|---|---|---|")
    for name in QUERIES:
        for d in dirs:
            fn = qs[name]
            label = name
            if name == "dedup_embedding":
                n_vecs = spark.read.parquet(
                    f"{d}/embeddings.parquet").count()
                fn, planes = make_embedding_query(n_vecs)
                label = f"{name}(r={planes})"
            t, rows = best_of(fn, d, spark)
            print(f"| {label} | {d} | {t:.2f} | {rows} |", flush=True)


if __name__ == "__main__":
    main()
