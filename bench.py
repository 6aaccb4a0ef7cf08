"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full execution via a count-style noop write
(`df.write.format('noop')`) so the timing includes the whole plan, not
just planning. A warmup query pre-initializes the JVM/session so the
first measured query isn't charged for startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from lswms_forage_etl_spark import get_spark

# Headline set: one per operator family, weighted toward shuffle/join/agg
# heavy paths that dominate at scale.
HEADLINE = [
    "agg_pricing_summary",
    "join_merge_inner",
    "join_zonal_broadcast",
    "join_asof_nearest",
    "join_range_bucketed",
    "agg_temporal_mean_composite",
    "window_expanding_mean",
    "window_tail_k",
    "window_sessionize",
    "topk_global",
    "dedup_exact",
    "dedup_lsh_pairs",
    "dedup_embedding",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "text_stats",
    "mm_byte_histogram",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer reads + Python/Arrow worker pool spawn
    # (one-time process costs, not per-query throughput), not counted
    entrymod.q_agg_distinct_dates(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite").save()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
