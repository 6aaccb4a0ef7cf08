"""Physical-plan audit: for every queries() entry, inspect the formatted
explain output and report the scale-relevant plan properties —

  scans     : columns read (ReadSchema width) and PushedFilters presence
  joins     : strategy per join (BroadcastHash / SortMerge / BroadcastNL)
  exchanges : shuffle count
  python    : Arrow-batched python stages (mapInPandas/applyInPandas)

Flags (worth a look, not necessarily wrong):
  BNLJ      a BroadcastNestedLoopJoin (O(n*m) comparisons)
  WIDE-SCAN a scan reading >12 columns (projection may not be pruned)

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__ as entrymod
    from lswms_forage_etl_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    flags_total = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:
            print(f"{name:28s} ERROR {e}")
            continue
        joins = re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_python = len(re.findall(
            r"(MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython)", plan))
        scan_widths = [len(m.split(","))
                       for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)]
        pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
        flags = []
        if "BroadcastNestedLoopJoin" in joins or "CartesianProduct" in joins:
            # bounded broadcast cross products are the INTENT for these:
            # every pair must be scored and one side is catalog-scale
            # (<=50 vectors / <=8 query rows), so nested-loop over a
            # broadcast IS the right plan, not a missed equi-join
            if name in ("ann_pairwise_label_sim", "ann_topk_join"):
                flags.append("BNLJ-intentional-bounded")
            else:
                flags.append("BNLJ")
        if any(w > 12 for w in scan_widths):
            flags.append("WIDE-SCAN")
        flags_total += len([f for f in flags if "intentional" not in f])
        jsum = ",".join(f"{j.replace('Join','')}" for j in joins) or "-"
        print(f"{name:28s} joins={jsum:<40s} shuffles={n_exchange} "
              f"py={n_python} scans={scan_widths} pushed={pushed} "
              f"{' '.join('['+f+']' for f in flags)}")
    print(f"\n{flags_total} flags")


if __name__ == "__main__":
    main()
