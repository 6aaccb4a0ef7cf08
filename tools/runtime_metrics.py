"""Runtime-truthful per-query execution metrics: RUN each queries()
entry to completion and report what actually executed — jobs, stages,
tasks, input/shuffle bytes — from the Spark UI REST API (the same
numbers the SQL tab shows). Complements tools/explain_audit.py, which
audits the PLAN: a missing materialization point shows up here as
doubled stage/input numbers even if the plan text looks right.

Output: one JSON line per query:
  {"query": ..., "wall_s": ..., "jobs": n, "stages": n, "tasks": n,
   "input_mb": x, "shuffle_write_mb": x}

Usage: python tools/runtime_metrics.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    import __spark_entry__ as entrymod
    from lswms_forage_etl_spark import get_spark, lifecycle

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("runtime-metrics",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("Spark UI disabled; cannot read runtime metrics",
              file=sys.stderr)
        sys.exit(1)
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        lifecycle.release_tracked()
        spark.catalog.clearCache()
        seen_stages = {s["stageId"] for s in _api(base, "/stages")}
        seen_jobs = {j["jobId"] for j in _api(base, "/jobs")}
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - isolate per query
            print(json.dumps({"query": name, "error": str(e)[:200]}))
            continue
        wall = time.time() - t0
        stages = [s for s in _api(base, "/stages")
                  if s["stageId"] not in seen_stages
                  and s["status"] != "SKIPPED"]
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in seen_jobs]
        print(json.dumps({
            "query": name,
            "wall_s": round(wall, 3),
            "jobs": len(jobs),
            "stages": len(stages),
            "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
            "input_mb": round(sum(s.get("inputBytes", 0)
                                  for s in stages) / 2**20, 2),
            "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0)
                                          for s in stages) / 2**20, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
