"""Full-surface smoke: run EVERY queries() entry to completion against
a directory (default /root/scale100x) — the zero-failure-at-100x claim
SCALE.md records (round 10: 138/138 OK, 1488 s). Prints OK/FAIL per
query and a DONE summary; exit code = number of failures.

Usage: python tools/smoke_surface.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import __spark_entry__ as em
    from lswms_forage_etl_spark import get_spark, lifecycle

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/scale100x"
    spark = get_spark("smoke-surface", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)})
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    fails = []
    t_all = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            print(f"OK   {name} [{time.time() - t0:.1f}s] "
                  f"({i + 1}/{len(qs)})", flush=True)
        except Exception as e:  # noqa: BLE001 - isolate per query
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        lifecycle.release_tracked()
        spark.catalog.clearCache()
    print(f"DONE {len(qs) - len(fails)}/{len(qs)} ok in "
          f"{time.time() - t_all:.0f}s; fails={fails}", flush=True)
    return len(fails)


if __name__ == "__main__":
    sys.exit(main())
