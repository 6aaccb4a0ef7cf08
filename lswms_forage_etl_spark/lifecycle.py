"""Stage-table lifecycle: deterministic release of persisted intermediates.

Operators that self-join a derived table MUST materialize it first (the
measured double-eval hazards in `operators/dedup.py` / `similarity.py`),
but a lazily-returned result means the operator cannot unpersist before
the caller's consuming action. The contract (VERDICT r4 item 6):

- every operator/query persist() (and localCheckpoint cleanup) is
  registered with `track(...)` at the call site;
- the caller runs its consuming action, then calls `release_tracked()`;
- `assert_no_cached_rdds(spark)` verifies nothing leaked — the oracle
  gate calls it after every query, so a persist that skipped track()
  fails the gate, not a long-lived production session.

A module-level registry (not per-DataFrame attachment) is deliberate:
attachments on a DataFrame are lost by ANY derivation (`.where`,
`.select`), which is exactly how persists leak. The registry is scoped
to "since the last release" — callers interleaving independent
pipelines should release at their own pipeline boundaries.

At 100 TB scale these persists become parquet stage tables with explicit
TTLs; this module is the local-mode equivalent of that discipline.
"""

from __future__ import annotations

from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

_TRACKED: list = []

H = TypeVar("H")


def track(handle: H) -> H:
    """Register a persisted DataFrame (or a zero-arg cleanup callable)
    for release at the caller's next release_tracked(). Returns the
    handle so persists chain inline:  sig = track(df.persist())."""
    _TRACKED.append(handle)
    return handle


def release_tracked() -> int:
    """Unpersist every tracked stage table / run every tracked cleanup,
    oldest first. Returns the number of handles released. Idempotent —
    unpersisting an already-released table is a no-op."""
    n = 0
    for h in _TRACKED:
        try:
            if isinstance(h, DataFrame):
                h.unpersist()
            elif callable(h):
                h()
            n += 1
        except Exception:  # noqa: BLE001 — release must never mask results
            pass
    _TRACKED.clear()
    return n


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of RDDs currently holding cached blocks (covers BOTH
    DataFrame-level persist() and RDD-level localCheckpoint storage,
    which `spark.catalog.clearCache()` does NOT touch)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def unpersist_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    """Drop cached blocks for the given RDD ids (no-op for ids already
    cleaned). Used to free superseded localCheckpoint rounds, which have
    no DataFrame-level unpersist handle."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in list(jmap.keySet().toArray()):
        if int(k) in ids:
            jmap.get(k).unpersist(False)


def assert_no_cached_rdds(spark: SparkSession, context: str = "") -> None:
    """Raise if any RDD still holds cached blocks — the gate-side check
    that every operator registered its persists via track()."""
    left = persistent_rdd_ids(spark)
    if left:
        raise AssertionError(
            f"cached RDDs leaked{' after ' + context if context else ''}: "
            f"rdd ids {sorted(left)} — a persist()/localCheckpoint was not "
            f"registered via lifecycle.track()")


def stage_table(df: DataFrame) -> DataFrame:
    """Persist + EAGERLY materialize + track a stage table.

    Eager, not lazy, because materialization points must carry accurate
    statistics: a lazily-persisted table's InMemoryRelation reports its
    CHILD plan's estimate at planning time, and for expression-expanded
    derivations (banded LSH signatures: small parquet text -> millions
    of hash rows) that estimate is far below the real size — measured at
    the 100x slice, the banded self-join chose a broadcast whose build
    side needed ~2 GB and aborted the job. After an eager materialize
    the join planner sees the cached table's REAL size and picks
    broadcast vs shuffle correctly at every scale, which is exactly how
    a parquet/Delta stage table behaves on a cluster (written once,
    stats known). The extra action costs one job whose work would have
    run anyway at first consumption."""
    out = track(df.persist())
    out.count()
    return out
