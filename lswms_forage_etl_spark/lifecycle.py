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
    # pending-lazy entries die with their query's lifecycle window —
    # without this, bench runs (which never assert) would accumulate
    # stale ids across queries
    _LAZY_PENDING.clear()
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


EAGER_STATS_THRESHOLD_BYTES = 8 << 20
"""Estimated-size gate for eager materialization (round-7 adaptive rule).

Both eager-materialization hazards are SCALE hazards, so the decision is
made from the subtree's Catalyst size estimate instead of a constant:

- a lazily-persisted stage table reports its CHILD plan's estimate to
  the join planner, and for expression-expanded derivations that lie
  planned a ~2 GB broadcast at the 100x slice (round-5 lesson) — but a
  lie about a table that is genuinely tiny picks the same plan eager
  stats would;
- AQE's concurrently-submitted exchange stages race a lazy cache's
  first materialization and each re-evaluate the subtree (13 parquet
  re-scans measured) — dominant at 100x (text_contamination 27.4 s lazy
  vs 12.5 s eager) yet cheaper than the serialized eager construction
  job at sf0.1, where the round-6 A/B put lazy AHEAD by ~0.2 s.

Measured estimates for the LSH base table: 255 KB at sf0.1, 2.6 MB at
the 10x slice, 30.6 MB at 100x. 8 MiB splits the regimes with margin on
both sides; Catalyst's unknown-size default (spark.sql.defaultSizeInBytes
= Long.MaxValue, e.g. LogicalRDD-rooted lineage) lands on eager, the
safe at-scale choice."""


def plan_size_estimate(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate in bytes (file-scan sizes
    scaled through projections/filters; Long.MaxValue when unknown)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats()
               .sizeInBytes())


def should_materialize_eagerly(df: DataFrame) -> bool:
    """The round-7 adaptive eager/lazy rule (see
    EAGER_STATS_THRESHOLD_BYTES)."""
    return plan_size_estimate(df) >= EAGER_STATS_THRESHOLD_BYTES


_COUNT_THREADS: dict[int, object] = {}
"""id(staged df) -> its in-flight async count thread (r15). Cleared by
release_tracked() via the tracked join callables; entries are only read
by stage_table(after=...) within one operator's construction window."""

_LAZY_PENDING: dict[int, str] = {}
"""id(stage_lazy df) -> short plan description, while the lazy link has
NOT yet been covered by a downstream counted stage_table (r16, VERDICT
r15 item 7). stage_lazy's safety is a calling convention — no join may
be planned against an uncounted interior link (the round-5 stats-lie
hazard) and a counted chain tail must materialize it — and this registry
makes the second half programmatic: a stage_lazy link that no subsequent
stage_table count ever covers stays pending, and the oracle gate fails
the query (`assert_no_unresolved_lazy`). Coverage is lexical: a
stage_table call snapshots the currently-pending ids and clears them
when its count LANDS (the count job materializes every ancestor cache;
all current call sites stage their lazies immediately before their chain
tail). The in-between hazard — a join planned against a pending link
before the tail count lands — is a planning-time event this post-hoc
check cannot see; the backstop enforces the structural half of the
contract."""


def stage_table(df: DataFrame, sync: bool | None = None,
                after: DataFrame | None = None) -> DataFrame:
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
    run anyway at first consumption.

    Unlike `_ckpt_tracked` (operators/dedup.py), this stays eager at
    EVERY scale: the round-7 A/B that made checkpoints adaptive also
    measured lazy stage tables LOSING at sf0.1 (text_contamination
    1.1 s eager vs 2.3 s lazy) — with a lazy persist the
    InMemoryRelation's child-derived estimate (255 KB) sat under the
    broadcast threshold, so the planner BROADCAST the ~50 MB-real
    shingle table into each consumer join.

    Whether the count BLOCKS is scale-adaptive (same estimate gate as
    `_ckpt_tracked`): below the threshold it runs on a BACKGROUND
    thread — cluster-side work while the caller's next ~0.5 s is
    driver-side py4j plan construction, so overlapping hides the count
    entirely (measured: dedup_lsh_pairs 1.28 s sync vs ~1.0 s async at
    sf0.1). Above the threshold it blocks: there the count is LONG
    (the subtree is the expensive part) and the caller's consumers
    reach their action while the cache is still materializing — the
    racing evaluations cost more than the serialization (measured:
    text_eval_overlap at the 100x slice, 12.0 s sync vs 20.9 s async).
    For the async path, stats stay correct for planning because
    physical planning (where the join planner reads IMR stats) happens
    at the caller's ACTION, after the short count lands; a mis-planned
    lost race is bounded — a table big enough for a mis-broadcast to
    hurt has a child estimate above the broadcast threshold, so the
    stale estimate still picks the safe shuffle plan. The thread
    handle is tracked so release_tracked() joins it before unpersist.

    `after` (r15): CHAINED stage tables — when this table DERIVES from
    another staged table, two independent async counts race and the
    child's count re-evaluates the parent's whole subtree from source
    (the round-6 lazy-race lesson, stage_table-chain variant: the r15
    stage probe measured FOUR duplicate ~8 s 5-gram explode stages
    behind text_perplexity_kn5). Passing the parent handle makes this
    table's count wait for the parent's count first, so each chain link
    reads its parent's materialized cache: no duplicated work (the
    at-scale / low-core-count win) and no driver serialization (a
    sync=True chain measured +0.7 s at sf0.1 — the counts' job walls
    serialize into the query wall)."""
    import threading

    out = df.persist()
    if sync is None:
        sync = should_materialize_eagerly(df)
    # this count covers every CURRENTLY-pending stage_lazy link (all
    # call sites stage interior links immediately before their chain
    # tail, so the pending set is exactly this chain's ancestors)
    covered = list(_LAZY_PENDING)
    if sync:
        track(out)
        out.count()
        for k in covered:
            _LAZY_PENDING.pop(k, None)
        return out
    parent_t = (_COUNT_THREADS.get(id(after))
                if after is not None else None)

    def _run() -> None:
        if parent_t is not None:
            parent_t.join(timeout=600)
        out.count()
        for k in covered:
            _LAZY_PENDING.pop(k, None)

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    _COUNT_THREADS[id(out)] = t

    def _finish(out_id: int = id(out)) -> None:
        t.join(timeout=600)
        _COUNT_THREADS.pop(out_id, None)

    # join tracked BEFORE the persist handle: release_tracked() runs
    # oldest-first, and the in-flight count must land before unpersist
    track(_finish)
    track(out)
    return out


def stage_lazy(df: DataFrame) -> DataFrame:
    """Persist + track WITHOUT a counting job — for the INTERIOR links
    of a staged derivation chain whose TAIL is a counted `stage_table`
    (r15): computing any InMemoryRelation partition caches it as a side
    effect, so one count of the chain tail materializes every parent
    cache in the SAME job. The per-link count jobs the `after=` chain
    used to run added only driver round-trips (4 jobs → 1 for the kn5
    c5→cont4→cont3→cont2 chain). Safe ONLY when (a) a downstream
    stage_table's count covers this table before any consumer action
    plans against it (its stats are then real), and (b) no join is
    planned against it in between (the round-5 lazy stats-lie hazard).
    Callers must still `await_staged` the chain tail. Misuse of (a) is
    caught programmatically: the link registers as PENDING and only a
    subsequent stage_table's landed count clears it — the oracle gate
    fails any query that leaves a lazy link uncovered
    (`assert_no_unresolved_lazy`)."""
    out = df.persist()
    track(out)
    try:
        desc = df._jdf.queryExecution().logical().nodeName()
    except Exception:  # noqa: BLE001 — description is best-effort
        desc = "?"
    _LAZY_PENDING[id(out)] = desc
    return out


def await_staged(df: DataFrame) -> DataFrame:
    """Block until `df`'s async stage_table count has landed (no-op for
    sync-staged or unstaged frames). Call at the END of an operator's
    construction when the returned plan has MANY concurrent consumers
    of the staged table (broadcast-build futures + AQE stages): each
    concurrent consumer of a still-cold cache recomputes its partitions
    independently (in-flight cache-partition computation is not shared
    across jobs), so ten broadcast builds racing one cold cache cost
    ten evaluations of its subtree — the r15 stage probe measured ~50 s
    of duplicated executor work behind text_perplexity_kn5's ten
    lookup builds. Awaiting here overlaps the count with the caller's
    plan construction (unlike sync=True, which serializes it before
    any construction) and guarantees consumers find warm blocks."""
    t = _COUNT_THREADS.get(id(df))
    if t is not None:
        t.join(timeout=600)
    return df


def assert_no_unresolved_lazy(context: str = "") -> None:
    """Raise if any stage_lazy link was never covered by a downstream
    counted stage_table (r16, VERDICT r15 item 7 — the programmatic
    half of the stage_lazy contract). Joins in-flight count threads
    first so an async tail count that WILL cover a link gets to land.
    The oracle gate calls this after every query, so a future caller
    who persists an interior link without chaining a counted tail
    fails the gate instead of re-exposing the round-5 stats-lie
    broadcast at 100x."""
    for t in list(_COUNT_THREADS.values()):
        try:
            t.join(timeout=600)
        except Exception:  # noqa: BLE001
            pass
    if _LAZY_PENDING:
        descs = sorted(_LAZY_PENDING.values())
        _LAZY_PENDING.clear()
        raise AssertionError(
            f"stage_lazy link(s) never covered by a counted stage_table"
            f"{' after ' + context if context else ''}: {descs} — chain "
            f"a stage_table tail (its count materializes the link) or "
            f"use stage_table directly")


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-local rows -> DataFrame via the Arrow path (guide §4 —
    eliminate the Python boundary). A plain-tuples createDataFrame
    executes as a pickled RDD: every downstream task spawns a Python
    worker just to unpickle its slice (measured r15: 8.1 executor-
    seconds / 0.3-1.3 s wall for a 500-row table under the noop sink);
    feeding the SAME rows through a pandas DataFrame serializes them
    ONCE via Arrow on the driver and executes as a pure JVM scan
    (~0.05 s). Value-identical except float NaN (Arrow maps NaN ->
    null where pickle keeps NaN), so any row containing a float NaN
    falls back to the tuple path; results are otherwise bit-identical
    (pinned by the oracle gate for every converted call site).

    Use for every size-gated driver-computed result (union-find
    clusters, pagerank/BFS driver paths, trainer vocabularies, period
    tables): these are exactly the tables small enough that per-task
    Python worker spawn dominates their execution."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)

    def _has_nan(r) -> bool:
        return any(isinstance(v, float) and v != v for v in r)

    try:
        if any(_has_nan(r) for r in rows):
            return spark.createDataFrame(rows, schema)
        import pandas as pd
        ncols = len(rows[0])
        pdf = pd.DataFrame({str(i): pd.Series([r[i] for r in rows],
                                              dtype=object)
                            for i in range(ncols)})
        return spark.createDataFrame(pdf, schema)
    except Exception:
        # semantics over speed: any Arrow/pandas conversion surprise
        # (exotic element type, version drift) degrades to the exact
        # tuple path rather than failing the query
        return spark.createDataFrame(rows, schema)
