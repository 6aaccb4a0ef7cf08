"""Physical-plan audit: for every queries() entry, walk the executed
plan TREE and report the scale-relevant plan properties —

  scans     : columns read (ReadSchema width) and PushedFilters presence
  joins     : strategy per join (BroadcastHash / SortMerge / BroadcastNL)
  exchanges : shuffle count (BroadcastExchange not counted)
  python    : Arrow-batched python stages (mapInPandas/applyInPandas)

Counting is runtime-truthful (VERDICT r4 item 2): a persisted
(InMemoryRelation) subtree executes ONCE no matter how many plan
references read it, so its joins/shuffles/python stages are counted
once — unlike `explain("formatted")` text, which inlines the cached
subtree's build per reference and overcounts (dedup_semantic showed
py=4 for one Arrow pass; text_contamination 24 shuffles for ~12).
A genuinely UNpersisted duplicated subtree still counts multiply,
because its nodes appear as separate tree branches — the audit still
trips on a missing persist.

Flags (worth a look, not necessarily wrong):
  BNLJ      a BroadcastNestedLoopJoin (O(n*m) comparisons)
  WIDE-SCAN a scan reading >12 columns (projection may not be pruned)

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

JOIN_NODES = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
)
PYTHON_NODES = (
    "MapInPandas", "FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas",
    "ArrowEvalPython", "MapInArrow", "BatchEvalPython",
    "AggregateInPandas",
)


class PlanCounters:
    def __init__(self) -> None:
        self.joins: list[str] = []
        self.shuffles = 0
        self.python = 0
        self.scan_widths: list[int] = []
        self.pushed = 0
        self.seen_caches: set[int] = set()


def _children(node) -> list:
    ch = node.children()
    out = [ch.apply(i) for i in range(ch.size())]
    try:  # scalar/exists subqueries execute too (e.g. jitter precheck agg)
        sq = node.subqueries()
        out.extend(sq.apply(i) for i in range(sq.size()))
    except Exception:
        pass
    return out


def _scan_metadata(node, c: PlanCounters) -> None:
    try:
        md = node.metadata()
    except Exception:
        return
    try:
        if md.contains("ReadSchema"):
            schema = md.apply("ReadSchema")
            inner = schema[schema.find("<") + 1: schema.rfind(">")]
            c.scan_widths.append(len(inner.split(",")) if inner else 0)
        if md.contains("PushedFilters") and md.apply("PushedFilters") != "[]":
            c.pushed += 1
    except Exception:
        pass


def walk(node, c: PlanCounters, jvm) -> None:
    name = node.nodeName()
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        walk(node.initialPlan(), c, jvm)
        return
    for j in JOIN_NODES:
        if name.startswith(j):
            c.joins.append(j)
            break
    if name == "Exchange":  # ShuffleExchangeExec; BroadcastExchange excluded
        c.shuffles += 1
    if any(p in name for p in PYTHON_NODES):
        c.python += 1
    if name.startswith("Scan") or cls.startswith("FileSourceScan"):
        _scan_metadata(node, c)
    if "InMemoryTableScan" in name:
        cached = node.relation().cachedPlan()
        ident = jvm.java.lang.System.identityHashCode(cached)
        if ident not in c.seen_caches:
            c.seen_caches.add(ident)
            walk(cached, c, jvm)  # build cost paid once per relation
        return
    for child in _children(node):
        walk(child, c, jvm)


def main() -> None:
    import __spark_entry__ as entrymod
    from lswms_forage_etl_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm

    flags_total = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            c = PlanCounters()
            walk(df._jdf.queryExecution().executedPlan(), c, jvm)
        except Exception as e:
            print(f"{name:28s} ERROR {e}")
            continue
        finally:
            spark.catalog.clearCache()
        flags = []
        if "BroadcastNestedLoopJoin" in c.joins or "CartesianProduct" in c.joins:
            # bounded broadcast cross products are the INTENT for these:
            # every pair must be scored and one side is catalog-scale
            # (<=50 vectors / <=8 query rows; text_rarity's is the
            # 1-ROW corpus-count aggregate the lazy-plan rewrite cross
            # joins instead of an eager construction-time first()), so
            # nested-loop over a broadcast IS the right plan, not a
            # missed equi-join
            # pack_manifest's is the 1-row data-sized shard-count
            # aggregate (tokens_per_shard derivation), same shape as
            # text_rarity's corpus count
            # text_bm25_topk's is its 1-row corpus-stats aggregate
            # (N, sum_dl, per-term df), the text_rarity shape;
            # sketch_hll_distinct's is the broadcast m=256-row bucket
            # template crossed with the (tiny) distinct-group list
            # sketch_hll_sliding shares sketch_hll_distinct's bounded
            # m=256-row bucket-template cross join (hll_estimate);
            # quality_audit's four BNLJs are fk_violations' 1-row
            # total-count aggregates cross-joined to 1-row orphan
            # counts — bounded on both sides by construction;
            # events_assoc_rules crosses the 1-row session-count agg;
            # graph_triangles crosses two 1-row aggregates (triangle
            # count x degree stats);
            # text_source_divergence crosses the 1-row corpus-size and
            # 1-row p_total aggregates (the folded absent-token mass);
            # text_hybrid_rerank inherits bm25_topk's 1-row corpus-
            # stats cross join (its only BNLJ — the rerank joins are
            # BroadcastHash)
            if name in ("ann_pairwise_label_sim", "ann_topk_join",
                        "text_rarity", "pack_manifest", "text_bm25_topk",
                        "sketch_hll_distinct", "text_bm25_join",
                        "sample_rebalance", "sketch_kmv_jaccard",
                        "sketch_hll_sliding", "quality_audit",
                        "events_assoc_rules", "graph_triangles",
                        "text_source_divergence", "text_hybrid_rerank"):
                flags.append("BNLJ-intentional-bounded")
            else:
                flags.append("BNLJ")
        if any(w > 12 for w in c.scan_widths):
            flags.append("WIDE-SCAN")
        flags_total += len([f for f in flags if "intentional" not in f])
        jsum = ",".join(j.replace("Join", "") for j in c.joins) or "-"
        print(f"{name:28s} joins={jsum:<40s} shuffles={c.shuffles} "
              f"py={c.python} scans={c.scan_widths} pushed={c.pushed} "
              f"{' '.join('[' + f + ']' for f in flags)}")
    print(f"\n{flags_total} flags")


if __name__ == "__main__":
    main()
