"""Iterative graph ranking (TextRank / weighted PageRank) in exact
integer arithmetic.

Beyond the reference surface (no graph operators there), but a canonical
iterative-algorithm family an analytics engine must express: keyword
extraction ranks tokens by a damped random walk over the token
co-occurrence graph (TextRank, Mihalcea & Tarau 2004 — public paper).

Engine-portability discipline: float PageRank never hash-matches across
engines (sum order, damping multiplies), so every quantity here is
BIGINT —

    p(u->v)   = w(u,v) * Q  div  out(u)          (transition, Q = 1e6)
    r_0(v)    = S                                (S = 1e9)
    r_{k+1}(v)= S*(100-d)//100 + d * SUM_u( r_k(u) * p(u->v) div Q ) div 100

with d = 85 (damping percent). Integer sums commute, so the result is
bit-stable under any partitioning, and the DuckDB oracle can replay the
identical recurrence. Overflow audit (ANSI mode would throw, not wrap):
total mass converges to ~S*V, so r <= S*V = 1e9 * 128 ~ 1.3e11;
r * p <= 1.3e11 * 1e6 = 1.3e17 << int64 max 9.2e18.

Scale shape (100 TB): the ONLY corpus-scale stages are the token count
(vocab top-V) and the adjacent-pair aggregation — both single shuffles
with map-side combine on uniform keys. The graph itself is bounded by
the vocab cap (<= V^2 edges), so the transition table is persisted once
(`lifecycle.stage_table` — real stats for the iteration joins) and the
k fixed-point iterations run as broadcast-scale joins on it; iteration
cost is INDEPENDENT of corpus size. This is the same bounded-core
pattern as dedup's gated union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lswms_forage_etl_spark.lifecycle import stage_table

RANK_SCALE = 10 ** 9   # S: initial/base rank units
PROB_SCALE = 10 ** 6   # Q: transition-probability quantization
DAMPING_PCT = 85


def adjacent_token_pairs(docs: DataFrame, text_col: str = "text",
                         ordered: bool = False) -> DataFrame:
    """Adjacent-token co-occurrence rows, self-loops dropped. Default
    emits BOTH directions per adjacency (the undirected TextRank
    window-2 graph); ``ordered=True`` keeps reading-order bigrams
    (collocation statistics). The shifted-slice zip builds pairs
    without re-tokenizing per element (the round-5 interpreted-HOF
    lesson)."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    d = docs.select(toks.alias("toks"))
    n = F.size("toks")
    a = F.slice("toks", 1, n - 1)
    b = F.expr("slice(toks, 2, size(toks) - 1)")
    pairs = (d.where(n >= 2)
             .select(F.explode(F.arrays_zip(a.alias("a"), b.alias("b")))
                     .alias("p"))
             .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
             .where(F.col("a") != F.col("b")))
    if ordered:
        return pairs.select(F.col("a").alias("src"),
                            F.col("b").alias("dst"))
    # both directions via ONE explode — a self-union would duplicate
    # the corpus scan (each union branch re-reads the source)
    return (pairs.select(F.explode(F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))))
        .alias("e"))
        .select("e.src", "e.dst"))


def token_vocab_top(docs: DataFrame, vocab_size: int,
                    text_col: str = "text") -> DataFrame:
    """Top-V tokens by total occurrence count, ties broken by token asc
    (deterministic). Single shuffle + global TakeOrdered."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    return (docs.select(F.explode(toks).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("_c"))
            .orderBy(F.desc("_c"), F.asc("token"))
            .limit(vocab_size)
            .select("token"))


DRIVER_GATE_EDGES = 2_000_000
"""Edge count under which the fixed-point iterates on the driver —
the same size-gate pattern (and threshold) as dedup's union-find: the
graph is BOUNDED by construction (vocab cap), so spending 10 rounds of
distributed stage overhead on <= V^2 rows is pure scheduling waste.
The distributed loop below stays as the at-scale path."""


def _pagerank_driver(edge_rows, iterations: int, damping_pct: int):
    """Driver fixed-point: identical BIGINT recurrence in Python ints
    (arbitrary precision, so the int64 overflow audit above is the
    binding constraint, not this path)."""
    out: dict = {}
    for s, d, w in edge_rows:
        out[s] = out.get(s, 0) + w
    trans = [(s, d, w * PROB_SCALE // out[s]) for s, d, w in edge_rows]
    base = RANK_SCALE * (100 - damping_pct) // 100
    r = {n: RANK_SCALE for n in out}
    for _ in range(iterations):
        c: dict = {}
        for s, d, p in trans:
            # source-only nodes (out-edges but no in-edges) drop out of
            # r after iteration 1; the distributed path's inner join
            # skips their contributions — mirror that here so both
            # paths stay a pure physical-plan choice on directed graphs
            rs = r.get(s)
            if rs is None:
                continue
            c[d] = c.get(d, 0) + rs * p // PROB_SCALE
        r = {d: base + (damping_pct * cv) // 100 for d, cv in c.items()}
    return sorted(r.items())


def pagerank_int(edges: DataFrame, iterations: int = 10,
                 damping_pct: int = DAMPING_PCT,
                 driver_gate_edges: int = DRIVER_GATE_EDGES) -> DataFrame:
    """Exact-integer damped PageRank over a directed edge list
    (src, dst, w BIGINT). Every node must have out-degree >= 1 (an
    undirected graph emitted as both directions satisfies this — no
    dangling-mass term needed). Returns (token, rank_scaled).

    Both paths compute the SAME integers: the recurrence is all BIGINT,
    so driver vs distributed is a pure physical-plan choice."""
    # edges feeds BOTH the out-degree agg and the transition join —
    # persist first or each consumer re-executes the corpus-scale
    # upstream (round-4 lesson). SYNC: the iteration plan holds 10+
    # exchange stages that AQE submits concurrently; a background
    # count races the cold cache and the stages re-evaluate the
    # subtree (12 parquet re-scans measured in the audited plan)
    edges = stage_table(edges, sync=True)
    spark = edges.sparkSession
    if edges.count() <= driver_gate_edges:
        ranked = _pagerank_driver(
            [(r["src"], r["dst"], r["w"]) for r in edges.collect()],
            iterations, damping_pct)
        from lswms_forage_etl_spark.lifecycle import local_df
        return local_df(spark, ranked, "token string, rank_scaled long")
    out = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    trans = (edges.join(F.broadcast(out), "src")
             .select("src", "dst",
                     F.expr(f"w * {PROB_SCALE} div outw").alias("p")))
    # referenced once per iteration — cheap (<= V^2 cached rows) but
    # re-deriving it 10x would rebuild the out broadcast per iteration
    trans = stage_table(trans, sync=True)
    base = RANK_SCALE * (100 - damping_pct) // 100
    ranks = (trans.select(F.col("src").alias("token")).distinct()
             .select("token",
                     F.lit(RANK_SCALE).cast("long").alias("r")))
    for _ in range(iterations):
        contrib = (trans.join(ranks.withColumnRenamed("token", "src"),
                              "src")
                   .groupBy("dst")
                   .agg(F.sum(F.expr(f"r * p div {PROB_SCALE}"))
                        .alias("c")))
        ranks = contrib.select(
            F.col("dst").alias("token"),
            F.expr(f"{base} + ({damping_pct} * c) div 100").alias("r"))
    return ranks.select("token", F.col("r").alias("rank_scaled"))


def textrank_tokens(docs: DataFrame, vocab_size: int = 24,
                    iterations: int = 10,
                    text_col: str = "text") -> DataFrame:
    """TextRank keyword scores: adjacent-pair graph restricted to the
    top-V vocab, then integer PageRank. Output (token, rank_scaled),
    one row per vocab token that co-occurs with another vocab token."""
    # the vocab is BOUNDED by construction (<= vocab_size rows) — a
    # driver fetch of it is the gated-small-side pattern (union-find /
    # GWR precedent), and an isin() literal beats two semi joins: the
    # membership predicate evaluates map-side inside the pair scan
    # (no broadcast builds, no duplicated vocab subtree in the plan)
    vocab = [r["token"] for r in
             token_vocab_top(docs, vocab_size, text_col).collect()]
    pairs = adjacent_token_pairs(docs, text_col)
    in_vocab = pairs.where(F.col("src").isin(vocab)
                           & F.col("dst").isin(vocab))
    edges = (in_vocab.groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("w")))
    return pagerank_int(edges, iterations)


def collocations_dice(docs: DataFrame, min_pair_count: int = 5,
                      text_col: str = "text") -> DataFrame:
    """Collocation detection: ordered adjacent bigrams scored by the
    Dice coefficient 2*f(ab)/(f(a)+f(b)), emitted as exact-integer ppm
    (2*f(ab)*1e6 div (f(a)+f(b))) — overflow-safe (2e6 * f(ab) stays
    far under int64) and engine-portable with no float contract, unlike
    log-based PMI. Output: (tok_a, tok_b, pair_count, dice_ppm).

    Scale shape: the bigram tail is pruned by min_pair_count BEFORE the
    unigram joins (the tail dominates the bigram table at corpus
    scale); the two token-key joins are the classic skew-join site
    (frequent words concentrate) — AQE skew-split handles byte-level
    skew there, and the unigram side aggregates map-side first."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    # consumed twice (tok_a and tok_b joins) — persist or each join
    # side re-runs the corpus-scale unigram aggregation (size-adaptive
    # eager/lazy per the round-7 rule)
    uni = stage_table(
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("c")))
    pairs = adjacent_token_pairs(docs, text_col, ordered=True)
    cab = (pairs.groupBy(F.col("src").alias("tok_a"),
                         F.col("dst").alias("tok_b"))
           .agg(F.count(F.lit(1)).alias("pair_count"))
           .where(F.col("pair_count") >= min_pair_count))
    ua = uni.select(F.col("token").alias("tok_a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("token").alias("tok_b"), F.col("c").alias("cb"))
    return (cab.join(ua, "tok_a").join(ub, "tok_b")
            .select("tok_a", "tok_b", "pair_count",
                    F.expr("(2 * pair_count * 1000000) div (ca + cb)")
                    .alias("dice_ppm")))


def char_diversity(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Character-collision (Simpson) index per document: the
    probability two random character draws collide,
    sum_i c_i*(c_i-1) / (n*(n-1)), as exact-integer ppm. High values
    flag low-entropy/gibberish text (aaaa...) without any log() —
    the same quality-gate family as Gopher/C4 but distribution-based.
    Docs with n < 2 are emitted with collision_ppm = NULL.

    SCAN-SIDE, no shuffle: per-char counts come from replace
    arithmetic (c_i = len(text) - len(replace(text, ch_i, '')), the
    round-7 BPE-count trick) over the doc's DISTINCT chars, folded
    with an aggregate HOF — O(alphabet * n) compute per doc but zero
    exchange. Measured at the 100x slice: explode + (doc, char)
    shuffle 14.4 s, this 9.7 s; a sorted-run single-pass fold (struct
    accumulator) measured 10.0 s — interpreted struct allocs eat the
    O(n) advantage, so the simpler replace form stays. The lambda
    references only raw COLUMN refs (cheap), not re-evaluated
    expressions (the round-5 interpreted-HOF hazard)."""
    from lswms_forage_etl_spark.operators.dedup import _spread
    t = F.col(text_col)
    counts = F.expr(
        f"transform(array_distinct(filter(split({text_col}, ''), "
        f"c -> c <> '')), ch -> length({text_col}) - "
        f"length(replace({text_col}, ch, '')))")
    coll = F.aggregate(
        counts, F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long") * (x.cast("long") - 1))
    # empty/NULL text yields NO row (matches the unnest-based oracle,
    # which emits nothing for a doc with zero characters) — without
    # this filter the row sets only match by testdata luck
    return (_spread(docs.select(id_col, text_col)
                    .where(t.isNotNull() & (F.length(t) > 0)))
            .select(id_col,
                    F.length(t).cast("long").alias("n_chars"),
                    coll.alias("_coll"))
            .select(id_col, "n_chars",
                    F.when(F.col("n_chars") >= 2,
                           F.expr("(_coll * 1000000)"
                                  " div (n_chars * (n_chars - 1))"))
                    .alias("collision_ppm")))


def bigram_novelty(docs: DataFrame, rare_threshold: int = 25,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Bigram-novelty quality score: the exact-ppm fraction of a doc's
    adjacent-bigram OCCURRENCES whose corpus-wide count is <= the rare
    threshold — the count-based stand-in for LM perplexity filtering
    (CCNet-style): gibberish and boilerplate-mutated text is rich in
    corpus-rare bigrams. No logs, no float contract.

    Scale shape: doc bigrams join the corpus bigram-count table on the
    uniform (a, b) key — both sides corpus-derived, the count side
    aggregated first (two-phase, map-side combine)."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    d = docs.select(id_col, toks.alias("toks"))
    n = F.size("toks")
    a = F.slice("toks", 1, n - 1)
    b = F.expr("slice(toks, 2, size(toks) - 1)")
    bg = (d.where(n >= 2)
          .select(id_col,
                  F.explode(F.arrays_zip(a.alias("a"), b.alias("b")))
                  .alias("p"))
          .select(id_col, F.col("p.a").alias("a"),
                  F.col("p.b").alias("b"))
          .where(F.col("a") != F.col("b")))
    bg = stage_table(bg)  # consumed by both the count agg and the join
    counts = (bg.groupBy("a", "b")
              .agg(F.count(F.lit(1)).alias("cb")))
    j = bg.join(counts, ["a", "b"])
    return (j.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum(F.when(F.col("cb") <= rare_threshold, 1)
                       .otherwise(0)).alias("_rare"))
            .select(id_col, "n_bigrams",
                    F.expr("(_rare * 1000000) div n_bigrams")
                    .alias("novel_ppm")))


def token_triangle_stats(docs: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Triangle census of the token co-occurrence graph: node/edge
    counts, triangles, wedges, and the global clustering coefficient
    (3*triangles/wedges) in exact ppm. Triangles use the ORIENTED-EDGE
    pattern — edges point from the (degree, node)-smaller endpoint to
    the larger, so each node's out-neighborhood is bounded by
    sqrt(2*|E|) and the wedge self-join fan cannot explode on hubs
    (the standard at-scale triangle recipe). Every count is integer."""
    pairs = adjacent_token_pairs(docs, text_col, ordered=True)
    e = (pairs.select(F.least("src", "dst").alias("a"),
                      F.greatest("src", "dst").alias("b"))
         .distinct())
    e = stage_table(e)  # degrees + orientation + wedge join all read it
    deg = (e.select(F.col("a").alias("node"))
           .unionByName(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    deg = stage_table(deg)
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    oriented = (e.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
                .select(
                    F.when((F.col("dega") < F.col("degb"))
                           | ((F.col("dega") == F.col("degb"))
                              & (F.col("a") < F.col("b"))),
                           F.col("a")).otherwise(F.col("b")).alias("u"),
                    F.when((F.col("dega") < F.col("degb"))
                           | ((F.col("dega") == F.col("degb"))
                              & (F.col("a") < F.col("b"))),
                           F.col("b")).otherwise(F.col("a")).alias("v")))
    oriented = stage_table(oriented)
    o2 = oriented.select(F.col("u").alias("u"), F.col("v").alias("w"))
    wedge = (oriented.join(o2, "u")
             .where(F.col("v") < F.col("w")))
    closing = (e.select(F.least("a", "b").alias("v"),
                        F.greatest("a", "b").alias("w")))
    tri = (wedge.join(closing, ["v", "w"], "left_semi")
           .agg(F.count(F.lit(1)).alias("n_triangles")))
    stats = (deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("long")
        .alias("n_wedges")))
    return (stats.crossJoin(tri)
            .select("n_nodes", "n_edges", "n_triangles", "n_wedges",
                    F.expr("(3 * n_triangles * 1000000) div n_wedges")
                    .alias("clustering_ppm")))


def _bfs_driver(edge_rows, source: str, max_hops: int):
    """Driver BFS over collected edges — identical semantics to the
    distributed frontier loop."""
    adj: dict = {}
    for s, d in edge_rows:
        adj.setdefault(s, []).append(d)
    dist = {source: 0}
    frontier = [source]
    for hop in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return sorted(dist.items())


def bfs_hops(edges: DataFrame, source: str, max_hops: int = 10,
             driver_gate_edges: int = DRIVER_GATE_EDGES) -> DataFrame:
    """BFS hop distance from `source` over a directed edge list
    (src, dst) — the iterative-frontier twin of pagerank_int, and the
    engine's answer to recursive CTEs (which the DuckDB oracle uses to
    check it). Unreached nodes are absent. Size-gated driver walk with
    the distributed frontier loop (join + anti-join per hop, lineage
    truncated by the persisted visited table) as the at-scale path."""
    edges = stage_table(edges.select("src", "dst"), sync=True)
    spark = edges.sparkSession
    if edges.count() <= driver_gate_edges:
        rows = _bfs_driver([(r["src"], r["dst"])
                            for r in edges.collect()], source, max_hops)
        from lswms_forage_etl_spark.lifecycle import local_df
        return local_df(spark, rows, "token string, hops int")
    visited = spark.createDataFrame([(source, 0)],
                                    "token string, hops int")
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (edges.join(frontier.withColumnRenamed("token", "src"),
                          "src")
               .select(F.col("dst").alias("token"))
               .distinct()
               .join(visited, "token", "left_anti")
               .select("token", F.lit(hop).alias("hops")))
        nxt = stage_table(nxt, sync=True)
        if nxt.count() == 0:
            break
        visited = stage_table(visited.unionByName(nxt), sync=True)
        frontier = nxt
    return visited
