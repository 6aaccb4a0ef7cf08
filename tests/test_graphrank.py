"""Unit tests for exact-integer PageRank / TextRank
(operators/graphrank.py): the Spark result must equal a pure-Python
replay of the same BIGINT recurrence, bit for bit."""

from __future__ import annotations

from lswms_forage_etl_spark.lifecycle import release_tracked
from lswms_forage_etl_spark.operators.graphrank import (
    DAMPING_PCT,
    PROB_SCALE,
    RANK_SCALE,
    adjacent_token_pairs,
    pagerank_int,
    textrank_tokens,
    token_vocab_top,
)


def _py_pagerank(edges, iterations=10, damping=DAMPING_PCT):
    """Reference replay: identical integer arithmetic, plain dicts."""
    out = {}
    for s, d, w in edges:
        out[s] = out.get(s, 0) + w
    trans = [(s, d, w * PROB_SCALE // out[s]) for s, d, w in edges]
    nodes = sorted({s for s, _, _ in trans})
    r = {n: RANK_SCALE for n in nodes}
    base = RANK_SCALE * (100 - damping) // 100
    for _ in range(iterations):
        c = {}
        for s, d, p in trans:
            rs = r.get(s)  # source-only nodes leave r after iter 1
            if rs is None:
                continue
            c[d] = c.get(d, 0) + rs * p // PROB_SCALE
        r = {d: base + (damping * cv) // 100 for d, cv in c.items()}
    return r


def test_pagerank_matches_python_replay(spark):
    # undirected triangle + pendant, as both-direction edges
    und = [("a", "b", 3), ("b", "c", 2), ("a", "c", 1), ("c", "d", 5)]
    edges = und + [(d, s, w) for s, d, w in und]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["token"]: r["rank_scaled"]
           for r in pagerank_int(df, iterations=10).collect()}
    release_tracked()
    assert got == _py_pagerank(edges, iterations=10)
    # heavier-linked node outranks the pendant
    assert got["c"] > got["d"]


def test_pagerank_distributed_path_identical(spark):
    # driver_gate_edges=0 forces the at-scale DataFrame loop; the
    # BIGINT recurrence must produce the same integers bit for bit
    und = [("a", "b", 3), ("b", "c", 2), ("a", "c", 1), ("c", "d", 5)]
    edges = und + [(d, s, w) for s, d, w in und]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["token"]: r["rank_scaled"]
           for r in pagerank_int(df, iterations=7,
                                 driver_gate_edges=0).collect()}
    release_tracked()
    assert got == _py_pagerank(edges, iterations=7)


def test_pagerank_directed_source_only_node_both_paths(spark):
    # DIRECTED graph where "s" has out-edges but no in-edges: after
    # iteration 1 its rank row disappears; both paths must agree on
    # dropping its later contributions (the inner-join semantics)
    # instead of the driver path raising KeyError (ADVICE r9)
    edges = [("s", "a", 1), ("a", "b", 2), ("b", "a", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    drv = {r["token"]: r["rank_scaled"]
           for r in pagerank_int(df, iterations=5).collect()}
    dist = {r["token"]: r["rank_scaled"]
            for r in pagerank_int(df, iterations=5,
                                  driver_gate_edges=0).collect()}
    release_tracked()
    assert drv == _py_pagerank(edges, iterations=5)
    assert dist == drv


def test_adjacent_pairs_symmetric_no_self_loops(spark):
    docs = spark.createDataFrame(
        [(1, "x y y z"), (2, "x")], "doc_id long, text string")
    rows = [(r["src"], r["dst"])
            for r in adjacent_token_pairs(docs).collect()]
    # "y y" self-loop dropped; single-token doc contributes nothing
    assert sorted(rows) == [("x", "y"), ("y", "x"), ("y", "z"),
                            ("z", "y")]


def test_vocab_cap_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(1, "b a b c a b"), (2, "c a")], "doc_id long, text string")
    # counts: b=3, a=3, c=2 -> top2 = a, b (count desc, token asc)
    top = {r["token"] for r in token_vocab_top(docs, 2).collect()}
    assert top == {"a", "b"}


def test_textrank_end_to_end_replay(spark):
    docs = spark.createDataFrame(
        [(1, "spark scan join scan spark"), (2, "join scan join rare")],
        "doc_id long, text string")
    # vocab top-3: scan(4) join(3) spark(2) — 'rare'(1) excluded
    got = {r["token"]: r["rank_scaled"]
           for r in textrank_tokens(docs, vocab_size=3,
                                    iterations=10).collect()}
    release_tracked()
    und = []
    for toks in (["spark", "scan", "join", "scan", "spark"],
                 ["join", "scan", "join"]):  # 'rare' edge dropped
        for i in range(len(toks) - 1):
            if toks[i] != toks[i + 1]:
                und.append((toks[i], toks[i + 1]))
    counts = {}
    for a, b in und:
        for e in ((a, b), (b, a)):
            counts[e] = counts.get(e, 0) + 1
    edges = [(s, d, w) for (s, d), w in counts.items()]
    assert got == _py_pagerank(edges, iterations=10)
    assert set(got) == {"spark", "scan", "join"}


def test_collocations_dice_exact(spark):
    from lswms_forage_etl_spark.operators.graphrank import (
        collocations_dice)
    docs = spark.createDataFrame(
        [(1, "x y x y z"), (2, "x y q")], "doc_id long, text string")
    rows = {(r["tok_a"], r["tok_b"]): r for r in
            collocations_dice(docs, min_pair_count=2).collect()}
    # f(x y)=3; unigrams: x=3, y=3 -> dice = 2*3/(3+3) = 1.0
    assert set(rows) == {("x", "y")}
    r = rows[("x", "y")]
    assert r["pair_count"] == 3
    assert r["dice_ppm"] == 2 * 3 * 1_000_000 // (3 + 3)


def test_char_diversity_bounds(spark):
    from lswms_forage_etl_spark.operators.graphrank import char_diversity
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "a"), (4, ""), (5, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_diversity(docs).collect()}
    assert got[1]["collision_ppm"] == 1_000_000      # all same char
    assert got[2]["collision_ppm"] == 0              # all distinct
    assert got[3]["collision_ppm"] is None           # n < 2 undefined
    assert got[2]["n_chars"] == 4
    # empty/NULL text yields no row (matches the unnest oracle)
    assert set(got) == {1, 2, 3}


def test_bigram_novelty_fraction(spark):
    from lswms_forage_etl_spark.lifecycle import release_tracked
    from lswms_forage_etl_spark.operators.graphrank import bigram_novelty
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y q r")], "doc_id long, text string")
    # corpus bigram counts: (x,y)=3, (y,x)=1, (y,q)=1, (q,r)=1
    got = {r["doc_id"]: r for r in
           bigram_novelty(docs, rare_threshold=1).collect()}
    release_tracked()
    # doc1: bigrams [xy, yx, xy] -> rare = 1 of 3 (yx)
    assert got[1]["n_bigrams"] == 3
    assert got[1]["novel_ppm"] == 1 * 1_000_000 // 3
    # doc2: [xy, yq, qr] -> rare = 2 of 3
    assert got[2]["novel_ppm"] == 2 * 1_000_000 // 3


def test_triangle_stats_known_graph(spark):
    from lswms_forage_etl_spark.lifecycle import release_tracked
    from lswms_forage_etl_spark.operators.graphrank import (
        token_triangle_stats)
    # one doc building a triangle a-b-c plus a pendant c-d
    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "c d")], "doc_id long, text string")
    # undirected edges: ab, bc, ca, cd -> 1 triangle
    r = token_triangle_stats(docs).collect()[0]
    release_tracked()
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 4
    assert r["n_triangles"] == 1
    # degrees: a=2 b=2 c=3 d=1 -> wedges = 1+1+3+0 = 5
    assert r["n_wedges"] == 5
    assert r["clustering_ppm"] == 3 * 1 * 1_000_000 // 5
