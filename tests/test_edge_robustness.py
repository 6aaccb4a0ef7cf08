"""Edge-case robustness: null/empty text through the text/dedup surface,
python-reference jaccard property check, append-mode sinks, bandwidth
search sanity."""

from __future__ import annotations

import datetime as dt

import numpy as np
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from lswms_forage_etl_spark import schemas
from lswms_forage_etl_spark.functions import text as T
from lswms_forage_etl_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard,
    shingle_table,
)
from lswms_forage_etl_spark.sources import read_raster_cells, write_partitioned


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_text_functions_on_degenerate_inputs(spark):
    df = _docs(spark, ["", "   ", "x", None, "a b c d e"])
    out = df.select(
        "doc_id",
        T.token_count("text").alias("tc"),
        T.bpe_ish_token_count("text").alias("bc"),
        F.round(T.punct_ratio("text"), 4).alias("pr"),
        T.quality_score("text").alias("q"),
        T.lang_id("text").alias("lang"),
        T.fingerprint("text").alias("fp"),
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert got[0]["tc"] == 0 and got[1]["tc"] == 0
    assert got[2]["tc"] == 1 and got[4]["tc"] == 5
    assert got[0]["lang"] == "und"
    # null text propagates NULL, never crashes
    assert got[3]["tc"] is None and got[3]["fp"] is None
    # empty and whitespace-only normalize to the same fingerprint
    assert got[0]["fp"] == got[1]["fp"]


def test_shingles_below_k_and_dedup_with_nulls(spark):
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    df = _docs(spark, ["one two", "one two", None, "one two three four"])
    sh = {r["doc_id"]: r["sh"] for r in shingle_table(df).collect()}
    assert sh[0] == []                       # < k tokens -> empty set
    # r15: elements are the 60-bit int64 md5 truncation of each shingle
    assert sh[3] == [h60("one two three"), h60("two three four")]
    # exact dedup groups the identical pair; null text forms its own group
    groups = exact_dedup(df).collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in groups}
    assert by_id[0] == 2


def _py_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = [w for w in a.lower().split() if w] if t is a else \
            [w for w in b.lower().split() if w]
        return {" ".join(toks[i:i + k]) for i in range(max(len(toks) - k + 1, 0))}
    sa, sb = sh(a), sh(b)
    u = sa | sb
    return len(sa & sb) / len(u) if u else 0.0


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40), min_size=2, max_size=2))
def test_jaccard_matches_python_reference(spark, texts):
    a, b = texts
    df = _docs(spark, [a, b])
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    got = ngram_jaccard(df, pairs).collect()[0]["jaccard"]
    want = round(_py_jaccard(a, b), 6)
    assert abs(got - want) < 2e-6, (a, b, got, want)


def test_partitioned_append_mode(spark, tmp_path):
    path = str(tmp_path / "r")
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    c1 = spark.createDataFrame([(d1, 0, 0, 1.0)], schemas.RASTER_CELLS)
    c2 = spark.createDataFrame([(d2, 0, 0, 2.0)], schemas.RASTER_CELLS)
    write_partitioned(c1, path)
    write_partitioned(c2, path, mode="append")
    back = read_raster_cells(spark, path)
    assert back.count() == 2
    assert {r["value"] for r in back.collect()} == {1.0, 2.0}


def test_bandwidth_search_prefers_signal_scale(spark):
    from lswms_forage_etl_spark.models.gwr import select_bandwidth
    rng = np.random.RandomState(1)
    n = 400
    coords = rng.uniform(0, 10, (n, 2))
    x = rng.uniform(0, 1, (n, 1))
    y = 0.5 * x[:, 0] + rng.normal(0, 0.01, n)
    bw = select_bandwidth(coords, x, y, lo=16)
    assert 16 <= bw <= n - 1                 # in-range, converged


def test_round2_operators_on_degenerate_inputs(spark):
    """Empty / unicode / single-row inputs through the round-2 operators:
    no crashes, sane results."""
    from lswms_forage_etl_spark.operators.dedup import (
        duplicate_clusters,
        ngram_containment,
        simhash,
    )
    from lswms_forage_etl_spark.operators.sampling import (
        group_cap,
        stratified_sample,
    )
    from lswms_forage_etl_spark.operators.similarity import (
        embedding_near_dups,
        label_centroids,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "naïve café 模型 🚀"), (3, "solo")],
        "doc_id long, text string")
    # simhash: empty/whitespace docs fold to signature 0, no crash
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sigs[0] == 0 and sigs[1] == 0 and sigs[2] != 0

    # clusters of an empty pair set: no rows, no non-convergence error
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert duplicate_clusters(empty_pairs).count() == 0

    # containment on a pair with an empty side: defined (0.0), not NaN
    pair = spark.createDataFrame([(0, 3)], "id_a long, id_b long")
    r = ngram_containment(docs, pair).collect()[0]
    assert r["containment_b_in_a"] == 0.0 and r["containment_a_in_b"] == 0.0

    # sampling on empty input and unknown strata
    empty_docs = docs.where("doc_id < 0")
    assert group_cap(empty_docs, ["text"], 5, "doc_id").count() == 0
    assert stratified_sample(docs, "text", {"missing": 1.0},
                             "doc_id").count() == 0

    # single embedding: no self-pairs; centroid equals the vector
    one = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0], 7)],
                                "vec_id long, embedding array<float>, label int")
    assert embedding_near_dups(one, threshold=0.0, dim=4,
                               num_bands=2).count() == 0
    c = label_centroids(one, dim=4).collect()[0]
    assert c["label"] == 7 and c["centroid"][0] == 1.0

def test_pii_redaction_and_repetition_metrics(spark):
    df = _docs(spark, [
        "mail bob.smith+x@corp.example.org now",
        "call +1 415-555-0199 or 415.555.0199",
        "host 10.0.0.1 ssn 123-45-6789",
        "clean text with no pii at all",
        "a b a b a b",           # every 2-gram after the first two repeats
    ])
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        T.redact_pii("text").alias("red"),
        T.pii_count("text", "email").alias("ne"),
        T.pii_count("text", "phone").alias("np"),
        T.pii_count("text", "ip").alias("ni"),
        T.pii_count("text", "ssn").alias("ns"),
        F.round(T.dup_ngram_frac("text", 2), 4).alias("d2"),
    ).collect()}
    assert out[0]["red"] == "mail <EMAIL> now" and out[0]["ne"] == 1
    assert out[1]["red"] == "call +1 <PHONE> or <PHONE>" and out[1]["np"] == 2
    assert out[2]["red"] == "host <IP> ssn <SSN>"
    assert out[2]["ni"] == 1 and out[2]["ns"] == 1
    assert out[3]["red"] == "clean text with no pii at all"
    assert out[3]["ne"] == out[3]["np"] == out[3]["ni"] == out[3]["ns"] == 0
    # "a b a b a b": 5 2-grams, 2 distinct -> 3/5 repeated
    assert out[4]["d2"] == 0.6
    # sub-n docs: zero grams -> frac 0, no negative-sequence crash
    short = _docs(spark, ["one", ""]).select(
        T.dup_ngram_frac("text", 3).alias("d3")).collect()
    assert [r["d3"] for r in short] == [0.0, 0.0]


def test_ivf_assign_null_embedding_is_defined(spark):
    """A NULL embedding row must not crash the Arrow assignment pass and
    must land deterministically in list 0 (zero-fill -> NaN cosine ->
    first-index argmax). Valid rows are unaffected."""
    import numpy as np
    from pyspark.sql import functions as F
    from lswms_forage_etl_spark.operators.similarity import (
        _ivf_assign, ivf_centroid_rows)

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(20)]
    rows.append((20, None))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    cents = ivf_centroid_rows(emb.where(F.col("embedding").isNotNull()),
                              num_centroids=4)
    got = {r["vec_id"]: r["cent_id"]
           for r in _ivf_assign(emb, cents, "vec_id", "embedding").collect()}
    assert len(got) == 21
    assert got[20] == 0
    assert all(0 <= c < 4 for c in got.values())


def test_round10_operators_on_degenerate_inputs(spark):
    """Round-10 ops on empty/degenerate inputs: single-event users
    (no transitions), empty event frames, one-source corpora, and
    NULL/empty text all produce defined, empty-or-exact results."""
    import datetime as dt

    from pyspark.sql import functions as F

    from lswms_forage_etl_spark.operators.funnels import (
        markov_transitions, pivot_event_counts, unpivot_counts)
    from lswms_forage_etl_spark.operators.graphrank import bigram_novelty
    from lswms_forage_etl_spark.operators.quality import source_divergence
    from lswms_forage_etl_spark.streaming.joins import (
        last_touch_attribution)

    ev_schema = "event_id long, ts timestamp, user_id long, event_type string"
    t0 = dt.datetime(2024, 1, 1)
    # single-event users: zero transitions, empty (not error)
    one = spark.createDataFrame(
        [(1, t0, 1, "view"), (2, t0, 2, "click")], ev_schema)
    assert markov_transitions(one).count() == 0
    # empty events: markov/pivot/unpivot/attribution all empty
    empty = spark.createDataFrame([], ev_schema)
    assert markov_transitions(empty).count() == 0
    wide = pivot_event_counts(empty, ["view", "click"])
    assert wide.count() == 0
    assert unpivot_counts(wide, "day", ["view", "click"]).count() == 0
    assert last_touch_attribution(empty, empty).count() == 0
    # impressions without conversions (and vice versa): empty
    assert last_touch_attribution(one, empty.where("1=1")).count() == 0
    assert last_touch_attribution(empty, one).count() == 0
    # one-source corpus: TV distance exactly 0; NULL/empty text rows
    # carry no tokens and do not crash the fold
    docs = spark.createDataFrame(
        [(1, "a b", "s"), (2, None, "s"), (3, "", "s")],
        "doc_id long, text string, source string")
    rows = source_divergence(docs).collect()
    assert len(rows) == 1 and rows[0]["tv_ppb"] == 0
    # bigram novelty: single-token and empty docs emit nothing
    bg = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "a b a b")],
        "doc_id long, text string")
    got = {r["doc_id"] for r in bigram_novelty(bg).collect()}
    assert got == {4}
    from lswms_forage_etl_spark.lifecycle import release_tracked
    release_tracked()
