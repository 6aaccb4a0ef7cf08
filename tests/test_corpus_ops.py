"""Unit semantics for the round-5 corpus operators: duplicated-substring
spans (Lee et al.-style) and weighted corpus mixing."""

import pytest
from hypothesis import given, settings, strategies as st

from lswms_forage_etl_spark import get_spark
from lswms_forage_etl_spark.operators.dedup import duplicate_spans
from lswms_forage_etl_spark.operators.sampling import corpus_mix


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-corpus-ops")


def test_duplicate_spans_exact_boundaries(spark):
    # docs 1 and 2 share the 6-token run "a b c d e f" (doc1 tokens 2-7,
    # doc2 tokens 0-5); no other 4-gram repeats
    docs = spark.createDataFrame([
        (1, "x y a b c d e f g h"),
        (2, "a b c d e f q r s t"),
        (3, "u v w p o n m l k j"),
    ], "doc_id long, text string")
    rows = {(r["doc_id"]): r for r in duplicate_spans(
        docs, window=4).collect()}
    assert set(rows) == {1, 2}
    # a 6-token duplicate with window=4 -> 3 consecutive dup windows
    assert (rows[1]["span_start"], rows[1]["span_end"],
            rows[1]["span_tokens"], rows[1]["n_windows"]) == (2, 7, 6, 3)
    assert (rows[2]["span_start"], rows[2]["span_end"],
            rows[2]["span_tokens"], rows[2]["n_windows"]) == (0, 5, 6, 3)


def test_duplicate_spans_within_doc_repetition(spark):
    # repetition INSIDE one document also counts (fp occurs twice)
    docs = spark.createDataFrame(
        [(1, "a b c d x x a b c d"), (2, "k l m n o p q r s t")],
        "doc_id long, text string")
    rows = sorted(duplicate_spans(docs, window=4).collect(),
                  key=lambda r: r["span_start"])
    assert [r["doc_id"] for r in rows] == [1, 1]
    assert (rows[0]["span_start"], rows[0]["span_end"]) == (0, 3)
    assert (rows[1]["span_start"], rows[1]["span_end"]) == (6, 9)


def test_duplicate_spans_short_docs_contribute_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "")],
        "doc_id long, text string")
    assert duplicate_spans(docs, window=4).count() == 0


def test_corpus_mix_integer_weights_exact(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(20)] + [(100 + i, "fr") for i in range(10)],
        "doc_id long, lang string")
    out = corpus_mix(docs, "lang", {"en": 2.0, "fr": 0.0}, "doc_id")
    rows = out.groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in rows}
    assert got == {"en": 40}          # exactly 2 copies each, fr dropped
    idx = {r["copy_idx"] for r in out.collect()}
    assert idx == {1, 2}


def test_corpus_mix_fractional_weight_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(400)], "doc_id long, lang string")
    a = corpus_mix(docs, "lang", {"en": 1.5}, "doc_id")
    b = corpus_mix(docs.repartition(7), "lang", {"en": 1.5}, "doc_id")
    sa = {(r["doc_id"], r["copy_idx"]) for r in a.collect()}
    sb = {(r["doc_id"], r["copy_idx"]) for r in b.collect()}
    assert sa == sb                   # decisions are key-hash functions
    n = len(sa)
    assert 400 * 1.3 < n < 400 * 1.7  # E[copies]=1.5


def _spans_reference(texts, window):
    """Pure-Python oracle for duplicate_spans: window fps with corpus
    count >= 2, merged into maximal consecutive runs per doc."""
    import hashlib
    from collections import Counter

    tok = {i: [t for t in text.lower().strip().split() if t]
           for i, text in enumerate(texts)}
    fps = {}
    counts = Counter()
    for i, ts in tok.items():
        row = []
        for p in range(len(ts) - window + 1):
            fp = hashlib.md5(" ".join(ts[p:p + window]).encode()).hexdigest()
            row.append(fp)
            counts[fp] += 1
        fps[i] = row
    out = set()
    for i, row in fps.items():
        run_start = None
        prev = None
        for p, fp in enumerate(row):
            if counts[fp] >= 2:
                if run_start is None or prev != p - 1:
                    if run_start is not None:
                        out.add((i, run_start, prev + window - 1,
                                 prev - run_start + 1))
                    run_start = p
                prev = p
        if run_start is not None:
            out.add((i, run_start, prev + window - 1,
                     prev - run_start + 1))
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=24)
    .map(" ".join), min_size=1, max_size=8))
def test_duplicate_spans_matches_python_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
           for r in duplicate_spans(docs, window=3).collect()}
    from lswms_forage_etl_spark import lifecycle
    lifecycle.release_tracked()
    assert got == _spans_reference(texts, 3)


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=24)
    .map(" ".join), min_size=1, max_size=8))
def test_remove_spans_matches_python_reference(spark, texts):
    """detect -> strip composition: surviving text == tokens whose
    position is covered by no reference span; docs without spans pass
    through untouched with n_removed = 0."""
    from lswms_forage_etl_spark.operators.dedup import remove_spans
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    spans = duplicate_spans(docs, window=3)
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
           for r in remove_spans(docs, spans).collect()}
    from lswms_forage_etl_spark import lifecycle
    lifecycle.release_tracked()
    ref_spans = _spans_reference(texts, 3)
    for i, text in enumerate(texts):
        ts = [t for t in text.strip().split() if t]
        covered = set()
        for (d, s, e, _n) in ref_spans:
            if d == i:
                covered.update(range(s, e + 1))
        kept = [t for p, t in enumerate(ts) if p not in covered]
        assert got[i] == (len(ts), len(covered & set(range(len(ts)))),
                          " ".join(kept))


def test_remove_spans_no_span_table_rows(spark):
    from lswms_forage_etl_spark.operators.dedup import remove_spans
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string")
    empty = spark.createDataFrame(
        [], "doc_id long, span_start long, span_end long")
    rows = remove_spans(docs, empty).collect()
    assert [(r["doc_id"], r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in rows] == [(1, 3, 0, "alpha beta gamma")]


def test_patch_grid_exact_semantics(spark):
    from lswms_forage_etl_spark.operators.multimodal import patch_grid
    import pyspark.sql.functions as SF

    # payload of 80 bytes as a 32-wide image -> 2 full rows (16 bytes
    # dropped), patches 8 wide: 1 patch row x 4 patch cols, each 2x8=16
    # bytes; byte values are position indices so means are exact
    payload = bytes(range(80))
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "media_id long, payload binary")
    rows = {(r["patch_row"], r["patch_col"]): (r["n_bytes"],
                                               r["mean_intensity"])
            for r in patch_grid(df, width=32, patch=8).collect()}
    assert set(rows) == {(0, 0), (0, 1), (0, 2), (0, 3)}
    for (pr, pc), (nb, mi) in rows.items():
        assert nb == 16
        vals = [r * 32 + c for r in range(2)
                for c in range(pc * 8, pc * 8 + 8)]
        assert mi == sum(vals) / 16

    # payloads shorter than one row contribute nothing; NULL is skipped
    short = spark.createDataFrame(
        [(2, bytearray(b"abc")), (3, None)],
        "media_id long, payload binary")
    assert patch_grid(short, width=32, patch=8).count() == 0


@settings(max_examples=10, deadline=None)
@given(st.dictionaries(st.sampled_from(["en", "de", "fr", "zh"]),
                       st.floats(min_value=0.0, max_value=3.0,
                                 allow_nan=False), min_size=1),
       st.integers(min_value=1, max_value=60))
def test_corpus_mix_matches_python_reference(spark, weights, n):
    import hashlib
    import math

    docs = spark.createDataFrame(
        [(i, ["en", "de", "fr", "zh"][i % 4]) for i in range(n)],
        "doc_id long, lang string")
    got = {(r["doc_id"], r["copy_idx"])
           for r in corpus_mix(docs, "lang", weights, "doc_id").collect()}
    expect = set()
    for i in range(n):
        w = weights.get(["en", "de", "fr", "zh"][i % 4], 1.0)
        u = int(hashlib.md5(f"0|{i}".encode()).hexdigest()[:8], 16)
        nc = int(math.floor(w)) + (1 if u < int((w - math.floor(w))
                                                * (1 << 32)) else 0)
        expect |= {(i, c) for c in range(1, nc + 1)}
    assert got == expect


def test_ngram_array_null_and_short_inputs(spark):
    from lswms_forage_etl_spark.functions.text import ngram_array, tokens
    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b"), (4, "a b c d")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["g"] for r in df.select(
        "doc_id", ngram_array(tokens("text"), 3).alias("g")).collect()}
    assert rows[1] == []          # NULL text -> [] (not NULL)
    assert rows[2] == []
    assert rows[3] == []          # shorter than n
    assert rows[4] == ["a b c", "b c d"]
