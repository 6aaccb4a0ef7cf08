"""Unit tests for the referential/data-quality audit
(operators/quality.py) on fixtures with known violations."""

from __future__ import annotations

from lswms_forage_etl_spark.operators.quality import (
    duplicate_keys,
    fk_violations,
)


def test_fk_violations_counts_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    r = fk_violations(child, "k", parent, "p", "fk").collect()[0]
    assert (r["check_name"], r["n_violations"], r["n_total"]) \
        == ("fk", 2, 4)  # 9 is orphaned, NULL never matches


def test_duplicate_keys_counts_extras(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        "k long, v string")
    r = duplicate_keys(df, ["k"], "uniq").collect()[0]
    assert (r["n_violations"], r["n_total"]) == (3, 6)


def test_source_divergence_exact_integers(spark):
    from lswms_forage_etl_spark.lifecycle import release_tracked
    from lswms_forage_etl_spark.operators.quality import source_divergence
    docs = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "b b c d", "s2")],
        "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_divergence(docs).collect()}
    release_tracked()
    S = 1_000_000_000
    # corpus: a=2 b=3 c=1 d=1, n=7; s1: a=2 b=1 (n=3); s2: b=2 c=1 d=1 (n=4)
    p = {t: c * S // 7 for t, c in {"a": 2, "b": 3, "c": 1, "d": 1}.items()}
    p_total = sum(p.values())

    def tv(dist, n):
        present = sum(abs(c * S // n - p[t]) - p[t]
                      for t, c in dist.items())
        return (present + p_total) // 2

    assert got["s1"]["n_tokens"] == 3
    assert got["s1"]["tv_ppb"] == tv({"a": 2, "b": 1}, 3)
    assert got["s2"]["tv_ppb"] == tv({"b": 2, "c": 1, "d": 1}, 4)
    # identical-distribution sanity: one source == corpus -> tv ~ 0
    one = spark.createDataFrame([(1, "x y", "only")],
                                "doc_id long, text string, source string")
    r = source_divergence(one).collect()[0]
    release_tracked()
    assert r["tv_ppb"] == 0
