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
