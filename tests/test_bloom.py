"""Round-6: distributed Bloom filter table + prefiltered exact dedup."""

import pytest
from pyspark.sql import functions as F

from lswms_forage_etl_spark import get_spark, lifecycle
from lswms_forage_etl_spark.operators.dedup import (
    bloom_filter_table,
    bloom_incremental_dedup,
    bloom_might_contain,
)


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-bloom")


def test_bloom_no_false_negatives_and_prunes(spark):
    members = spark.createDataFrame(
        [(f"key{i}",) for i in range(500)], "fp string")
    ftbl = lifecycle.track(
        bloom_filter_table(members, m_bits=1 << 16, k=5).persist())
    # every member passes (Bloom guarantee: no false negatives)
    hits = bloom_might_contain(members, ftbl, m_bits=1 << 16, k=5)
    assert hits.count() == 500
    # non-members are overwhelmingly pruned (fpp ~ (1-e^{-kn/m})^k << 1)
    probes = spark.createDataFrame(
        [(f"other{i}",) for i in range(2000)], "fp string")
    n_fp = bloom_might_contain(probes, ftbl, m_bits=1 << 16, k=5).count()
    assert n_fp < 100          # ~0.2% expected at n=500, m=64k, k=5
    lifecycle.release_tracked()


def test_bloom_filter_merges_incrementally(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(100)], "fp string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(100)], "fp string")
    merged = (bloom_filter_table(a, m_bits=1 << 14)
              .unionAll(bloom_filter_table(b, m_bits=1 << 14))
              .groupBy("word_idx").agg(F.bit_or("bits").alias("bits")))
    direct = bloom_filter_table(a.unionAll(b), m_bits=1 << 14)
    got = {(r["word_idx"], r["bits"]) for r in merged.collect()}
    want = {(r["word_idx"], r["bits"]) for r in direct.collect()}
    assert got == want


def test_bloom_incremental_dedup_equals_plain_join(spark):
    rows = [(i, f"text number {i % 7}", 0) for i in range(20)] + \
           [(100 + i, f"text number {i}", 1) for i in range(12)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, batch int")
    out = {(r["id_new"], r["id_existing"]) for r in bloom_incremental_dedup(
        docs, F.col("batch") == 1).collect()}
    lifecycle.release_tracked()
    # plain reference: new doc i duplicates existing iff i % 7 == i,
    # i.e. new texts 0..6 match; keeper is min existing id with that text
    want = {(100 + i, i) for i in range(7)}
    assert out == want
