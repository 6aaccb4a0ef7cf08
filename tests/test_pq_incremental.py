"""Round-5 additions: product quantization and incremental dedup."""

import pytest
from pyspark.sql import functions as F

from lswms_forage_etl_spark import get_spark, lifecycle
from lswms_forage_etl_spark.operators.dedup import incremental_dedup
from lswms_forage_etl_spark.operators.similarity import (
    brute_force_topk,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-pq-incremental")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pq_codes_partition_invariant(spark, emb):
    cb = pq_codebook(emb)
    a = {r["vec_id"]: r["pq_code"]
         for r in pq_encode(emb, cb).collect()}
    b = {r["vec_id"]: r["pq_code"]
         for r in pq_encode(emb.repartition(13), cb).collect()}
    assert a == b                      # integer distances, no fold order
    assert len(a) == emb.count()


def test_pq_code_fits_32_bits(spark, emb):
    mx = pq_encode(emb, pq_codebook(emb)) \
        .agg(F.max("pq_code")).collect()[0][0]
    assert 0 <= mx < (1 << 32)         # 8 subspaces x 4 bits


def test_pq_seed_vector_encodes_to_itself(spark, emb):
    # a vector that IS a codebook seed has distance 0 to its own codeword
    # in every subspace -> its code is (seed_idx repeated per subspace)
    cb = pq_codebook(emb)
    seeds = {tuple(round(float(x), 6) for x in v): i
             for i, v in enumerate(cb)}
    codes = {r["vec_id"]: r["pq_code"] for r in
             pq_encode(emb, cb).collect()}
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    hits = 0
    for vid, v in vecs.items():
        key = tuple(round(x, 6) for x in v)
        if key in seeds:
            i = seeds[key]
            expect = sum(i << (4 * s) for s in range(8))
            assert codes[vid] == expect
            hits += 1
    assert hits >= 16


def test_pq_topk_recall_vs_bruteforce(spark, emb):
    from lswms_forage_etl_spark.operators.similarity import \
        pq_train_codebook
    q = [float(x) for x in emb.where(F.col("vec_id") == 0)
         .first()["embedding"]]
    # on this synthetic data the cosine and exact-L2 top-10 coincide, so
    # the cosine reference doubles as the L2 ground truth PQ approximates
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    seed = {r["vec_id"] for r in pq_adc_topk(emb, q, k=10).collect()}
    assert 0 in seed                   # the query's own cell survives
    assert len(exact & seed) >= 2      # measured: 2/10 w/ seed codebook
    trained = {r["vec_id"] for r in pq_adc_topk(
        emb, q, k=10, codebook=pq_train_codebook(emb)).collect()}
    assert len(exact & trained) >= 3   # measured: 4/10 after k-means
    assert len(exact & trained) >= len(exact & seed)


def test_pq_adc_non_power_of_two_ks(spark, emb):
    # ADVICE r5: the 4-bit unpack must use the nibble mask (15), not
    # ks-1 — with ks=12 a ks-1 mask corrupts codes (5 & 11 = 1).
    # Reference: unpack every code locally and sum the distance tables.
    import numpy as np
    cb = pq_codebook(emb, ks=12)
    q = [float(x) for x in emb.where(F.col("vec_id") == 0)
         .first()["embedding"]]
    got = [(r["vec_id"], r["adc_dist"]) for r in
           pq_adc_topk(emb, q, k=5, codebook=cb).collect()]
    codes = {r["vec_id"]: r["pq_code"]
             for r in pq_encode(emb, cb).collect()}
    cbm = np.asarray(cb, dtype=np.float64)
    qv = np.asarray(q, dtype=np.float64)
    m, sub = 8, cbm.shape[1] // 8
    tables = [np.floor(
        (qv[None, s * sub:(s + 1) * sub] - cbm[:, s * sub:(s + 1) * sub])
        ** 2 * 10 ** 12).astype(np.int64).sum(axis=1) for s in range(m)]
    ref = {vid: int(sum(tables[s][(c >> (4 * s)) & 15] for s in range(m)))
           for vid, c in codes.items()}
    assert max(c >> (4 * s) & 15
               for c in codes.values() for s in range(m)) < 12
    expect = sorted((d, v) for v, d in ref.items())[:5]
    assert [(v, d) for d, v in expect] == got


def test_pq_train_codebook_guards(spark, emb):
    from lswms_forage_etl_spark.operators.similarity import \
        pq_train_codebook
    with pytest.raises(ValueError):
        pq_train_codebook(emb, m=7)            # dim 16 % 7 != 0
    with pytest.raises(ValueError):
        pq_train_codebook(emb.limit(5), ks=16)  # sample smaller than ks
    with pytest.raises(ValueError):
        pq_train_codebook(emb, ks=17)           # >4-bit codes


def test_incremental_dedup_matches_only_existing(spark):
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog today", 0),
        (2, "an entirely different document about spark shuffles", 0),
        # new docs: 10 duplicates doc 1; 11 duplicates doc 12 (also new);
        # 12 is new and only matches 11 -> neither may be reported
        (10, "the quick brown fox jumps over the lazy dog today", 1),
        (11, "completely novel text with no existing counterpart here", 1),
        (12, "completely novel text with no existing counterpart here", 1),
    ], "doc_id long, text string, newf int")
    out = incremental_dedup(docs, F.col("newf") == 1)
    rows = {r["id_new"]: (r["id_existing"], r["jaccard"])
            for r in out.collect()}
    lifecycle.release_tracked()
    assert set(rows) == {10}
    assert rows[10] == (1, 1.0)
