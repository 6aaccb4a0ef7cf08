"""Round-6: distributed Lloyd trainers (kmeans_train, PQ variant)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lswms_forage_etl_spark import get_spark
from lswms_forage_etl_spark.operators.similarity import (
    PQ_SCALE,
    ivf_centroid_rows,
    kmeans_train,
    l2_assign,
    pq_train_codebook_dist,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-kmeans")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _np_kmeans(V, seeds, iters, scale=10 ** 6):
    """Pure-numpy replay of kmeans_train's exact portable arithmetic."""
    cents = np.asarray(seeds, dtype=np.float64)
    for _ in range(iters):
        diff = V[:, None, :] - cents[None, :, :]
        d = np.floor(diff * diff * PQ_SCALE).astype(np.int64).sum(axis=2)
        asg = np.argmin(d, axis=1)
        new = cents.copy()
        for c in range(cents.shape[0]):
            rows = V[asg == c]
            if len(rows):
                sx = np.floor(rows * scale + 0.5).astype(np.int64).sum(axis=0)
                mean = sx / float(scale) / len(rows)
                new[c] = np.floor(mean * scale + 0.5) / scale
        cents = new
    return cents, asg


def test_kmeans_train_matches_numpy_replay(spark, emb):
    """The distributed trainer's exact-integer conventions make it
    bit-reproducible: a pure-numpy replay over the collected vectors
    yields the identical centroids and final assignments."""
    seeds = [cv for _, cv in ivf_centroid_rows(emb, 8)]
    got = kmeans_train(emb, k=8, iters=2)
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    V = np.asarray([[float(x) for x in r["embedding"]] for r in rows])
    ref, _ = _np_kmeans(V, seeds, iters=2)
    assert np.array_equal(np.asarray(got), ref)
    # final assignment parity, including the exact integer distance
    asg = {r["vec_id"]: (r["cent_id"], r["l2_scaled"])
           for r in l2_assign(emb, got).select(
               "vec_id", "cent_id", "l2_scaled").collect()}
    diff = V[:, None, :] - ref[None, :, :]
    d = np.floor(diff * diff * PQ_SCALE).astype(np.int64).sum(axis=2)
    for i, r in enumerate(rows):
        c = int(np.argmin(d[i]))
        assert asg[r["vec_id"]] == (c, int(d[i, c]))


def test_kmeans_train_reduces_quantization_error(spark, emb):
    seeds = [cv for _, cv in ivf_centroid_rows(emb, 8)]
    def sse(cents):
        return l2_assign(emb, cents).agg(
            F.sum("l2_scaled")).collect()[0][0]
    trained = kmeans_train(emb, k=8, iters=2)
    assert sse(trained) < sse(seeds)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two tight blobs, 4 requested clusters: seeds landing in the same
    # blob collapse; a cluster that captures no points must keep its
    # previous centroid instead of NaN-ing out
    pts = [(i, [0.0, 0.0]) for i in range(5)] + \
          [(i, [9.0, 9.0]) for i in range(5, 10)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = kmeans_train(df, k=4, iters=3)
    assert len(cents) == 4
    assert all(all(math.isfinite(x) for x in cv) for cv in cents)


def test_pq_dist_trainer_recall(spark, emb):
    """Distributed per-subspace Lloyd >= the driver-sample trainer's
    measured 4/10 recall@10 (VERDICT r5 item 2's done-bar)."""
    from lswms_forage_etl_spark.operators.similarity import (
        brute_force_topk, pq_adc_topk)
    q = [float(x) for x in emb.where(F.col("vec_id") == 0)
         .first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    seed = {r["vec_id"] for r in pq_adc_topk(emb, q, k=10).collect()}
    dist = {r["vec_id"] for r in pq_adc_topk(
        emb, q, k=10, codebook=pq_train_codebook_dist(emb, iters=2))
        .collect()}
    assert len(exact & dist) >= 4          # == driver trainer, > seed 2/10
    assert len(exact & dist) >= len(exact & seed)


def test_pq_dist_trainer_guards(spark, emb):
    with pytest.raises(ValueError):
        pq_train_codebook_dist(emb, ks=17)
    with pytest.raises(ValueError):
        pq_train_codebook_dist(emb, m=7)


def test_ivf_build_index_accepts_trained_centroids(spark, emb, tmp_path):
    from lswms_forage_etl_spark.operators.similarity import (
        ivf_build_index, ivf_probe_index)
    trained = kmeans_train(emb, k=8, iters=1)
    path = str(tmp_path / "ivf_km")
    cents = ivf_build_index(emb, path, num_centroids=8, centroids=trained)
    assert [cv for _, cv in cents] == trained
    q = [float(x) for x in emb.where(F.col("vec_id") == 0)
         .first()["embedding"]]
    got = ivf_probe_index(spark, path, cents, q, k=5, probes=8)
    assert got.count() == 5                # full probe == exact top-5


def test_kmeans_train_tolerates_dirty_vectors(spark):
    # wrong-length / NULL rows get the zero-fill ASSIGNMENT but are
    # excluded from centroid updates (they'd crash the driver-side
    # d-index or skew counts) — round-6 review fix
    pts = [(i, [float(i % 3), float(i % 5)]) for i in range(10)] + \
          [(100, [1.0, 2.0, 3.0]), (101, None)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = kmeans_train(df, k=2, iters=2)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)
    clean = spark.createDataFrame(pts[:10],
                                  "vec_id long, embedding array<double>")
    assert kmeans_train(clean, k=2, iters=2,
                        seeds=[cv for _, cv in
                               ivf_centroid_rows(df, 2)]) == cents
