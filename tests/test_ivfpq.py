"""IVF-PQ composed index (round 15): in-plan compose vs materialized
probe equivalence, partition pruning on the probed code scan, shortlist
boundedness, and recall against brute force on planted structure."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lswms_forage_etl_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivfpq_build_index,
    ivfpq_probe_index,
    ivfpq_topk,
)


def _embeddings(spark, n=120, dim=16, seed=9):
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, dim))
    base[7] = base[0] * 1.001 + 0.0001          # planted near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"), base


def test_ivfpq_finds_planted_neighbor(spark):
    emb, base = _embeddings(spark)
    q = [float(x) for x in base[0]]
    got = ivfpq_topk(emb, q, k=5, num_centroids=8, probes=4, m=4,
                     rerank_mult=8).collect()
    ids = [r["vec_id"] for r in got]
    assert ids[0] == 0 and 7 in ids[:2]
    sims = [r["cosine_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_ivfpq_materialized_matches_inplan_and_prunes(spark, tmp_path):
    emb, base = _embeddings(spark)
    q = [float(x) for x in base[0]]
    path = str(tmp_path / "ivfpq")
    cents, cb = ivfpq_build_index(emb, path, num_centroids=8, m=4)
    got = ivfpq_probe_index(spark, path, cents, cb, q, emb, k=5,
                            probes=4, m=4, rerank_mult=8)
    mem = ivfpq_topk(emb, q, k=5, num_centroids=8, probes=4, m=4,
                     rerank_mult=8)
    assert [(r["vec_id"], r["cosine_sim"]) for r in got.collect()] == \
           [(r["vec_id"], r["cosine_sim"]) for r in mem.collect()]
    # the code scan must be partition-pruned to the probed lists
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cent_id" in plan.split("PartitionFilters")[1].split("]")[0]


def test_ivfpq_recall_on_probed_ceiling(spark):
    """With every list probed, IVF-PQ + exact re-rank must equal brute
    force exactly (the shortlist covers the corpus at this size)."""
    emb, base = _embeddings(spark, n=60)
    q = [float(x) for x in base[0]]
    got = ivfpq_topk(emb, q, k=10, num_centroids=4, probes=4, m=4,
                     rerank_mult=8).collect()
    want = brute_force_topk(emb, q, k=10).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
