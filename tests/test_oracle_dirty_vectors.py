"""Cross-engine parity on DIRTY embeddings (ADVICE r6): the graded
testdata is clean, so the kmeans/PQ oracles' final pass never met a
wrong-length or NULL vector — where a bare `v[j]` list index yields
NULL distances while the Spark side (`l2_assign` / `pq_encode`)
zero-fills the whole vector. These tests run the REGISTERED query and
its REGISTERED oracle over a corpus that includes a short, a long, and
a NULL vector, and require identical rows — pinning the zero-fill
convention on both sides.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from lswms_forage_etl_spark import lifecycle


def _mk_dirty_embeddings(spark, path: str) -> None:
    """500 clean 64-d vectors + 3 dirty rows (short / long / NULL).

    Values are binary-exact floats (k/8) so float arithmetic cannot
    diverge between engines; ids 9001/9002/9003 hash far enough down
    the multiplicative-hash order to never be seed picks."""
    rows = []
    for i in range(500):
        vec = [float((i * 7 + j) % 16) / 8.0 for j in range(64)]
        rows.append((i, vec))
    rows.append((9001, [1.0] * 8))          # short
    rows.append((9002, [0.5] * 65))         # long
    rows.append((9003, None))               # NULL vector
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>") \
        .repartition(4).write.mode("overwrite").parquet(
            f"{path}/embeddings.parquet")


def _oracle_rows(sql: str, path: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{path}/embeddings.parquet/*.parquet')")
    cols = [d[0] for d in con.execute(f"SELECT * FROM ({sql}) LIMIT 0"
                                      ).description]
    return cols, con.execute(sql).fetchall()


def _canon(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


@pytest.mark.parametrize("qname", ["kmeans_assign", "ann_pq_trained",
                                   "corpus_cluster_balance"])
def test_dirty_vectors_match_oracle(spark, tmp_path, qname):
    path = str(tmp_path)
    _mk_dirty_embeddings(spark, path)
    q = entrymod.queries()[qname]
    sdf = q(spark, path)
    scols = sdf.columns
    srows = sorted(tuple(_canon(v) for v in r) for r in sdf.collect())
    lifecycle.release_tracked()
    spark.catalog.clearCache()
    ocols, orows_raw = _oracle_rows(entrymod.oracle_sql()[qname], path)
    assert ocols == scols
    orows = sorted(tuple(_canon(v) for v in r) for r in orows_raw)
    assert srows == orows
    # the dirty rows are PRESENT in full-corpus outputs (zero-filled,
    # not dropped): kmeans_assign and ann_pq_trained score all rows
    if qname in ("kmeans_assign", "ann_pq_trained"):
        ids = {r[0] for r in srows}
        assert {9001, 9002, 9003} <= ids
        assert not any(
            v is None or (isinstance(v, float) and math.isnan(v))
            for r in srows for v in r)
