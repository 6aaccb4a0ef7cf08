"""The plan audit must be runtime-truthful (VERDICT r4 item 2):

- a PERSISTED subtree referenced N times in a self-join counts its
  build (python stages, joins, shuffles) ONCE — that is what executes;
- the same subtree UNpersisted counts N times — the audit still trips
  on a missing materialization point.
"""

import pandas as pd
import pytest

from lswms_forage_etl_spark import get_spark
from tools.explain_audit import PlanCounters, walk


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-explain-audit")


def _arrow_stage(spark):
    """A tiny DataFrame whose plan contains exactly one Arrow python node."""
    df = spark.range(0, 100).toDF("id")

    def featurize(it):
        for pdf in it:
            yield pd.DataFrame({"id": pdf["id"], "f": pdf["id"] % 7})

    return df.mapInPandas(featurize, "id long, f long")


def _count(spark, df) -> PlanCounters:
    c = PlanCounters()
    walk(df._jdf.queryExecution().executedPlan(), c, spark._jvm)
    return c


def test_persisted_subtree_counts_once(spark):
    base = _arrow_stage(spark).persist()
    try:
        joined = base.alias("a").join(base.alias("b"), "f")
        c = _count(spark, joined)
        assert c.python == 1, f"persisted Arrow stage must count once, got {c.python}"
    finally:
        base.unpersist()


def test_unpersisted_subtree_counts_per_reference(spark):
    base = _arrow_stage(spark)
    joined = base.alias("a").join(base.alias("b"), "f")
    c = _count(spark, joined)
    assert c.python == 2, f"unpersisted duplicate subtree must count twice, got {c.python}"


def test_counts_joins_and_shuffles(spark):
    left = spark.range(0, 1000).toDF("k")
    right = spark.range(0, 1000).selectExpr("id as k", "id * 2 as v")
    agg = left.join(right, "k").groupBy((right.v % 10).alias("g")).count()
    c = _count(spark, agg)
    assert len(c.joins) == 1
    assert c.shuffles >= 1
