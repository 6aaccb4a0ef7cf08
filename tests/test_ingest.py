"""S3 ingest plan (idempotent skip, 404 tolerance) + S18 notifier hook."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from lswms_forage_etl_spark.plans import Pipeline, Stage
from lswms_forage_etl_spark.sources.ingest import (
    Notifier,
    daily_fetch_plan,
    run_fetches,
)


def test_fetch_plan_skips_present(spark):
    plan = daily_fetch_plan(
        spark, dt.date(2024, 1, 1), dt.date(2024, 1, 5),
        present_names=["rfe2024_01_02.nc", "rfe2024_01_04.nc"])
    names = [r["filename"] for r in plan.collect()]
    assert names == ["rfe2024_01_01.nc", "rfe2024_01_03.nc",
                     "rfe2024_01_05.nc"]


def test_run_fetches_tolerates_missing(spark, tmp_path):
    plan = daily_fetch_plan(spark, dt.date(2024, 1, 1), dt.date(2024, 1, 3))

    def transport(name):
        return None if "01_02" in name else b"DATA:" + name.encode()

    out = str(tmp_path / "nc")
    stats = run_fetches(plan, transport, out)
    assert stats == {"fetched": 2, "missing": 1}
    assert sorted(os.listdir(out)) == ["rfe2024_01_01.nc", "rfe2024_01_03.nc"]
    # idempotent re-run: everything present -> nothing fetched
    plan2 = daily_fetch_plan(spark, dt.date(2024, 1, 1), dt.date(2024, 1, 3),
                             present_names=os.listdir(out))
    assert [r["filename"] for r in plan2.collect()] == ["rfe2024_01_02.nc"]


def test_notifier_wired_to_pipeline(spark):
    mails = []
    notifier = Notifier(lambda subj, body: mails.append((subj, body)),
                        pipeline_name="test-pipe")

    def boom(s, c):
        raise RuntimeError("kaboom")

    p = Pipeline(stages=[Stage("explode", boom)],
                 on_failure=notifier.on_failure)
    with pytest.raises(RuntimeError):
        p.run(spark, {})
    assert len(mails) == 1
    subj, body = mails[0]
    assert "explode" in subj and "FAILED" in subj and "kaboom" in body
