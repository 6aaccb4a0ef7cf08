"""S3/S18 — driver-side ingest + alerting shims.

S3 (data_extraction_v2.py:184-217): per-day HTTP fetch of
`rfeYYYY_MM_DD.nc`, skip-if-exists, tolerate 404 (missing days are
normal). Engine form: the date list is generated as a DataFrame
(`sequence` + `explode`), already-ingested dates are removed with an
anti-join against the manifest of present files, and the remaining fetches
run per partition with an injectable transport — idempotent re-runs for
free, no sockets in tests. At 100 TB-scale ingest the same shape fans the
fetch list out across executors (`foreachPartition`), each writing
directly to object storage.

S18 (send_notification.py:24-60): HTML-templated SMTP mail on
failure/success. Engine form: a `Notifier` callable suitable for
`plans.Pipeline(on_failure=...)` with the SMTP client injected — the
pipeline never imports smtplib in tests."""

from __future__ import annotations

import datetime as dt
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def daily_fetch_plan(spark: SparkSession, start: dt.date, end: dt.date,
                     present_names: list[str] | None = None,
                     name_pattern: str = "rfe%Y_%m_%d.nc") -> DataFrame:
    """(date, filename) for every day in [start, end] not already present.

    The date expansion is `sequence()` + `explode` (no driver loop); the
    skip-if-exists rule is an anti-join against the present-file manifest
    (reference :202-204)."""
    days = spark.sql(
        f"SELECT explode(sequence(DATE '{start.isoformat()}', "
        f"DATE '{end.isoformat()}', INTERVAL 1 DAY)) AS date")
    # strftime-style pattern -> Spark date_format pattern: literal runs
    # must be single-quoted (unquoted letters are pattern tokens)
    parts = []
    i = 0
    while i < len(name_pattern):
        if name_pattern[i] == "%" and i + 1 < len(name_pattern):
            tok = {"Y": "yyyy", "m": "MM", "d": "dd"}.get(name_pattern[i + 1])
            if tok is None:
                raise ValueError(f"unsupported token %{name_pattern[i + 1]}")
            parts.append(tok)
            i += 2
        else:
            j = i
            while j < len(name_pattern) and name_pattern[j] != "%":
                j += 1
            parts.append("'" + name_pattern[i:j].replace("'", "''") + "'")
            i = j
    plan = days.withColumn("filename", F.date_format("date", "".join(parts)))
    if present_names:
        present = spark.createDataFrame(
            [(n,) for n in present_names], "filename string")
        plan = plan.join(present, "filename", "left_anti")
    return plan.orderBy("date")


def run_fetches(plan: DataFrame,
                transport: Callable[[str], bytes | None],
                out_dir: str) -> dict[str, int]:
    """Execute the fetch plan: `transport(filename)` returns payload bytes
    or None for a tolerated miss (the reference's 404-per-day, :212-214).
    Returns {'fetched': n, 'missing': n}. Driver-side here (the test/demo
    path); the executor fan-out variant is `plan.foreachPartition` with
    the same body."""
    os.makedirs(out_dir, exist_ok=True)
    fetched = missing = 0
    for row in plan.select("filename").toLocalIterator():
        payload = transport(row["filename"])
        if payload is None:
            missing += 1
            continue
        with open(os.path.join(out_dir, row["filename"]), "wb") as fh:
            fh.write(payload)
        fetched += 1
    return {"fetched": fetched, "missing": missing}


class Notifier:
    """S18 — failure/success notification hook with an injectable mailer.

    `mailer(subject, html_body)` is the transport (production: smtplib /
    an alerting webhook). Use as `Pipeline(on_failure=notifier.on_failure)`."""

    def __init__(self, mailer: Callable[[str, str], None],
                 pipeline_name: str = "forage"):
        self.mailer = mailer
        self.pipeline_name = pipeline_name

    def on_failure(self, stage: str, exc: Exception) -> None:
        self.mailer(
            f"[{self.pipeline_name}] stage '{stage}' FAILED",
            f"<h3>Pipeline failure</h3><p>stage: <b>{stage}</b></p>"
            f"<pre>{exc}</pre>")

    def on_success(self, n_stages: int) -> None:
        self.mailer(
            f"[{self.pipeline_name}] run complete",
            f"<p>{n_stages} stages finished.</p>")
