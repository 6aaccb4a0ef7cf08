"""Deterministic sampling for training-data pipelines.

Three shapes, all scan-side and engine-portable (no rand(), no seed-state
— every decision is a pure function of the row's key, so re-runs, retries
and the DuckDB oracle agree bit-for-bit, and samples are reproducible
across cluster sizes and partitionings; Spark's native df.sample() is
none of those):

  hash_sample      Bernoulli p: keep iff md5-derived u32(key) < p * 2^32.
                   Integer threshold compare — no float division.
  stratified       per-stratum rates (e.g. downsample dominant languages,
                   keep the tail) via the same u32 against a per-stratum
                   threshold.
  group_cap        at most k rows per group, chosen by hash order (a
                   deterministic reservoir): row_number over
                   (u32, tiebreak) <= k. One window shuffle on the group
                   key; at 100 TB this is the skew-safe way to cap a
                   dominant source/domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

U32_SPAN = 1 << 32


def sample_u32(key_col, seed: int = 0):
    """Deterministic uniform 32-bit value for a row key: first 8 hex chars
    of md5(seed|key). Identical in DuckDB:
    ('0x' || substr(md5(concat(seed,'|',key)),1,8))::BIGINT."""
    c = key_col if not isinstance(key_col, str) else F.col(key_col)
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), c.cast("string"))),
                    1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, rate: float, key_col: str,
                seed: int = 0) -> DataFrame:
    """Keep each row with probability `rate`, decided by the row's key
    hash. Filter happens in the scan projection — no shuffle."""
    return df.where(sample_u32(key_col, seed) < int(rate * U32_SPAN))


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], key_col: str,
                      default_rate: float = 0.0,
                      seed: int = 0) -> DataFrame:
    """Per-stratum Bernoulli rates (unlisted strata get default_rate).
    Rates fold into a literal CASE — still a pure scan-side filter."""
    thresh = F.lit(int(default_rate * U32_SPAN))
    for value, rate in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(int(rate * U32_SPAN))).otherwise(thresh)
    return df.where(sample_u32(key_col, seed) < thresh)


def group_cap(df: DataFrame, group_cols: list[str], k: int, key_col: str,
              seed: int = 0) -> DataFrame:
    """At most k rows per group, picked by hash order (ties broken by the
    key itself) — a deterministic reservoir. One shuffle on the group
    key."""
    w = Window.partitionBy(*group_cols).orderBy(
        sample_u32(key_col, seed), F.col(key_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn"))
