"""Skew-handling join utilities (SURVEY §4 physical tactics; the prompt's
"skewed keys -> salting or AQE skew-join").

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine's session) handles sort-merge skew at runtime.
`salted_join` is the explicit fallback for the cases AQE can't fix —
e.g. a broadcast-ineligible dimension joined on a pathological hot key,
or aggregations where one key swamps a single reducer:

  left (skewed, huge)  : key -> (key, salt)   with salt = hash(row)%S
  right (small-ish)    : each row replicated S times, one per salt value
  join on (key, salt)  : the hot key's rows now spread over S reducers

`salted_agg_count` shows the two-phase aggregation twin (salt -> partial
agg -> final agg) for skewed groupBy keys."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str,
                num_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join on `key` with the left side salted and the right side
    replicated `num_salts` times. Output = `left.join(right, key, how)`
    for inner/left joins. Right/full outer joins are rejected: an
    unmatched right row would surface once per replica (num_salts
    duplicates), so those shapes need the inverse construction (salt
    right, replicate left)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} — "
            "replicated unmatched right rows would duplicate")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(num_salts)).cast("int")
    lhs = left.withColumn("_salt", salt)
    rhs = (right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)])))
    )
    out = lhs.join(rhs, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg_count(df: DataFrame, key: str,
                     num_salts: int = 8) -> DataFrame:
    """Two-phase count for skewed keys: partial count per (key, salt) —
    spreads the hot key over `num_salts` reducers — then final sum per
    key. Same result as `df.groupBy(key).count()`, bounded reducer load."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(num_salts)).cast("int")
    partial = (df.withColumn("_salt", salt)
               .groupBy(key, "_salt")
               .agg(F.count(F.lit(1)).alias("_n")))
    return (partial.groupBy(key)
            .agg(F.sum("_n").alias("count")))
