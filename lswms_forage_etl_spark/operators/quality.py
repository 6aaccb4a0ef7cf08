"""Data-quality audits over the warehouse tables.

Beyond the reference surface (its nearest analogue is the per-date
completeness check in ``data_extraction_v2.py`` resume logic), but a
first-class need for any pipeline feeding training data: referential
integrity, null/domain violations, and duplicate keys, emitted as ONE
bounded metrics table (check_name, n_violations, n_total).

Scale shape: every check is an anti-join or conditional aggregate on
its natural key — uniform shuffles, no collects; the result is one row
per CHECK, so the output is bounded by the checklist, not the data.
The per-check single-row aggregates union into one plan; Spark runs
them as independent stages off shared scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _count_row(df: DataFrame, name: str, violation_col,
               total: int | None = None) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check_name"),
        F.sum(F.when(violation_col, 1).otherwise(0)).cast("long")
        .alias("n_violations"),
        F.count(F.lit(1)).alias("n_total"))


def fk_violations(child: DataFrame, child_key: str,
                  parent: DataFrame, parent_key: str,
                  name: str) -> DataFrame:
    """Orphaned-foreign-key count via LEFT ANTI join (null-safe: a NULL
    child key is an orphan by definition here)."""
    orphans = child.select(F.col(child_key).alias("_k")).join(
        parent.select(F.col(parent_key).alias("_k")).distinct(),
        "_k", "left_anti")
    tot = child.select(F.count(F.lit(1)).alias("n_total"))
    return (orphans.agg(F.count(F.lit(1)).cast("long")
                        .alias("n_violations"))
            .crossJoin(tot)
            .select(F.lit(name).alias("check_name"), "n_violations",
                    "n_total"))


def duplicate_keys(df: DataFrame, key_cols: list[str],
                   name: str) -> DataFrame:
    """Rows beyond the first per key (0 = key is unique)."""
    per = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    return per.agg(
        F.lit(name).alias("check_name"),
        F.sum(F.col("_c") - 1).cast("long").alias("n_violations"),
        F.sum("_c").cast("long").alias("n_total"))


def referential_audit(tables: dict[str, DataFrame]) -> DataFrame:
    """The warehouse checklist over the TPC-H-ish catalog: FK orphans,
    key uniqueness, null and domain violations. One metrics row per
    check, deterministic order by check_name downstream of the union."""
    t = tables
    checks = [
        fk_violations(t["orders"], "o_custkey",
                      t["customer"], "c_custkey", "fk_orders_customer"),
        fk_violations(t["lineitem"], "l_orderkey",
                      t["orders"], "o_orderkey", "fk_lineitem_orders"),
        fk_violations(t["lineitem"], "l_partkey",
                      t["part"], "p_partkey", "fk_lineitem_part"),
        fk_violations(t["customer"], "c_nationkey",
                      t["nation"], "n_nationkey", "fk_customer_nation"),
        duplicate_keys(t["orders"], ["o_orderkey"], "uniq_orderkey"),
        duplicate_keys(t["lineitem"], ["l_orderkey", "l_linenumber"],
                       "uniq_lineitem_key"),
        _count_row(t["lineitem"], "domain_discount_0_1",
                   ~F.col("l_discount").between(0.0, 1.0)),
        _count_row(t["lineitem"], "domain_quantity_pos",
                   F.col("l_quantity") <= 0),
        _count_row(t["documents"], "null_text",
                   F.col("text").isNull() | (F.length("text") == 0)),
        _count_row(t["events"], "null_user", F.col("user_id").isNull()),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
