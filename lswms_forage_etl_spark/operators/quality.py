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


def source_divergence(docs: DataFrame, group_col: str = "source",
                      text_col: str = "text",
                      scale: int = 1_000_000_000) -> DataFrame:
    """Distribution-shift monitor: per group (source/domain/snapshot),
    the total-variation distance between that group's token
    distribution and the corpus-wide distribution, in exact
    parts-per-billion — the domain-mix drift gate a training-data
    pipeline runs per ingest batch (a source whose language suddenly
    shifts jumps in TV distance long before quality heuristics fire).

    Exact-integer discipline: both distributions are first quantized to
    ppb by BIGINT floor division (c * scale div n — identical on every
    engine), then TV = sum |p_g - p| / 2 is a pure integer sum, so the
    oracle replays it bit-for-bit. Safe in int64 while any single
    group's token count stays under ~9e9 (int64/scale); shard larger
    groups by snapshot before auditing, or lower `scale`.

    Scale shape: tokens ABSENT from a group still contribute |0 - p|,
    but materializing the |groups| x |vocab| grid for them is wasted
    motion — their mass folds into a constant:
        TV_g = (sum_{t in G} (|p_g - p| - p) + P_total) / 2
    with P_total = sum over ALL tokens of p (one corpus-wide
    aggregate). So the per-group work is proportional to the group's
    OWN vocabulary: one (group, token) aggregation + one token
    aggregation off the same staged table, an inner join on the
    uniform token key, and two bounded broadcasts. Output = |groups|
    rows."""
    from lswms_forage_etl_spark.lifecycle import stage_table
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    base = stage_table(
        docs.select(F.col(group_col).alias("grp"),
                    F.explode(toks).alias("token"))
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("c_gt")))
    corpus = stage_table(
        base.groupBy("token").agg(F.sum("c_gt").alias("c_t")))
    n_g = base.groupBy("grp").agg(F.sum("c_gt").alias("n_g"))
    n = corpus.agg(F.sum("c_t").alias("n"))
    p = F.expr(f"(c_t * {scale}) div n")
    p_total = corpus.crossJoin(F.broadcast(n)).agg(
        F.sum(p).alias("p_total"))
    p_g = F.expr(f"(c_gt * {scale}) div n_g")
    per_tok = (base.join(corpus, "token")
               .join(F.broadcast(n_g), "grp")
               .crossJoin(F.broadcast(n))
               .select("grp", "n_g",
                       (F.abs(p_g - p) - p).alias("_d")))
    return (per_tok.groupBy("grp")
            .agg(F.sum("_d").alias("_s"), F.max("n_g").alias("n_tokens"))
            .crossJoin(F.broadcast(p_total))
            .select(F.col("grp").alias(group_col), "n_tokens",
                    F.expr("(_s + p_total) div 2").cast("long")
                    .alias("tv_ppb")))
