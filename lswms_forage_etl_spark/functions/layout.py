"""Data-layout keys for multi-dimensional clustering at scale.

Z-order (Morton) interleaving maps two correlated filter dimensions onto
one linear key so that a range of the key covers a compact rectangle of
the (x, y) space. Writing a table `repartitionByRange(zkey) +
sortWithinPartitions(zkey)` gives every parquet file tight min/max stats
on BOTH dimensions — the same effect as Delta/Iceberg `OPTIMIZE ZORDER
BY`, expressed with stock Spark writers. Scans filtered on either
dimension then skip most files on row-group statistics alone, which is
the difference between a 100 TB scan and a few-GB scan for selective
predicates.

The key is pure integer bit-arithmetic (codegen'd, engine-portable — the
DuckDB oracle computes the identical value), deterministic, and
shuffle-free; the only shuffle in a layout rewrite is the single range
repartition that IS the rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton interleave of the low `bits` bits of two int columns -> one
    long key (x in even bit positions, y in odd). A flat sum of 2*bits
    shift/mask terms — whole-stage codegen, no loops, no Python.

    Inputs are masked to the low `bits` bits up front, so the key is
    well-defined for ANY input (negative values wrap to their two's-
    complement low bits, identically in Spark and the SQL twin — an
    unmasked arithmetic shift on negatives would let engines diverge,
    ADVICE r3)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits={bits} out of range [1, 31]")
    mask = F.lit((1 << bits) - 1).cast("long")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long").bitwiseAND(mask)
    yc = (F.col(y) if isinstance(y, str) else y).cast("long").bitwiseAND(mask)
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + F.shiftleft(F.shiftright(xc, b).bitwiseAND(F.lit(1)),
                                2 * b)
        acc = acc + F.shiftleft(F.shiftright(yc, b).bitwiseAND(F.lit(1)),
                                2 * b + 1)
    return acc


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The DuckDB/ANSI twin of zorder_key — textually generated from the
    same bit positions so both engines compute identical keys."""
    m = (1 << bits) - 1
    xm, ym = f"(CAST({x} AS BIGINT) & {m})", f"(CAST({y} AS BIGINT) & {m})"
    terms = []
    for b in range(bits):
        terms.append(f"(({xm} >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"(({ym} >> {b}) & 1) * {1 << (2 * b + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(df: DataFrame, x: str, y: str, bits: int = 16,
                  num_files: int | None = None) -> DataFrame:
    """Cluster a table for two-dimensional pruning: one range shuffle on
    the interleaved key + an in-partition sort, ready for a parquet/Delta
    write where every output file holds a compact (x, y) tile. Pass the
    result straight to `.write` — no extra action, no collect."""
    keyed = df.withColumn("_zkey", zorder_key(x, y, bits))
    parted = (keyed.repartitionByRange(num_files, "_zkey")
              if num_files else keyed.repartitionByRange("_zkey"))
    return parted.sortWithinPartitions("_zkey").drop("_zkey")


def zonemap_stats(df: DataFrame, shard_col, value_col: str,
                  predicate=None) -> DataFrame:
    """Per-shard zone map — the min/max file-statistics structure behind
    parquet row-group skipping, Delta/Iceberg file stats, and Snowflake
    micro-partitions: one row per shard with (n_rows, min_v, max_v) for
    `value_col`, built in ONE groupBy shuffle on the shard key.

    When `predicate` (a boolean Column) is given, the same pass also
    counts matching rows per shard (`n_matched`) — the audit column that
    proves the zone-map guarantee: a shard whose [min_v, max_v] range
    misses the predicate interval must show n_matched = 0, so a scan
    that skips it drops nothing. At 100 TB the manifest is one row per
    file — the Delta-log pattern: the driver filters THIS table (KBs-MBs)
    instead of listing and opening every data file."""
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    aggs = [F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v")]
    if predicate is not None:
        aggs.append(F.sum(F.when(predicate, 1).otherwise(0))
                    .cast("long").alias("n_matched"))
    return df.groupBy(shard.alias("shard_id")).agg(*aggs)


def zonemap_selected(lo, hi) -> Column:
    """Interval-overlap selection over a zone-map manifest: shard
    [min_v, max_v] intersects the half-open probe interval [lo, hi)."""
    return (F.col("max_v") >= F.lit(lo)) & (F.col("min_v") < F.lit(hi))


def zonemap_write(df: DataFrame, path: str, shard_col,
                  value_col: str) -> DataFrame:
    """Materialize a zone-mapped layout: the data partitioned by shard
    (each shard = one skippable unit) plus its stats manifest at
    `<path>/_zonemap`. Returns the manifest."""
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    keyed = df.withColumn("shard_id", shard)
    keyed.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    manifest = zonemap_stats(df, shard_col, value_col)
    manifest.write.mode("overwrite").parquet(path + "/_zonemap")
    return manifest


def zonemap_scan(spark, path: str, value_col: str, lo, hi) -> DataFrame:
    """Probe a zone-mapped layout: consult the manifest FIRST, then scan
    only the shards whose ranges overlap [lo, hi) — literal partition
    filters, so Spark's file listing itself skips the pruned shards
    (PartitionFilters in the scan; plan-tested). The collect is bounded
    by the number of SELECTED shards — selectivity-bound, the same
    driver-side stats filtering Delta's log replay performs. The exact
    row filter is re-applied after the coarse shard cut."""
    manifest = spark.read.parquet(path + "/_zonemap")
    ids = [r["shard_id"]
           for r in manifest.where(zonemap_selected(lo, hi))
                            .select("shard_id").collect()]
    scan = spark.read.parquet(path).where(F.col("shard_id").isin(ids))
    return scan.where((F.col(value_col) >= F.lit(lo))
                      & (F.col(value_col) < F.lit(hi)))


def compact_bins(manifest: DataFrame, size_col: str = "n_rows",
                 shard_col: str = "shard_id",
                 target: int = 2000) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE/bin-packing
    maintenance pass every file-based 100 TB table needs: assign
    CONTIGUOUS shards (in `shard_col` order, so an existing sort/
    zone-map clustering survives the rewrite) to target-sized bins by
    cumulative size: bin = floor(cum_before / target). Every bin except
    possibly the last holds >= target once full shards land in it, and
    no bin exceeds target + max_shard - 1 rows.

    The window is a GLOBAL ordered scan — correct here because the
    input is a file MANIFEST (one row per shard/file, the Delta-log
    scale argument: KBs-MBs where the data is TBs), never row-level
    data. Emits (shard, n, bin_id, bin_rows, bin_shards)."""
    from pyspark.sql import Window

    w = (Window.orderBy(shard_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    binned = manifest.select(
        shard_col, F.col(size_col).alias("n"),
        (F.coalesce(F.sum(size_col).over(w), F.lit(0))
         / F.lit(target)).cast("long").alias("bin_id"))
    w_bin = Window.partitionBy("bin_id")
    return binned.select(
        shard_col, "n", "bin_id",
        F.sum("n").over(w_bin).alias("bin_rows"),
        F.count(F.lit(1)).over(w_bin).alias("bin_shards"))


def merged_zonemap(spark, table: str) -> DataFrame:
    """Fold an APPEND-ONLY zone-map manifest (one stats row per shard
    PER BATCH — the streaming-ingest maintenance shape) into the
    canonical one-row-per-shard form: zone maps are mergeable, so
    min(min), max(max), sum(n) reproduce exactly what a fresh build
    over the whole corpus would emit."""
    return (spark.read.parquet(table)
            .groupBy("shard_id")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.min("min_v").alias("min_v"),
                 F.max("max_v").alias("max_v")))
