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
