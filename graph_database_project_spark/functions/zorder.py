"""Z-order (Morton-curve) layout primitives for multi-dimensional data
skipping.

At 100 TB a parquet scan prunes row groups by per-file min/max statistics.
Sorting by ONE column makes that column's ranges tight and every other
column's ranges full-width; interleaving the bits of k normalized columns
(the Morton curve) bounds EVERY dimension's per-file range, so selective
filters on any of the k columns skip most files. This module supplies:

* ``zorder_value(...)`` — a pure-Column (codegen, zero-shuffle) Morton key
  from integer columns with given bounds;
* ``write_zordered(...)`` — range-partition + sort by that key and write,
  the OPTIMIZE ZORDER BY shape Delta/Iceberg expose;
* the file-locality proof lives in tests/test_zorder.py: the z-sorted
  layout's per-file (partkey × suppkey) bounding boxes are orders of
  magnitude smaller than a naively sorted write's.

The bit math is deliberately exact-integer so a SQL oracle can reproduce
the key bit-for-bit (operators/relational.py's ``zorder_layout`` query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZBITS = 16  # bits kept per dimension; 2 dims → 32-bit Morton key


def normalize_to_bits(col: Column, mn: Column, mx: Column,
                      bits: int = ZBITS) -> Column:
    """Affine-map an integer column with known [mn, mx] bounds onto
    [0, 2^bits): exact integer math (``(col-mn)*(2^bits-1) // span``), no
    doubles, so engines agree bit-for-bit."""
    span = F.greatest(mx - mn, F.lit(1))
    return F.floor(((col - mn) * ((1 << bits) - 1)) / span).cast("long")


def interleave2(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1. A sum of 2×bits shifted
    single-bit terms — stays inside whole-stage codegen."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_value(x: Column, y: Column, x_mn: Column, x_mx: Column,
                 y_mn: Column, y_mx: Column, bits: int = ZBITS) -> Column:
    return interleave2(
        normalize_to_bits(x, x_mn, x_mx, bits),
        normalize_to_bits(y, y_mn, y_mx, bits),
        bits,
    )


def write_zordered(df: DataFrame, x: str, y: str, path: str,
                   n_files: int = 16, bits: int = ZBITS) -> None:
    """OPTIMIZE ZORDER BY (x, y): attach the Morton key (bounds from one
    tiny agg, broadcast), range-partition into ``n_files`` z-runs and sort
    within each, then write. repartitionByRange keeps files disjoint in z —
    per-file bounding boxes stay small in BOTH dimensions.

    Scale: one pass + one range shuffle (the same cost as any global sort
    write); the bounds agg is a 1-row broadcast, not a driver collect."""
    bounds = df.agg(
        F.min(x).alias("_xmn"), F.max(x).alias("_xmx"),
        F.min(y).alias("_ymn"), F.max(y).alias("_ymx"))
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_z",
        zorder_value(F.col(x), F.col(y), F.col("_xmn"), F.col("_xmx"),
                     F.col("_ymn"), F.col("_ymx"), bits),
    ).drop("_xmn", "_xmx", "_ymn", "_ymx")
    (keyed.repartitionByRange(n_files, "_z")
          .sortWithinPartitions("_z")
          .drop("_z")
          .write.mode("overwrite").parquet(path))
