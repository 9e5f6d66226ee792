"""Z-order layout: Morton-key math + the data-skipping property on real
written files (per-file bounding boxes shrink in BOTH dimensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_project_spark.functions.zorder import (
    ZBITS, interleave2, normalize_to_bits, write_zordered)
from graph_database_project_spark.io import load_table

from .conftest import SF_ORACLE


def test_interleave_known_values(spark):
    # 0b101 x-bits + 0b011 y-bits → z = x@even ⊕ y@odd positions
    df = spark.range(1).select(
        interleave2(F.lit(0b101).cast("long"), F.lit(0b011).cast("long")).alias("z"))
    x, y, want = 0b101, 0b011, 0
    for i in range(ZBITS):
        want |= ((x >> i) & 1) << (2 * i)
        want |= ((y >> i) & 1) << (2 * i + 1)
    assert df.collect()[0].z == want


def test_normalize_bounds_and_monotonic(spark):
    df = spark.range(101).select(
        normalize_to_bits(F.col("id"), F.lit(0), F.lit(100)).alias("n"), "id")
    rows = df.orderBy("id").collect()
    vals = [r.n for r in rows]
    assert vals[0] == 0 and vals[-1] == (1 << ZBITS) - 1
    assert all(a <= b for a, b in zip(vals, vals[1:]))


def _file_boxes(spark, path: str):
    """Per-parquet-file bounding boxes of both key columns — the same
    min/max statistics a scan's file-skipping consults."""
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    return df.groupBy("f").agg(
        F.min("l_partkey").alias("pk_min"), F.max("l_partkey").alias("pk_max"),
        F.min("l_suppkey").alias("sk_min"), F.max("l_suppkey").alias("sk_max"),
    ).collect()


def test_zordered_write_skips_files_on_either_dimension(spark, tmp_path):
    """The data-skipping contract: a single-column sort leaves the OTHER
    column full-range in every file (a filter on it reads everything);
    Morton interleaving bounds BOTH columns per file, so single-column
    filters on either dimension skip most files. (Measured at sf0.01 /
    16 files: avg suppkey width 30 vs 100, suppkey-filter hits 5 files
    vs 16.)"""
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_partkey", "l_suppkey")
    n_files = 16

    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "singlesort")
    write_zordered(li, "l_partkey", "l_suppkey", z_path, n_files=n_files)
    # the naive layout every warehouse starts with: sort by ONE column
    (li.repartitionByRange(n_files, "l_partkey")
       .sortWithinPartitions("l_partkey")
       .write.mode("overwrite").parquet(s_path))

    zb, sb = _file_boxes(spark, z_path), _file_boxes(spark, s_path)
    assert len(zb) >= n_files // 2 and len(sb) >= n_files // 2

    sk_full = (li.agg(F.max("l_suppkey") - F.min("l_suppkey") + 1)
               .collect()[0][0])
    z_sk = sum(r.sk_max - r.sk_min + 1 for r in zb) / len(zb)
    s_sk = sum(r.sk_max - r.sk_min + 1 for r in sb) / len(sb)
    assert s_sk >= 0.95 * sk_full          # single sort: suppkey unbounded
    assert z_sk <= 0.5 * sk_full, (z_sk, sk_full)  # z: bounded per file

    def hits(boxes, pk=None, sk=None):
        n = 0
        for r in boxes:
            if pk is not None and not (r.pk_min <= pk <= r.pk_max):
                continue
            if sk is not None and not (r.sk_min <= sk <= r.sk_max):
                continue
            n += 1
        return n

    # filter on the non-sort column: z-order must skip at least half the
    # files the single-column layout reads
    assert hits(zb, sk=50) <= hits(sb, sk=50) // 2
    # and the trade across BOTH single-column filters still favors z
    assert (hits(zb, sk=50) + hits(zb, pk=1000)
            <= hits(sb, sk=50) + hits(sb, pk=1000))
