"""Table loading over the driver-provided parquet testdata.

All scans go through here so that (a) the ns-timestamp quirk of
``events.parquet`` is normalized in exactly one place, and (b) every query
reads through the same code path Catalyst can push filters/projections into
(plain ``spark.read.parquet`` — scan pruning verified via .explain in
tests/test_plans.py).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def epoch_long_to_ts_ntz(col: F.Column) -> F.Column:
    """Version-proof epoch-long → timestamp_ntz (UTC wall clock).

    The ``events.ts`` column is INT64 TIMESTAMP(NANOS) on disk. What a
    LongType-schema read yields depends on the reader: the batch reader
    under ``nanosAsLong`` returns **nanoseconds**, while the PySpark 4.1
    *streaming* parquet reader ignores that conf and returns
    **microseconds**. Rather than assume a unit per code path (the r03
    regression), detect it from magnitude — epoch values in any plausible
    data range (1973..2200+) differ by ≥3 orders of magnitude per unit:

        ns ≥ 1e17, µs ≥ 1e14, ms ≥ 1e11, else seconds.

    Truncation to µs matches DuckDB's flooring of nanos, so oracle
    wall-clock values agree bit-for-bit.
    """
    # ns→µs MUST divide in decimal, not double: long/int is DOUBLE division
    # in Spark, and doubles can't represent ns-scale epochs exactly (ulp at
    # 1.7e18 is 256 ns), so floor(col / 1000) lands on the wrong µs for
    # values near a boundary. Decimal division is exact at any magnitude.
    ns_to_us = F.floor(col.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    us = (
        F.when(col >= F.lit(10 ** 17), ns_to_us)
        .when(col >= F.lit(10 ** 14), col)
        .when(col >= F.lit(10 ** 11), col * F.lit(1000))
        .otherwise(col * F.lit(1000000))
    ).cast("long")
    return F.timestamp_micros(us).cast("timestamp_ntz")


_MEMO_LOCK = threading.RLock()

# (sf_dir, table, target_parallelism) → scan partition count; see the
# widen probe in load_table. Testdata dirs are immutable for a process
# lifetime, so the cache can't go stale.
_WIDEN_PROBE_CACHE: dict[tuple[str, str, int], int] = {}


def session_memo(spark: SparkSession, attr: str, key, build):
    """Build-once cache scoped to a SparkSession (stored as a session
    attribute, so it dies with the session and never crosses drivers).
    Used for expensive derivations reused across queries: the XML store,
    the dedup shingle relation, the IVF index, streaming drain counts.

    Serialized under one lock: a lost check-then-set race wouldn't just
    waste work — a losing build of a persisted/checkpointed DataFrame
    would leak its storage blocks for the session's lifetime (nothing
    would hold a reference to unpersist). Builds are once per
    (session, key), so the contention cost is nil."""
    with _MEMO_LOCK:
        cache = getattr(spark, attr, None)
        if cache is None:
            cache = {}
            setattr(spark, attr, cache)
        if key not in cache:
            cache[key] = build()
        return cache[key]


def load_table(spark: SparkSession, sf_dir: str, name: str,
               *, widen: bool = False) -> DataFrame:
    """``widen=True`` repartitions an under-split scan up to the session's
    parallelism. Use it for CPU-bound per-row compute (shingling, hashing,
    vector math) over tables whose parquet has a single row group — Spark
    can't byte-range-split one row group, so without this the whole compute
    pins one core. On a real cluster with many files/row groups the scan is
    already wide and this is a no-op (the partition count check)."""
    if name == "events":
        # events.ts is INT64 TIMESTAMP(NANOS). The caller's SparkSession may
        # not have been built by session.get_spark() (the driver harness
        # passes its own), so set the legacy conf here, runtime-settable and
        # idempotent, before the scan touches the file.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf locked down — fall through and let the read decide
        # This engine computes in UTC (every documented result and oracle
        # assumes it). The ns→ntz conversion below and several downstream
        # expressions (unix_timestamp, window(), TIMESTAMP↔NTZ casts) read
        # the session time zone, so a caller session pinned to another zone
        # would silently shift every events wall-clock value. Same
        # declare-at-the-seam rationale as nanosAsLong above.
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Truncate to micros — same flooring DuckDB applies — as
        # timestamp_ntz so wall-clock values match the oracle. Unit is
        # detected, not assumed (see epoch_long_to_ts_ntz).
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", epoch_long_to_ts_ntz(F.col("ts")))
    if widen:
        target = spark.sparkContext.defaultParallelism
        # The probe (df.rdd.getNumPartitions) forces a DataFrame→RDD
        # conversion per call — harmless locally, pointless churn on a real
        # cluster. The answer is a pure function of (path, parallelism,
        # file layout), so probe once per process and reuse.
        key = (sf_dir, name, target)
        n_parts = _WIDEN_PROBE_CACHE.get(key)
        if n_parts is None:
            n_parts = df.rdd.getNumPartitions()
            _WIDEN_PROBE_CACHE[key] = n_parts
        if n_parts < target:
            df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
