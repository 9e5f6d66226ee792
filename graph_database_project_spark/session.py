"""SparkSession factory tuned for the local[32] harness but configured the
way a 1000-executor cluster job would be: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow transfers on, UTC everywhere, modest
shuffle-partition count matched to parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _env_shuffle_partitions() -> int:
    """``SPARK_GRAFT_SHUFFLE_PARTITIONS`` parsed defensively (r15 advice):
    an empty / non-numeric / non-positive value must NOT break every
    session build (``int('')`` raises) or hand Spark an invalid
    ``spark.sql.shuffle.partitions`` — fall back to the default with a
    warning instead."""
    raw = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "").strip()
    if not raw:
        return 0
    try:
        n = int(raw)
    except ValueError:
        n = -1
    if n <= 0:
        import warnings
        warnings.warn(
            f"ignoring SPARK_GRAFT_SHUFFLE_PARTITIONS={raw!r} "
            f"(want a positive integer); using "
            f"{DEFAULT_SHUFFLE_PARTITIONS}")
        return 0
    return n


def get_spark(app_name: str = "graph_database_project_spark",
              cpus: int | str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    Every config here is also what you'd set on a real cluster; the only
    local-mode-specific knob is ``spark.driver.memory`` (local mode = driver
    is the lone executor).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8
    # Scale-adaptive initial shuffle partitioning (r15): AQE coalescing
    # adapts DOWNWARD from this number at runtime, so the initial value
    # only needs to be high enough that no single post-shuffle partition
    # exceeds ~100-1000 MB (guide: shuffle partitions in the 100 MB-1 GB
    # range). The local default (32 = local core count) is frozen for
    # bench comparability; a cluster run sets SPARK_GRAFT_SHUFFLE_PARTITIONS
    # to ~2x total executor cores or bytes/256 MB, whichever is larger —
    # AQE then coalesces small stages instead of a constant under-
    # partitioning large ones.
    shuffle_partitions = (shuffle_partitions
                          or _env_shuffle_partitions()
                          or DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # events.parquet carries INT64 TIMESTAMP(NANOS) which vanilla Spark
        # rejects; read as long and convert in io.load_tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the generated-class cache defaults to 100 entries; a bench /
        # test session compiles hundreds of codegen stages, and at the
        # boundary EVERY repetition of the largest whole-stage chains
        # (node2vec's 8-round loop ~14-19 s codegen-cold vs ~4 s warm)
        # re-pays cold codegen — the r13 bimodal-bench adjudication
        # (BASELINE.md). Static conf, so it must be set at build time.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # In case an outside harness created the session first, set the runtime-
    # settable confs we depend on.
    for k, v in [
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
