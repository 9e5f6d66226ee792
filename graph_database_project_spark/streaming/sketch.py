"""Streaming sketch maintenance: a streaming events source keeps the
count-min sketch (per-key frequency) and the HLL register table (distinct
count) fresh via ``foreachBatch`` merge — the streaming complement of
``operators/profiling.heavy_hitters_cms`` / ``cardinality_hll``, and the
online form of the mergeable-state contract (SCALE.md §7b): each
microbatch collapses to a constant-size partial (d×w cells / m registers)
map-side, and the store merge touches only sketch-sized relations no
matter how large the stream grows.

Contract (tests/test_streaming_sketch.py): after the stream drains, the
stored CMS equals ``cms_sketch(all keys so far)`` cell for cell and the
stored HLL equals ``hll_registers(all keys so far)`` register for
register — streaming ≡ batch.

Exactly-once: the two sketches sit on OPPOSITE sides of the replay
question, which is why both live here. CMS counters ADD under merge, so a
replayed microbatch double-counts — the ``_committed/<id>`` marker ledger
(same pattern as streaming/rollup.py) makes application transactional.
HLL registers MAX under merge, so replay is a no-op by ALGEBRA, not
bookkeeping — the ledger protects it too (one transaction per batch), but
the test proves the HLL store survives a ledger bypass unchanged while
the CMS store is exactly what the ledger exists to protect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.profiling import cms_sketch, hll_registers


def cms_keys(batch_df: DataFrame) -> DataFrame:
    """CMS key prep — mirrors q_heavy_hitters_cms."""
    return (batch_df.filter(F.col("user_id").isNotNull())
            .select(F.col("user_id").cast("long").alias("k")))


def hll_keys(batch_df: DataFrame) -> DataFrame:
    """HLL key prep (k < 2^31 domain) — mirrors q_cardinality_hll."""
    return (batch_df.filter(F.col("user_id").isNotNull())
            .select((F.col("user_id").cast("long") % 2147483648).alias("k")))


def _merge_cms(spark: SparkSession, path: str, partial: DataFrame) -> None:
    if os.path.exists(path):
        merged = (spark.read.parquet(path).unionByName(partial)
                  .groupBy("d", "bucket").agg(F.sum("c").alias("c")))
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
    else:
        partial.write.parquet(path)


def _merge_hll(spark: SparkSession, path: str, partial: DataFrame) -> None:
    if os.path.exists(path):
        merged = (spark.read.parquet(path).unionByName(partial)
                  .groupBy("bucket").agg(F.max("reg").alias("reg")))
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
    else:
        partial.write.parquet(path)


def merge_sketches(spark: SparkSession, store_path: str,
                   batch_df: DataFrame, batch_id: int) -> bool:
    """Fold one microbatch into both sketch stores. Returns False when the
    batch id is already committed (replay → no-op)."""
    marker = os.path.join(store_path, "_committed", str(batch_id))
    if os.path.exists(marker):
        return False
    _merge_cms(spark, os.path.join(store_path, "cms"),
               cms_sketch(cms_keys(batch_df)))
    _merge_hll(spark, os.path.join(store_path, "hll"),
               hll_registers(hll_keys(batch_df)))
    os.makedirs(marker, exist_ok=True)
    return True


def stream_sketch_events(spark: SparkSession, events_dir: str,
                         store_path: str, schema,
                         checkpoint_dir: str | None = None,
                         max_files_per_trigger: int = 1):
    """availableNow drain of ``events_dir``, folding every microbatch into
    the sketch store. Returns the finished StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(store_path, "_checkpoint")
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(events_dir))
    q = (src.writeStream
         .foreachBatch(lambda df, bid: merge_sketches(spark, store_path, df, bid))
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def read_sketches(spark: SparkSession, store_path: str) -> tuple[DataFrame, DataFrame]:
    return (spark.read.parquet(os.path.join(store_path, "cms")),
            spark.read.parquet(os.path.join(store_path, "hll")))
