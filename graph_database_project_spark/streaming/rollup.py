"""Continuous-aggregate maintenance: a streaming events source keeps a
materialized 15-minute rollup fresh via ``foreachBatch`` MERGE — the
streaming complement of ``operators/timeseries.q_ts_rollup_multires``
(TimescaleDB's continuous-aggregate refresh policy, restated as Structured
Streaming).

Contract: the rollup on disk always equals ``events_so_far.groupBy(
event_type, b15).agg(count, sum)`` — the batch-equivalence property
``tests/test_streaming_rollup.py`` asserts microbatch by microbatch.

Exactly-once: counts and sums are NOT idempotent under replay (unlike
the graph MERGE's only-if-absent semantics), so each microbatch writes
its partial to its OWN ``data/batch=<id>`` delta dir with overwrite
semantics — a replayed batch id (crash between the delta write and the
ledger marker; Spark re-runs the batch from its checkpoint) overwrites
its own delta instead of double-counting into a mutable store, making
replay idempotent by LAYOUT. The ``_committed/<id>`` ledger remains as a
replay short-circuit and audit trail; correctness no longer depends on
marker ordering (the earlier merge-into-one-store design had a
crash window there). The read side folds the deltas — the same
bucket-keyed re-aggregation the old merge ran per batch, now run at
read time; ``compact_rollup`` bounds the delta count (fold-and-swap,
see compaction.py).

Scale: each microbatch collapses to ~distinct-buckets rows map-side before
touching the store; the merge is a key-union re-aggregation over (existing
rollup ∪ partial), both rollup-sized. At 100 TB the rollup table is still
tiny next to the stream (buckets × types), and the re-aggregation would
become a partitioned MERGE on a transactional table instead of the
overwrite swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.timeseries import _b15


def rollup_partial(batch_df: DataFrame) -> DataFrame:
    """Per-microbatch partial aggregate at 15-minute grain."""
    return batch_df.groupBy(
        "event_type", _b15().alias("b15"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def merge_rollup(spark: SparkSession, rollup_path: str,
                 batch_df: DataFrame, batch_id: int) -> bool:
    """Apply one microbatch to the rollup store. Returns False when the
    batch id is already in the commit ledger (replay → no-op)."""
    marker = os.path.join(rollup_path, "_committed", str(batch_id))
    if os.path.exists(marker):
        return False
    # idempotent per-batch delta: overwrite scopes to THIS batch's dir,
    # so however many times Spark replays the batch, its partial lands
    # exactly once in the fold
    rollup_partial(batch_df).write.mode("overwrite").parquet(
        os.path.join(rollup_path, "data", f"batch={batch_id}"))
    os.makedirs(marker, exist_ok=True)
    return True


def stream_rollup_events(spark: SparkSession, events_dir: str,
                         rollup_path: str, schema,
                         checkpoint_dir: str | None = None,
                         max_files_per_trigger: int = 1):
    """Run an availableNow streaming refresh over every events parquet file
    in ``events_dir``; each microbatch folds into the rollup through the
    committed-ledger MERGE. Returns the finished StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(rollup_path, "_checkpoint")
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    q = (
        src.writeStream
        .foreachBatch(lambda df, bid: merge_rollup(spark, rollup_path, df, bid))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _fold_rollup(deltas: DataFrame) -> DataFrame:
    """The merge algebra (additive per bucket) — shared by the read-side
    fold and compaction so the two can never drift."""
    return (deltas.groupBy("event_type", "b15")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").alias("sum_value")))


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Fold the per-batch partials into the current rollup (batch ids
    surface as a partition column the fold drops)."""
    return _fold_rollup(spark.read.parquet(os.path.join(rollup_path, "data")))


def compact_rollup(spark: SparkSession, rollup_path: str) -> dict:
    """Fold all accumulated deltas into one ``batch=-1`` base delta (see
    compaction.py for the swap/replay contract) — bounds the delta count
    the docstring above promises a maintenance job for. Run only while
    the stream is stopped (single-writer)."""
    from .compaction import compact_deltas

    return compact_deltas(spark, os.path.join(rollup_path, "data"), _fold_rollup)
