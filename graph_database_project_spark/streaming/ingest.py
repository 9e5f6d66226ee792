"""Streaming XML ingestion: file-source ``readStream`` over a drop directory
→ per-microbatch shred → MERGE into the graph store (SURVEY.md §1.5
"Streaming ingestion (north-star)"; M4 of the build plan).

The reference ingests by running a converter script per file
(`xml2neo.py:113-125`); the streaming restatement watches a directory and
upserts each arriving document through the exact same shred + MERGE path the
batch ingester uses — one code path for both, which is what makes the
batch/stream equivalence test (tests/test_streaming_ingest.py) meaningful.

Scale: the file source tracks processed files in checkpointed state; each
microbatch is a normal bulk job (shred → anti-join MERGE → two partitioned
parquet writes). Exactly-once lands on the idempotence of MERGE over
deterministic ids — replaying a batch adds nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph.shred import DEFAULT_BATCH, build_graph
from ..graph.store import GraphStore


def read_xml_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    """Whole-file streaming read of a drop directory of XML documents."""
    return (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.xml")
        .load(drop_dir)
        .select(F.input_file_name().alias("src_file"), F.col("value").alias("xml_text"))
    )


def stream_ingest_xml(spark: SparkSession, drop_dir: str, store_path: str,
                      batch: str = DEFAULT_BATCH,
                      checkpoint_dir: str | None = None):
    """Run an availableNow streaming ingest: every XML file currently in
    ``drop_dir`` is shredded and MERGEd into the GraphStore at
    ``store_path``. Returns the StreamingQuery (already awaited).

    ``foreachBatch`` is the documented pattern for merge-style sinks the
    streaming writer can't express natively.
    """
    from ..graph.shred import _shred_batches, SHRED_SCHEMA

    checkpoint_dir = checkpoint_dir or os.path.join(store_path, "_checkpoint")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        shred = batch_df.mapInPandas(_shred_batches, schema=SHRED_SCHEMA)
        nodes, edges = build_graph(shred, batch=batch)
        nodes_path = os.path.join(store_path, "nodes")
        if os.path.exists(nodes_path):
            store = GraphStore.read(spark, store_path).merge(nodes, edges)
            # write-temp-then-swap is the batch path's job; within a stream
            # the checkpoint serializes microbatches so a direct overwrite
            # through a materialized temp view is safe (single writer).
            merged_nodes = store.nodes.localCheckpoint()
            merged_edges = store.edges.localCheckpoint()
            GraphStore(merged_nodes, merged_edges).write(store_path)
        else:
            GraphStore(nodes, edges).write(store_path)

    q = (
        read_xml_stream(spark, drop_dir)
        .writeStream
        .foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
