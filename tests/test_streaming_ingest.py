"""Streaming ingest (foreachBatch MERGE) equals batch ingest, and replay is
idempotent (SURVEY.md §5.5 / M4)."""

from __future__ import annotations

import glob
import shutil

from graph_database_project_spark.graph.shred import ingest_xml
from graph_database_project_spark.streaming.ingest import stream_ingest_xml
from graph_database_project_spark.graph.store import GraphStore

REFERENCE_XMLS = sorted(glob.glob("/root/reference/boeing_service_bulletin_*.xml"))


def _counts(store: GraphStore):
    return store.nodes.count(), store.edges.count()


def test_stream_ingest_equals_batch(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    for p in REFERENCE_XMLS[:2]:
        shutil.copy(p, drop)
    store_path = str(tmp_path / "store")

    stream_ingest_xml(spark, str(drop), store_path)
    streamed = GraphStore.read(spark, store_path)

    nodes, edges = ingest_xml(spark, [str(p) for p in sorted(drop.glob("*.xml"))])
    assert _counts(streamed) == (nodes.count(), edges.count())
    assert streamed.nodes.select("id").exceptAll(nodes.select("id")).count() == 0
    assert streamed.edges.select("src", "dst", "rel_type") \
        .exceptAll(edges.select("src", "dst", "rel_type")).count() == 0


def test_stream_ingest_incremental_and_idempotent(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    shutil.copy(REFERENCE_XMLS[0], drop)
    store_path = str(tmp_path / "store")

    stream_ingest_xml(spark, str(drop), store_path)
    n1 = _counts(GraphStore.read(spark, store_path))

    # second run, nothing new in the directory → checkpoint skips all files
    stream_ingest_xml(spark, str(drop), store_path)
    assert _counts(GraphStore.read(spark, store_path)) == n1

    # drop a second document → counts strictly grow, shared LineNumber
    # nodes MERGE instead of duplicating
    shutil.copy(REFERENCE_XMLS[1], drop)
    stream_ingest_xml(spark, str(drop), store_path)
    store = GraphStore.read(spark, store_path)
    n2 = _counts(store)
    assert n2[0] > n1[0] and n2[1] > n1[1]
    assert store.nodes.groupBy("id").count().filter("count > 1").count() == 0
