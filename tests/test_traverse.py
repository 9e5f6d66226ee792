"""Unit tests for the iterative graph loops on hand-built graphs with known
answers (cycle safety, min-depth semantics, CC fixpoint, PageRank closed
form)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_project_spark.graph.traverse import (
    connected_components, k_hop, pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(i, i) for i in ids], "seed long, node long")


def test_khop_chain_with_cycle(spark):
    # 1→2→3→4→1 cycle plus 3→5
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (3, 5)])
    got = {
        (r.node, r.depth)
        for r in k_hop(_seeds(spark, [1]), edges, depth=3).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2), (4, 3), (5, 3)}


def test_khop_min_depth_on_diamond(spark):
    # 1→2, 1→3, 2→4, 3→4 : node 4 at depth 2, once
    edges = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    rows = k_hop(_seeds(spark, [1]), edges, depth=3).collect()
    assert sorted((r.node, r.depth) for r in rows) == [(1, 0), (2, 1), (3, 1), (4, 2)]


def test_khop_directions(spark):
    edges = _edges(spark, [(1, 2), (3, 2)])
    out_ = {r.node for r in k_hop(_seeds(spark, [2]), edges, 2, "out").collect()}
    in_ = {r.node for r in k_hop(_seeds(spark, [2]), edges, 2, "in").collect()}
    both = {r.node for r in k_hop(_seeds(spark, [2]), edges, 2, "both").collect()}
    assert out_ == {2} and in_ == {1, 2, 3} and both == {1, 2, 3}


def test_khop_empty_frontier_early_exit(spark):
    edges = _edges(spark, [(1, 2)])
    rows = k_hop(_seeds(spark, [1]), edges, depth=10).collect()
    assert len(rows) == 2  # loop stopped at hop 2, not 10


def test_connected_components_two_islands(spark):
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    # island A: 1-2-3-4 chain; island B: 5-6; singleton 7
    edges = _edges(spark, [(2, 1), (2, 3), (3, 4), (5, 6)])
    got = {(r.node, r.component) for r in connected_components(verts, edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5), (7, 7)}


def test_pagerank_ring_uniform(spark):
    # directed 4-ring: symmetric → all ranks exactly 1.0
    verts = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ranks = pagerank(verts, edges, n_iter=5).collect()
    assert all(abs(r.rank - 1.0) < 1e-9 for r in ranks)


def test_pagerank_star_center_highest(spark):
    verts = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = _edges(spark, [(i, 0) for i in range(1, 5)])  # all point at 0
    ranks = {r.node: r.rank for r in pagerank(verts, edges, n_iter=20).collect()}
    assert ranks[0] > ranks[1]
    assert abs(sum(ranks.values()) - 5.0) < 1e-6  # mass conserved
