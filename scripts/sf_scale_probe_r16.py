#!/usr/bin/env python
"""r16 core-scaling probe (VERDICT r15 #5): at sf0.1 every headline
query is job-latency-bound — the 8v32-core ratios sit at ~1 — so this
probe drives the EXACT registry code paths touched this round
(graph/motif._edge_rel var-length expansion, graph/traverse.k_hop,
graph/traverse.connected_components) on a size-parameterized synthetic
graph big enough that compute dominates job latency, at local[cpus].

Substrate: spark.range(N) nodes; deterministic hash fanout edges
(dst = xxhash64(id, f) % N, non-negative) — sf-agnostic, no files.
A scan-and-aggregate baseline row normalizes host-load drift (compare
RATIOS of walls to the baseline, then across core counts).

Usage:
  python scripts/sf_scale_probe_r16.py --cpus 32 --n 1000000 --out F
  python scripts/sf_scale_probe_r16.py --cpus 8  --n 1000000 --out F8
Run the two invocations back-to-back on the same window; results FLUSH
incrementally per measurement (never parse this probe's stdout).
Paste target: SCALE.md §8 r16 block.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import statistics
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--fanout", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.graph.motif import (
        EdgePat, NodePat, match_motif)
    from graph_database_project_spark.graph.traverse import (
        connected_components, k_hop)
    import bench

    spark = get_spark(f"scale-probe-r16-c{args.cpus}", cpus=args.cpus)
    N, FAN = args.n, args.fanout

    base = spark.range(N)
    nodes = base.select(F.col("id").cast("long").alias("node")) \
        .localCheckpoint(eager=True)
    e = None
    for f in range(FAN):
        part = base.select(
            F.col("id").cast("long").alias("src"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(f)), F.lit(N))
            .cast("long").alias("dst"))
        e = part if e is None else e.unionByName(part)
    edges = e.filter(F.col("src") != F.col("dst")) \
        .localCheckpoint(eager=True)

    # motif-store-shaped frames for the var-length path: 1k 'S'-labeled
    # anchors (catalog-bounded → broadcast side), the rest 'N'
    s_stride = max(N // 1000, 1)
    mnodes = nodes.select(
        F.col("node").alias("id"),
        F.array(F.when(F.col("node") % s_stride == 0, F.lit("S"))
                .otherwise(F.lit("N"))).alias("labels"),
        F.col("node").cast("string").alias("name"),
        F.lit(None).cast("string").alias("content"),
        F.lit(None).cast("string").alias("docnbr"),
    ).localCheckpoint(eager=True)
    medges = edges.select("src", "dst", F.lit("L").alias("rel_type")) \
        .localCheckpoint(eager=True)
    seeds = nodes.filter(F.col("node") % s_stride == 0) \
        .select(F.col("node").alias("seed"), "node") \
        .localCheckpoint(eager=True)

    def t_baseline():
        (edges.groupBy((F.col("src") % 97).alias("g"))
         .agg(F.count(F.lit(1)), F.sum("dst"))
         .write.format("noop").mode("overwrite").save())

    def t_varlength():
        m = match_motif(
            mnodes, medges,
            [NodePat("sb", label="S"), NodePat("x")],
            [EdgePat("sb", "x", "L", min_hops=1, max_hops=3)],
            where=F.col("x_id") != F.col("sb_id"),
            label_counts={"S": 1000},
            edges_deduped=True,
        )
        (m.groupBy("sb_id").agg(F.count(F.lit(1)))
         .write.format("noop").mode("overwrite").save())

    def t_khop():
        (k_hop(seeds, edges, 3)
         .groupBy("depth").agg(F.count(F.lit(1)))
         .write.format("noop").mode("overwrite").save())

    def t_cc():
        (connected_components(nodes, edges, max_iter=8)
         .agg(F.countDistinct("component"))
         .write.format("noop").mode("overwrite").save())

    tasks = {"baseline_scan_agg": t_baseline, "motif_varlength": t_varlength,
             "k_hop3": t_khop, "connected_components": t_cc}

    res = {"cpus": args.cpus, "n": N, "fanout": FAN,
           "edges": edges.count(),
           "sentinel_before": bench.machine_sentinel(), "walls": {}}

    def flush():
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)

    for name, fn in tasks.items():  # warm codegen
        fn()
    for rep in range(args.runs):
        for name, fn in tasks.items():
            spark.sparkContext.setJobDescription(f"scale:{name}:{rep}")
            t0 = time.perf_counter()
            fn()
            res["walls"].setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
            flush()
    res["medians"] = {k: round(statistics.median(v), 3)
                      for k, v in res["walls"].items()}
    res["sentinel_after"] = bench.machine_sentinel()
    flush()
    print("WROTE", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
