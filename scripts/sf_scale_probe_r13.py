"""Scale spot-check for the r12b/r13 pattern-pipeline shapes (SCALE.md
§8 discipline: every heavy family needs a MEASURED 10x row — verdict
r12 #6 flagged the WITH-pipeline and shortestPath motif keys as the two
argued-but-unmeasured shapes).

The registered keys run on the tiny static XML corpus, so the probe
rebuilds their PLAN SHAPES on a size-parameterized synthetic graph and
drives the EXACT registry code path (graph/pattern.match_pattern — text
→ parse → match_motif):

* with_pipeline — ``MATCH (d:D)-[:HAS]->(c) WITH d, count(c) AS deg
  WHERE deg >= 3 MATCH (p:P)-[:T]->(d) RETURN …``: the boundary's
  implicit-grouping aggregate over the fact-sized edge relation, the
  HAVING filter, and the stage's id-equality join back. Expectation:
  one |E|-keyed shuffle for the aggregate + one keyed join — linear.
* shortest_path — ``MATCH q = shortestPath((s:S)-[:E*1..4]->(x))``
  + length(p) histogram: the exact-h pair chain (er ⋈ er per level,
  distinct per level, min-fold). With bounded out-degree (~3) the
  exact-h set is O(3^h · N) — linear in N at fixed k with a large
  constant; the probe measures the real growth including the per-level
  distinct shuffles.
* optional_chain (r13) — the 3-hop all-or-nothing chain: inner joins
  along the chain + ONE left join onto the anchor. Expectation: linear
  (every term |E|-keyed).

Substrate over spark.range(1, n+1): labels P (v%10==1), D (v%10==2),
C/other (rest); HAS edges d -> d+1 … d+((d div 10) % 5) (variable
out-degree 0..4 so the HAVING threshold is live at any size); T edges
p -> p+1 (P anchors its D); E edges: chain v -> v+1 + doubling
v -> 2v (bounded-degree reachability substrate); S seeds v%97==0.

A scan-and-aggregate baseline over the same relations normalizes the
window (ratios, not absolutes).

Usage:  python scripts/sf_scale_probe_r13.py [--runs 2] [--out FILE]
Paste target: SCALE.md §8 r13 block. Run on a QUIET host (no builder
pytest / bench concurrently). Results FLUSH incrementally to --out
(default /tmp/sfscale_r13.json) — Spark progress bars glue stdout
lines, never parse this probe's stdout.
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

N_BASE = 100_000
N_BIG = 1_000_000


def build_substrate(spark, n: int):
    from pyspark.sql import functions as F

    r = spark.range(1, n + 1).select(F.col("id").alias("v"))
    k = F.col("v")
    nodes = r.select(
        k.alias("id"),
        F.when(k % 10 == 1, F.array(F.lit("P")))
         .when(k % 10 == 2, F.array(F.lit("D")))
         .when(k % 97 == 0, F.array(F.lit("S")))
         .otherwise(F.array(F.lit("C"))).alias("labels"),
        F.concat(F.lit("n"), k).alias("name"),
        F.lit(None).cast("string").alias("content"),
        F.concat(F.lit("d"), (k % 1000)).alias("docnbr"),
        F.create_map().cast("map<string,string>").alias("props"),
    ).localCheckpoint(eager=True)
    dnodes = r.filter(k % 10 == 2)
    # HAS out-degree 0..4 varies with (v div 10) % 5 — the WITH
    # boundary's deg >= 3 threshold stays live at any size
    has = (dnodes.select(k.alias("src"),
                         F.explode(F.sequence(
                             k + 1, k + (F.expr("v div 10") % 5)))
                         .alias("dst"))
           .withColumn("rel_type", F.lit("HAS")))
    t = (r.filter(k % 10 == 1)
         .select(k.alias("src"), (k + 1).alias("dst"),
                 F.lit("T").alias("rel_type")))
    chain = (r.filter(k + 1 <= n)
             .select(k.alias("src"), (k + 1).alias("dst"),
                     F.lit("E").alias("rel_type")))
    dbl = (r.filter(k * 2 <= n)
           .select(k.alias("src"), (k * 2).alias("dst"),
                   F.lit("E").alias("rel_type")))
    edges = (has.unionByName(t).unionByName(chain).unionByName(dbl)
             .localCheckpoint(eager=True))
    return nodes, edges


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--big-runs", type=int, default=1)
    ap.add_argument("--out", default="/tmp/sfscale_r13.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graph_database_project_spark.graph.pattern import match_pattern
    from graph_database_project_spark.session import get_spark

    spark = get_spark("sf-scale-probe-r13")

    def scan_baseline(nodes, edges):
        edges.agg(F.sum("src"), F.count("*")).collect()
        nodes.agg(F.count("*")).collect()

    def with_pipeline(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (d:D)-[:HAS]->(c) WITH d, count(c) AS deg "
            "WHERE deg >= 3 MATCH (p:P)-[:T]->(d) "
            "RETURN d.docnbr AS docnbr, deg")
        return df.agg(F.count(F.lit(1)), F.sum("deg")).collect()

    def shortest_path(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH q = shortestPath((s:S)-[:E*1..4]->(x)) "
            "RETURN length(q) AS hops, count(*) AS n")
        return df.agg(F.count(F.lit(1)), F.sum("n")).collect()

    def optional_chain(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (p:P)-[:T]->(d:D) "
            "OPTIONAL MATCH (d)-[:HAS]->(c)-[:E]->(e)-[:E]->(f) "
            "RETURN p.name AS pn, f.name AS fn")
        return df.agg(F.count(F.lit(1)),
                      F.count("fn")).collect()

    jobs = {"scan": scan_baseline, "with_pipeline": with_pipeline,
            "shortest_path": shortest_path,
            "optional_chain": optional_chain}
    results: dict[str, dict] = {}

    def flush():
        with open(args.out, "w") as fh:
            json.dump({"n_base": N_BASE, "n_big": N_BIG,
                       "runs": args.runs, "big_runs": args.big_runs,
                       "results": results}, fh, indent=1)

    for label, n, reps in (("1x", N_BASE, args.runs),
                           ("10x", N_BIG, args.big_runs)):
        nodes, edges = build_substrate(spark, n)
        for name, fn in jobs.items():
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(nodes, edges)
                walls.append(round(time.perf_counter() - t0, 2))
            results.setdefault(name, {})[label] = {
                "walls": walls, "median": statistics.median(walls)}
            flush()
    for name, r in results.items():
        if "10x" in r and "1x" in r:
            r["ratio_10x"] = round(r["10x"]["median"]
                                   / max(r["1x"]["median"], 1e-9), 2)
    flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
