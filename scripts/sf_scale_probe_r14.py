"""Scale spot-check for the r14 pattern-surface shapes (SCALE.md §8
discipline: every new family gets a MEASURED 10x row). The registered
keys run on the tiny static XML corpus, so — like the r13 probe — this
rebuilds their PLAN SHAPES on a size-parameterized synthetic graph and
drives the EXACT registry code path (graph/pattern.match_pattern):

* exists_semi — ``MATCH (p:P)-[:T]->(d:D) WHERE (d)-[:HAS]->(:C)``:
  the positive existential predicate's left-SEMI join against the
  fact-sized HAS relation. Expectation: one |E|-keyed semi join —
  linear, and NEVER multiplies rows (the plan differentiator vs a
  positive edge).
* numeric_where — ``WHERE toFloat(c.content) / toInteger(c.docnbr2)
  > x`` over the fact relation: try_cast + arithmetic are JVM-side
  whole-stage-codegen expressions; the probe pins that the filter adds
  no shuffle and scales with the scan.
* collect_node — ``RETURN p.docnbr, collect(d)``: the whole-node
  'id:name' rendering + sort_array/concat_ws fold under one
  aggregation shuffle. Expectation: linear in bound rows.
* case_key — searched CASE as the implicit-grouping key over the fact
  relation: one aggregate shuffle keyed on the CASE expression.

Substrate over spark.range(1, n+1) (same shape as the r13 probe, plus
numeric-STRING content so the cast path is live): labels P (v%10==1),
D (v%10==2), C (rest); HAS edges d -> d+1 … d+((d div 10) % 5)
(variable out-degree 0..4 — some D have NO HAS edge, keeping the
exists filter live); T edges p -> p+1.

A scan-and-aggregate baseline over the same relations normalizes the
window (ratios, not absolutes).

Usage:  python scripts/sf_scale_probe_r14.py [--runs 2] [--out FILE]
Paste target: SCALE.md §8 r14 block. Run on a QUIET host (no builder
pytest / bench concurrently). Results FLUSH incrementally to --out
(default /tmp/sfscale_r14.json) — Spark progress bars glue stdout
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
         .otherwise(F.array(F.lit("C"))).alias("labels"),
        F.concat(F.lit("n"), k).alias("name"),
        # numeric STRING content — the corpus's string-typed property
        # discipline, so toFloat/toInteger try_casts are live
        (k % 997).cast("string").alias("content"),
        (k % 1000).cast("string").alias("docnbr"),
        F.create_map().cast("map<string,string>").alias("props"),
    ).localCheckpoint(eager=True)
    # fanout 0 must mean NO edges: sequence(start, stop) with
    # start > stop DESCENDS (step -1), silently manufacturing two
    # edges (incl. a self-loop) for the fanout-0 nodes and killing the
    # exists discriminator — filter the zero-fanout rows out instead
    # (r14 review finding: the dead-variation family)
    dnodes = r.filter(k % 10 == 2)
    has = (dnodes.filter((F.expr("v div 10") % 5) >= 1)
           .select(k.alias("src"),
                   F.explode(F.sequence(
                       k + 1, k + (F.expr("v div 10") % 5)))
                   .alias("dst"))
           .withColumn("rel_type", F.lit("HAS")))
    t = (r.filter(k % 10 == 1)
         .select(k.alias("src"), (k + 1).alias("dst"),
                 F.lit("T").alias("rel_type")))
    edges = has.unionByName(t).localCheckpoint(eager=True)
    return nodes, edges


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--big-runs", type=int, default=1)
    ap.add_argument("--out", default="/tmp/sfscale_r14.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graph_database_project_spark.graph.pattern import match_pattern
    from graph_database_project_spark.session import get_spark

    spark = get_spark("sf-scale-probe-r14")

    def scan_baseline(nodes, edges):
        edges.agg(F.sum("src"), F.count("*")).collect()
        nodes.agg(F.count("*")).collect()

    def exists_semi(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (p:P)-[:T]->(d:D) WHERE (d)-[:HAS]->(:C) "
            "RETURN d.docnbr AS docnbr, count(*) AS n")
        return df.agg(F.count(F.lit(1)), F.sum("n")).collect()

    def numeric_where(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (d:D)-[:HAS]->(c) "
            "WHERE toFloat(c.content) / 2 > 240.5 AND "
            "toInteger(c.content) < 900 "
            "RETURN d.docnbr AS docnbr, c.content AS val")
        return df.agg(F.count(F.lit(1))).collect()

    def collect_node(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (d:D)-[:HAS]->(c) "
            "RETURN d.docnbr AS docnbr, collect(c) AS members")
        return df.agg(F.count(F.lit(1)),
                      F.sum(F.length("members"))).collect()

    def case_key(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (d:D)-[:HAS]->(c) "
            "RETURN CASE WHEN toInteger(c.content) >= 500 THEN 'hi' "
            "WHEN toInteger(c.content) >= 100 THEN 'mid' "
            "ELSE 'lo' END AS band, count(*) AS n")
        return df.agg(F.count(F.lit(1)), F.sum("n")).collect()

    jobs = {"scan": scan_baseline, "exists_semi": exists_semi,
            "numeric_where": numeric_where,
            "collect_node": collect_node, "case_key": case_key}
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
