"""Scale spot-check for the r15 pattern-surface shapes (SCALE.md §8
discipline: every new family gets a MEASURED 10x row). Same protocol
as the r14 probe — the registered keys run on the tiny static XML
corpus, so this rebuilds their PLAN SHAPES on a size-parameterized
synthetic graph and drives the EXACT registry code path
(graph/pattern.match_pattern):

* paren_where — grouped arithmetic ``WHERE (toInteger(c.content) + 10)
  * 2 > x``: parenthesized grouping compiles to the same whole-stage-
  codegen filter expressions as the r14 flat arithmetic — zero added
  shuffles expected.
* cond_agg — ``sum(CASE WHEN … THEN 1 ELSE 0 END)``: the conditional
  aggregate is a codegen expression under the existing one-shuffle
  partial aggregate (same class as r14's case_key).
* concat_size — string ``+`` concat and ``size(string)`` as projection
  expressions: pure codegen, rides the scan.
* size_collect — ``size(collect(c.name))`` rewritten to count: must be
  NO SLOWER than the r14 collect_node family (the rewrite skips the
  sort_array/concat_ws fold entirely).

Substrate identical to the r14 probe (spark.range labels P/D/C, HAS
fanout 0..4 with zero-fanout rows filtered OUT of the edge build —
sequence() descends when start > stop — numeric-STRING content so the
try_cast path is live). A scan-and-aggregate baseline normalizes the
window (ratios, not absolutes).

Usage:  python scripts/sf_scale_probe_r15.py [--runs 2] [--out FILE]
Paste target: SCALE.md §8 r15 block. Run on a QUIET host (no builder
pytest / bench concurrently). Results FLUSH incrementally to --out
(default /tmp/sfscale_r15.json) — Spark progress bars glue stdout
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
        (k % 997).cast("string").alias("content"),
        (k % 1000).cast("string").alias("docnbr"),
        F.create_map().cast("map<string,string>").alias("props"),
    ).localCheckpoint(eager=True)
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
    ap.add_argument("--out", default="/tmp/sfscale_r15.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graph_database_project_spark.graph.pattern import match_pattern
    from graph_database_project_spark.session import get_spark

    spark = get_spark("sf-scale-probe-r15")

    def scan_baseline(nodes, edges):
        edges.agg(F.sum("src"), F.count("*")).collect()
        nodes.agg(F.count("*")).collect()

    def paren_where(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (d:D)-[:HAS]->(c) "
            "WHERE (toInteger(c.content) + 10) * 2 > 500 AND "
            "(toFloat(c.content) / 2) + 1 < 480.5 "
            "RETURN d.docnbr AS docnbr, c.content AS val")
        return df.agg(F.count(F.lit(1))).collect()

    def cond_agg(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (d:D)-[:HAS]->(c) "
            "RETURN d.docnbr AS docnbr, "
            "sum(CASE WHEN toInteger(c.content) >= 500 THEN 1 ELSE 0 "
            "END) AS hi, count(*) AS n")
        return df.agg(F.count(F.lit(1)), F.sum("hi"),
                      F.sum("n")).collect()

    def concat_size(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (d:D)-[:HAS]->(c) "
            "RETURN d.docnbr + ':' + c.name AS label, "
            "size(c.name) AS ln")
        return df.agg(F.count(F.lit(1)), F.sum("ln"),
                      F.sum(F.length("label"))).collect()

    def size_collect(nodes, edges):
        df = match_pattern(
            nodes, edges,
            "MATCH (d:D)-[:HAS]->(c) "
            "RETURN d.docnbr AS docnbr, size(collect(c.name)) AS n")
        return df.agg(F.count(F.lit(1)), F.sum("n")).collect()

    jobs = {"scan": scan_baseline, "paren_where": paren_where,
            "cond_agg": cond_agg, "concat_size": concat_size,
            "size_collect": size_collect}
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
