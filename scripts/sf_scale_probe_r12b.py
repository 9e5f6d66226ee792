"""Scale spot-check for the r12 random-walk family (SCALE.md §8
discipline: every new heavy family needs a MEASURED 10x row, not an
argued one).

The walk substrate keys on customer c_custkey (chain u→u+1, doubling,
halving, every 97th node a dead end; one walk per key % 50 == 0) — the
formulas survive spark.range replication directly, so the probe builds
the identical substrate at N and 10N and times:

* walk_trail    — the shipped L=8 frontier loop (`_walk_trail_over`,
  the exact registry code path: per round one keyed equi-join + a
  per-walk row_number window + localCheckpoint) + the walk-summary
  aggregate. Expectation: per-round frontier is |walks|-sized, so wall
  grows ~linearly in walks with a constant job-count floor (the
  documented job-count-is-the-loop-cost regime at small N).
* skipgram_pairs — the trail self-join on walk (≤L+1 rows per key) +
  positive/negative audit aggregates. Expectation: |pairs| =
  |walks|·O(L·window) — linear.

A scan-and-aggregate baseline over the same edge relation normalizes
the window (ratios, not absolutes).

Usage:  python scripts/sf_scale_probe_r12b.py [--runs 2] [--out FILE]
Paste target: SCALE.md §8 r12 block. Run on a QUIET host (no builder
pytest / bench concurrently). Results FLUSH incrementally to --out
(default /tmp/sfscale_r12b.json) — Spark progress bars glue stdout
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

N_BASE = 150_000      # 10x the sf0.1 customer cardinality (15k) — the
N_BIG = 1_500_000     # registered key's substrate is tiny; probe bigger


def build_substrate(spark, n: int):
    """The _walk_graph formulas over spark.range(1, n+1) — explicitly,
    so the substrate is bit-identical in structure at any size."""
    from pyspark.sql import functions as F

    from graph_database_project_spark.operators.graphq import (
        WALK_DEADEND_MOD, WALK_SEED_MOD)

    r = spark.range(1, n + 1).select(F.col("id").alias("v"))
    k = F.col("v")
    base = r.filter(k % WALK_DEADEND_MOD != 0)
    chain = (base.filter(k + 1 <= n)
             .select(k.alias("src"), (k + 1).alias("dst")))
    dbl = (base.filter(k * 2 <= n)
           .select(k.alias("src"), (k * 2).alias("dst")))
    half = (base.filter(k >= 2)
            .select(k.alias("src"), F.expr("v div 2").alias("dst")))
    edges = (chain.unionByName(dbl).unionByName(half).distinct()
             .localCheckpoint(eager=True))
    seeds = (r.filter(k % WALK_SEED_MOD == 0)
             .select(k.alias("walk"), k.alias("cur"))
             .localCheckpoint(eager=True))
    return edges, seeds, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--big-runs", type=int, default=1)
    ap.add_argument("--out", default="/tmp/sfscale_r12b.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graph_database_project_spark.operators.graphq import (
        _NEG_HASH, _PAIR_KEY, WALK_WINDOW, _n2v_trail_over,
        _walk_trail_over)
    from graph_database_project_spark.session import get_spark

    spark = get_spark("sf-scale-probe-r12b")

    def scan_baseline(edges, seeds, n):
        edges.agg(F.sum("src"), F.count("*")).collect()
        seeds.agg(F.sum("walk")).collect()

    def walk_trail(edges, seeds, n):
        trail = _walk_trail_over(edges, seeds)
        return (trail.groupBy("walk")
                .agg(F.max("step").alias("n_steps"),
                     F.max_by("node", "step").alias("end_node"),
                     F.sum((F.col("step") + 1) * F.col("node"))
                     .alias("path_checksum"))
                .agg(F.count(F.lit(1)), F.sum("path_checksum")).collect())

    def skipgram_pairs(edges, seeds, n):
        trail = _walk_trail_over(edges, seeds)
        t1 = trail.select("walk", F.col("step").alias("s1"),
                          F.col("node").alias("center"))
        t2 = trail.select("walk", F.col("step").alias("s2"),
                          F.col("node").alias("context"))
        dist = F.abs(F.col("s2") - F.col("s1"))
        pairs = (t1.join(t2, "walk")
                 .filter((dist >= 1) & (dist <= WALK_WINDOW))
                 .select("center", "context",
                         dist.cast("long").alias("dist"))
                 .localCheckpoint(eager=True))
        pos = pairs.groupBy("dist").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct(F.col("center") * F.lit(_PAIR_KEY)
                            + F.col("context")).alias("n_distinct"),
            F.sum(F.col("center") + 131 * F.col("context"))
            .alias("checksum"))
        negs = pairs.withColumn(
            "nmax", F.lit(n).cast("long")).withColumn(
            "neg", F.expr(_NEG_HASH) % F.col("nmax") + 1)
        neg = negs.agg(F.count(F.lit(1)),
                       F.sum(F.col("center") + 131 * F.col("neg")))
        return pos.collect(), neg.collect()

    def node2vec_trail(edges, seeds, n):
        s2 = seeds.select("walk", F.lit(-1).cast("long").alias("prev"),
                          "cur")
        trail = _n2v_trail_over(edges, s2)
        return (trail.groupBy("walk")
                .agg(F.max("step"), F.sum((F.col("step") + 1)
                                          * F.col("node")))
                .agg(F.count(F.lit(1))).collect())

    jobs = {"scan": scan_baseline, "walk_trail": walk_trail,
            "skipgram_pairs": skipgram_pairs,
            "node2vec_trail": node2vec_trail}
    results: dict[str, dict] = {}

    def flush():
        with open(args.out, "w") as fh:
            json.dump({"n_base": N_BASE, "n_big": N_BIG,
                       "runs": args.runs, "big_runs": args.big_runs,
                       "results": results}, fh, indent=1)

    for label, n, reps in (("1x", N_BASE, args.runs),
                           ("10x", N_BIG, args.big_runs)):
        edges, seeds, nn = build_substrate(spark, n)
        for name, fn in jobs.items():
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(edges, seeds, nn)
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
