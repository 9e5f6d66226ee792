"""Scale spot-check for the r11 SCC family (r11 verdict #5: the SCC /
condensation rows "carry a stated |SCCs|-sized-loop claim but no
measured 10x row yet").

The SCC substrate keys on c_custkey with block formulas (k div 10,
b % 3, b % 7), which do NOT survive the sf-dir replica proxy — so the
probe builds the planted substrate EXPLICITLY at two sizes from
spark.range: the same within-block chain (k % 10 < 9 -> k+1), the same
closing edges (b % 3 != 0 -> 10-cycles), the same one-way bridges
(b % 7 == 0), just over N and 10N vertices. Three machineries timed
over both sizes:

* squaring labels  — the _scc_labels repeated-squaring reach relation
  (4 keyed join+distinct rounds); the quantity the 100 TB story needs
  is whether its DISTINCT pair term stays linear on this bounded-reach
  substrate (the hub boundary is the coloring sibling's job);
* coloring labels  — _scc_labels_coloring (r12): |E|-shaped floods,
  expected job-count-bound at these sizes (rounds ~ cycle diameter,
  constant across N — so its wall should grow SUBLINEARLY);
* condensation     — the full q_graph_scc_condensation composition
  (shared labeling + |SCCs|-sized 12-round max-relax).

A parquet scan-and-aggregate baseline over the same vertex relation
normalizes the window (the probe reports ratios, not absolutes).

Usage:  python scripts/sf_scale_probe_r12.py [--runs 2] [--out FILE]
Paste target: SCALE.md §8 r12 block. Run on a QUIET host (no builder
pytest / bench concurrently) — builder-concurrent probe runs spread
3-25x (CLAUDE.md). Output goes to --out (default
/tmp/sfscale_r12.json), NOT just stdout — Spark progress bars glue
stdout lines (CLAUDE.md r11 scale-probe trap).
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

N_BASE = 150_000      # matches the registered key's sf0.1 cardinality
N_BIG = 1_500_000     # 10x


def build_substrate(spark, n: int):
    """The _scc_graph formulas over spark.range(n) — explicitly, so the
    block structure is bit-identical at any size."""
    from pyspark.sql import functions as F

    r = spark.range(n).select(F.col("id").alias("v"))
    k = F.col("v")
    b = F.expr("CAST(v div 10 AS BIGINT)")
    chain = (r.filter((k % 10 < 9) & (k + 1 <= n - 1))
             .select(k.alias("src"), (k + 1).alias("dst")))
    closing = (r.filter((k % 10 == 9) & (b % 3 != 0))
               .select(k.alias("src"), (k - 9).alias("dst")))
    bridge = (r.filter((k % 10 == 9) & (b % 7 == 0) & (k + 1 <= n - 1))
              .select(k.alias("src"), (k + 1).alias("dst")))
    edges = chain.unionByName(closing).unionByName(bridge) \
        .localCheckpoint(eager=True)
    verts = r.localCheckpoint(eager=True)
    return verts, edges


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--big-runs", type=int, default=1,
                    help="reps at 10x (each rep is minutes)")
    ap.add_argument("--out", default="/tmp/sfscale_r12.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graph_database_project_spark.operators.graphq import (
        SCC_LEVEL_ROUNDS, _scc_labels, _scc_labels_coloring)
    from graph_database_project_spark.session import get_spark

    spark = get_spark("sf-scale-probe-r12")

    def scan_baseline(verts, edges):
        edges.agg(F.sum("src"), F.count("*")).collect()
        verts.agg(F.sum("v")).collect()

    def squaring(verts, edges):
        lab = _scc_labels(verts, edges)
        return (lab.groupBy("scc").count()
                .groupBy("count").count().collect())

    def coloring(verts, edges):
        lab = _scc_labels_coloring(verts, edges)
        return (lab.groupBy("scc").count()
                .groupBy("count").count().collect())

    def condensation(verts, edges):
        # the q_graph_scc_condensation composition over the prebuilt
        # substrate (same code shape; substrate injected)
        lab = _scc_labels(verts, edges).localCheckpoint(eager=True)
        sizes = lab.groupBy("scc").agg(F.count(F.lit(1)).alias("n_nodes"))
        lsrc = lab.select(F.col("a").alias("src"),
                          F.col("scc").alias("c_src"))
        ldst = lab.select(F.col("a").alias("dst"),
                          F.col("scc").alias("c_dst"))
        ce = (edges.join(lsrc, "src").join(ldst, "dst")
              .filter(F.col("c_src") != F.col("c_dst"))
              .select(F.col("c_src").alias("src"),
                      F.col("c_dst").alias("dst"))
              .distinct().localCheckpoint(eager=True))
        lv = sizes.select("scc", F.lit(0).cast("long").alias("lv")) \
            .localCheckpoint(eager=True)
        for _ in range(SCC_LEVEL_ROUNDS):
            inc = (ce.join(lv.withColumnRenamed("scc", "src"), "src")
                   .groupBy(F.col("dst").alias("scc"))
                   .agg((F.max("lv") + 1).alias("mx")))
            lv = (lv.join(inc, "scc", "left")
                  .select("scc",
                          F.greatest("lv", F.coalesce("mx", F.lit(0)))
                          .cast("long").alias("lv"))
                  .localCheckpoint(eager=True))
        return (lv.join(sizes, "scc").groupBy("lv")
                .agg(F.count(F.lit(1)), F.sum("n_nodes")).collect())

    jobs = {"scan": scan_baseline, "scc_squaring": squaring,
            "scc_coloring": coloring, "scc_condensation": condensation}
    results: dict[str, dict] = {}

    def flush():
        # incremental: a killed run still leaves every finished
        # measurement on disk (the first r12 attempt died at the 10x
        # squaring with nothing written)
        with open(args.out, "w") as fh:
            json.dump({"n_base": N_BASE, "n_big": N_BIG,
                       "runs": args.runs, "big_runs": args.big_runs,
                       "results": results}, fh, indent=1)

    for label, n, reps in (("1x", N_BASE, args.runs),
                           ("10x", N_BIG, args.big_runs)):
        verts, edges = build_substrate(spark, n)
        for name, fn in jobs.items():
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(verts, edges)
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
