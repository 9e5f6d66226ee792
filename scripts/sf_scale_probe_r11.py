"""Scale spot-check for the r10/r11 motif family + incremental PageRank
(r10 verdict #5: "the 18-exchange varlength expansion is the one plan
whose scale term is still argued, not measured").

The motif keys run on the STATIC XML corpus (691 nodes), so the sf-dir
replica proxy used by sf_scale_probe.py cannot scale them — instead the
GRAPH itself is replicated: R disjoint id-offset copies of the ingested
bulletin graph, written through the same writer at R=10 and R=100, and
the SAME match_motif spec as q_graph_motif_varlength runs over both.
Replicas are disjoint (ids OFFSET apart), so the *1..3 reachability
pair sets grow linearly with R by construction and the measured ratio
isolates the expansion machinery (8 joins + distincts) — the quantity
the 100 TB story needs.

Incremental PageRank keys on c_custkey with src → src div 2, which does
NOT survive the key-offset replica proxy (an offset key's parent lands
between replicas: odd-replica nodes would all dangle and change the
algorithm's semantics, not just its scale). The probe instead builds
the replicated funnel EXPLICITLY — per-replica node index i with id =
rep·OFFSET + i, parent rep·OFFSET + i div 2, leaf-half shortcut delta —
and runs the same two-phase warm-start composition (graph.traverse
.pagerank base 10 rounds → init_ranks → 4 correction rounds) the
registered query runs. Honest about what it measures: data-volume
scaling of the loop machinery, identical structure per replica.

Usage:  python scripts/sf_scale_probe_r11.py [--runs 3] [--keep]
Paste target: SCALE.md §8 r11 block. Run on a QUIET host (no builder
pytest / bench concurrently) — builder-concurrent probe runs spread
3-25x (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import statistics
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORK = pathlib.Path("/tmp/sfscale_r11")
OFFSET = 2_100_000_000
N_CUST = 150_000          # sf0.1 customer cardinality
MOTIF_BASE_REPS = 10      # "1x" scale for the motif ratio
MOTIF_BIG_REPS = 100      # 10x that
PR_BASE_REPS = 1
PR_BIG_REPS = 10


def build_motif_proxy(spark, out_dir: pathlib.Path, n_rep: int) -> None:
    """R disjoint id-offset copies of the ingested bulletin graph."""
    from pyspark.sql import functions as F

    from graph_database_project_spark.operators.xmlq import _store

    st = _store(spark)
    out_dir.mkdir(parents=True, exist_ok=True)

    def reps(df):
        return df.crossJoin(
            spark.range(n_rep).select(F.col("id").alias("_rep")))

    (reps(st.nodes)
     .withColumn("id", F.col("id") + F.col("_rep") * OFFSET)
     # docnbr made replica-unique so the final groupBy stays 3R-sized
     .withColumn("docnbr", F.when(F.col("docnbr").isNotNull(),
                                  F.concat_ws("#", "docnbr",
                                              F.col("_rep").cast("string"))))
     .drop("_rep").repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "nodes.parquet")))
    (reps(st.edges.select("src", "dst", "rel_type"))
     .withColumn("src", F.col("src") + F.col("_rep") * OFFSET)
     .withColumn("dst", F.col("dst") + F.col("_rep") * OFFSET)
     .drop("_rep").repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "edges.parquet")))


def run_motif_varlength(spark, d: str) -> int:
    """The q_graph_motif_varlength spec verbatim, over the replicated
    graph (same label_counts broadcast decision — ServiceBulletin stays
    catalog-bounded at 3R)."""
    from pyspark.sql import functions as F

    from graph_database_project_spark.graph.motif import (
        EdgePat, NodePat, match_motif)

    nodes = spark.read.parquet(f"{d}/nodes.parquet")
    edges = spark.read.parquet(f"{d}/edges.parquet")
    n_sb = nodes.filter(
        F.array_contains("labels", "ServiceBulletin")).count()
    m = match_motif(
        nodes, edges,
        [NodePat("sb", label="ServiceBulletin"), NodePat("x")],
        [EdgePat("sb", "x", None, min_hops=1, max_hops=3)],
        where=F.col("x_id") != F.col("sb_id"),
        label_counts={"ServiceBulletin": n_sb},
    )
    return (m.groupBy("sb_docnbr")
            .agg(F.count(F.lit(1)).alias("n_reachable")).count())


def build_pr_proxy(spark, out_dir: pathlib.Path, n_rep: int) -> None:
    """R disjoint funnels: per-replica index i, id = rep·OFFSET + i."""
    from pyspark.sql import functions as F

    out_dir.mkdir(parents=True, exist_ok=True)
    base = (spark.range(N_CUST).select(F.col("id").alias("i"))
            .crossJoin(spark.range(n_rep).select(F.col("id").alias("_rep"))))
    nmax = N_CUST - 1
    (base.select((F.col("_rep") * OFFSET + F.col("i")).alias("node"))
     .repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "verts.parquet")))
    funnel = base.filter(F.col("i") != 0).select(
        (F.col("_rep") * OFFSET + F.col("i")).alias("src"),
        (F.col("_rep") * OFFSET + F.expr("CAST(i div 2 AS BIGINT)"))
        .alias("dst"))
    shortcut = (base.filter((F.col("i") % 11 == 0) & (F.col("i") * 2 > nmax))
                .select((F.col("_rep") * OFFSET + F.col("i")).alias("src"),
                        (F.col("_rep") * OFFSET + (F.lit(nmax)
                         - F.expr("CAST(i div 4 AS BIGINT)"))).alias("dst"))
                .filter(F.col("src") != F.col("dst")))
    (funnel.repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "base_e.parquet")))
    (funnel.unionByName(shortcut).repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "full_e.parquet")))


def run_pr_incremental(spark, d: str) -> int:
    from graph_database_project_spark.graph.traverse import pagerank

    verts = spark.read.parquet(f"{d}/verts.parquet")
    base_e = spark.read.parquet(f"{d}/base_e.parquet")
    full_e = spark.read.parquet(f"{d}/full_e.parquet")
    stored = pagerank(verts, base_e, n_iter=10)
    return pagerank(verts, full_e, n_iter=4, init_ranks=stored).count()


def run_scan_baseline(spark, d: str) -> int:
    """Group-count over the big relation of the pair — the data-volume
    reference the ratios are read against."""
    from pyspark.sql import functions as F
    f = f"{d}/edges.parquet" if pathlib.Path(
        d, "edges.parquet").exists() else f"{d}/full_e.parquet"
    df = spark.read.parquet(f)
    key = "rel_type" if "rel_type" in df.columns else (df.src % 1000)
    return df.groupBy(key).count().count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from graph_database_project_spark.session import get_spark
    spark = get_spark("sf-scale-probe-r11")

    pairs = {
        "motif_varlength": (build_motif_proxy, run_motif_varlength,
                            MOTIF_BASE_REPS, MOTIF_BIG_REPS),
        "pagerank_incremental": (build_pr_proxy, run_pr_incremental,
                                 PR_BASE_REPS, PR_BIG_REPS),
    }
    results: dict[str, dict[str, float]] = {}
    for name, (build, run, base_r, big_r) in pairs.items():
        results[name] = {}
        results[f"{name}_scan"] = {}
        for label, n_rep in (("1x", base_r), ("10x", big_r)):
            d = WORK / f"{name}_{label}"
            if not any(d.glob("*.parquet")):
                t0 = time.monotonic()
                build(spark, d, n_rep)
                print(f"# built {name} {label} ({n_rep} reps) in "
                      f"{time.monotonic() - t0:.1f}s", flush=True)
            times, scan_times = [], []
            for _ in range(args.runs):
                t0 = time.monotonic()
                rows = run(spark, str(d))
                times.append(time.monotonic() - t0)
                t0 = time.monotonic()
                run_scan_baseline(spark, str(d))
                scan_times.append(time.monotonic() - t0)
            med = statistics.median(times)
            results[name][label] = med
            results[f"{name}_scan"][label] = statistics.median(scan_times)
            print(json.dumps({"query": name, "scale": label, "rows": rows,
                              "median_sec": round(med, 3),
                              "scan_median_sec":
                              round(results[f"{name}_scan"][label], 3),
                              "runs": [round(t, 3) for t in times]}),
                  flush=True)

    print(f"\n# {'target':24s} {'1x':>8s} {'10x':>8s} {'ratio':>7s}")
    for name in results:
        r = results[name]
        print(f"# {name:24s} {r['1x']:8.2f} {r['10x']:8.2f} "
              f"{r['10x'] / r['1x']:7.2f}")

    spark.stop()
    if not args.keep:
        shutil.rmtree(WORK, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
