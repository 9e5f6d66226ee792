"""sf0.1 → sf1 scaling spot-check for the iterative family (r08 verdict #7).

SCALE.md §8 proved flat-to-scan 100× scaling for the sketch/scoring
families, but the graph loops were only ever measured at sf0.1 — where
the Spark job count, not the data, dominates each round. This probe pins
the per-round scaling constant the 100× extrapolations rest on: build a
**10× replica proxy** of sf0.1 (there is no driver-generated sf1), run
the four loop-heavy operators the verdict names plus a pure-scan
baseline at both scales, and report the runtime ratios.

Proxy construction (honest about what it measures): each table is 10
key-shifted copies of sf0.1 — offsets divisible by every modulus the
synthetic substrates key on (25/10/7/5), so each replica carries the
same chain/clique graph structure and the union is 10 disjoint copies
(no cross-replica edges: adjacency is key+1, replicas are 2.1e9 apart).
``documents.text`` gets a per-replica letter bijection (translate) so
shingle sets are disjoint across replicas and the near-dup workload
scales 10×, not quadratically (identical clones would pair across all
10 replicas). This measures DATA-VOLUME scaling of the loop machinery
— shuffles, checkpoints, per-round aggregations — not TPC-H
distributional shift, which the proxy deliberately holds fixed.

Both scales are written through the SAME writer (sf0.1-proxy = 1
replica) so file layout and row-group splits are comparable; ratios are
proxy-vs-proxy, never proxy-vs-driver-file.

Usage:  python scripts/sf_scale_probe.py [--runs 3] [--keep]
Writes one JSON line per query to stdout and a summary table at the end
(paste target: SCALE.md §8 r09 block).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import statistics
import string
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
WORK = pathlib.Path("/tmp/sfscale")
# divisible by 25, 10, 7, 5, 4, 3 — every modulus the synthetic
# substrates key on stays aligned within each replica
OFFSET = 2_100_000_000
N_REP = 10

QUERIES = [
    # (name, module, fn) — the four loop-heavy targets + scan baseline
    ("q01_pricing_summary", "relational", "q01_pricing_summary"),
    ("dedup_prefix_filter", "dedup", "q_dedup_prefix_filter"),
    ("graph_cc_incremental", "graphq", "q_graph_cc_incremental"),
    ("graph_densest_subgraph", "graphq", "q_graph_densest_subgraph"),
    ("graph_modularity", "graphq", "q_graph_modularity"),
    # r10 verdict #7: the two previously-unmeasured heavy rows. The
    # lineitem proxy offsets l_partkey/l_suppkey too, so each replica is
    # a DISJOINT copy of the part–supplier bipartite graph (shared part
    # keys would collapse under the .distinct() and measure only scan
    # scaling). Source density: (key + rep·OFFSET) % 397 picks a
    # different-but-equal-density residue slice per replica.
    ("graph_betweenness_sampled", "graphq", "q_graph_betweenness_sampled"),
    ("stream_topk_continuous", "streamq", "q_stream_topk_continuous"),
]


def _rot_map(i: int) -> tuple[str, str]:
    """Per-replica letter bijection: rotate the alphabet by 2i+1 (identity
    for replica 0 keeps the 1-replica proxy faithful to sf0.1)."""
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    r = (2 * i + 1) % 26 if i else 0
    return lo + up, lo[r:] + lo[:r] + up[r:] + up[:r]


def build_proxy(spark, out_dir: pathlib.Path, n_rep: int) -> None:
    from pyspark.sql import functions as F

    from graph_database_project_spark.io import load_table

    out_dir.mkdir(parents=True, exist_ok=True)
    cust = load_table(spark, SRC, "customer")
    docs = load_table(spark, SRC, "documents")
    li = load_table(spark, SRC, "lineitem")

    def reps(df):
        return df.crossJoin(
            spark.range(n_rep).select(F.col("id").alias("_rep")))

    (reps(cust)
     .withColumn("c_custkey", F.col("c_custkey") + F.col("_rep") * OFFSET)
     .drop("_rep").repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "customer.parquet")))

    rot = None
    for i in range(n_rep):
        src_a, dst_a = _rot_map(i)
        branch = F.translate(F.col("text"), src_a, dst_a)
        rot = branch if rot is None else F.when(F.col("_rep") == F.lit(i),
                                                branch).otherwise(rot)
    (reps(docs)
     .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * OFFSET)
     .withColumn("text", rot)
     .drop("_rep").repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "documents.parquet")))

    (reps(li)
     .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_rep") * OFFSET)
     # part/supp keys offset too (r10): the betweenness bipartite graph
     # must be 10 disjoint copies, not one graph scanned 10 times
     .withColumn("l_partkey",
                 F.col("l_partkey").cast("long") + F.col("_rep") * OFFSET)
     .withColumn("l_suppkey",
                 F.col("l_suppkey").cast("long") + F.col("_rep") * OFFSET)
     .drop("_rep").repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "lineitem.parquet")))

    ev = load_table(spark, SRC, "events")
    # user/event ids offset (OFFSET is divisible by TOPK_NSLICES=4, so
    # slice membership is replica-aligned); ts carries through unchanged
    # so the day-keyed state stays |days|-sized while per-day data 10x-es
    (reps(ev)
     .withColumn("event_id", F.col("event_id") + F.col("_rep") * OFFSET)
     .withColumn("user_id", F.col("user_id") + F.col("_rep") * OFFSET)
     .drop("_rep").repartition(32)
     .write.mode("overwrite").parquet(str(out_dir / "events.parquet")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--keep", action="store_true",
                    help="keep the proxy dirs for reuse")
    args = ap.parse_args()

    from graph_database_project_spark.session import get_spark
    spark = get_spark("sf-scale-probe")

    dirs = {}
    for label, n in (("sf0.1proxy", 1), ("sf1proxy", N_REP)):
        d = WORK / label
        if not (d / "customer.parquet").exists():
            t0 = time.monotonic()
            build_proxy(spark, d, n)
            print(f"# built {label} in {time.monotonic() - t0:.1f}s",
                  flush=True)
        dirs[label] = str(d)

    import importlib
    results: dict[str, dict[str, float]] = {}
    for name, mod_name, fn_name in QUERIES:
        mod = importlib.import_module(
            f"graph_database_project_spark.operators.{mod_name}")
        fn = getattr(mod, fn_name)
        results[name] = {}
        for label, d in dirs.items():
            times = []
            for _ in range(args.runs):
                t0 = time.monotonic()
                n = fn(spark, d).count()
                times.append(time.monotonic() - t0)
            med = statistics.median(times)
            results[name][label] = med
            print(json.dumps({"query": name, "sf": label, "rows": n,
                              "median_sec": round(med, 3),
                              "runs": [round(t, 3) for t in times]}),
                  flush=True)

    base = results["q01_pricing_summary"]
    scan_ratio = base["sf1proxy"] / base["sf0.1proxy"]
    print(f"\n# scan baseline ratio (q01): {scan_ratio:.2f}x for 10x data")
    print(f"# {'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s} vs-scan")
    for name in results:
        r = results[name]
        ratio = r["sf1proxy"] / r["sf0.1proxy"]
        print(f"# {name:28s} {r['sf0.1proxy']:8.2f} {r['sf1proxy']:8.2f} "
              f"{ratio:7.2f} {ratio / scan_ratio:6.2f}")

    spark.stop()
    if not args.keep:
        shutil.rmtree(WORK, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
