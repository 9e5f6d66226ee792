#!/usr/bin/env python
"""r16 A/B: Louvain sweep fusion (VERDICT r15 #4). Arms: old (r15 shape
inlined — per-sweep labels⋈deg joins + row_number window) vs new (the
registry code — deg carried in the loop state, min_by argmax).
Equivalence-gated (exceptAll both ways), interleaved reps, noop sink,
per-arm job/task deltas. Flushes to --out."""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import statistics
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_louvain(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W
    from graph_database_project_spark.operators.graphq import (
        LOUVAIN_SWEEPS, _lpa_graph, modularity_score)

    vertices, edges = _lpa_graph(spark, sf_dir)
    und = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    deg = (und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
           .select(F.col("src").alias("node"), "deg")
           .localCheckpoint(eager=True))
    upairs = deg.agg(F.sum("deg").cast("long").alias("u")) \
        .localCheckpoint(eager=True)
    labels = vertices.select("node", F.col("node").alias("community")) \
        .localCheckpoint(eager=True)
    for s in range(1, LOUVAIN_SWEEPS + 1):
        ldst = labels.select(F.col("node").alias("dst"),
                             F.col("community").alias("cn"))
        k_ic = (und.join(ldst, "dst")
                .groupBy(F.col("src").alias("node"),
                         F.col("cn").alias("cand"))
                .agg(F.count(F.lit(1)).alias("k")))
        sigma = (labels.join(deg, "node")
                 .groupBy(F.col("community").alias("cand"))
                 .agg(F.sum("deg").cast("long").alias("tot")))
        stay = labels.select("node", F.col("community").alias("cand"),
                             F.lit(0).cast("long").alias("k"))
        cand = (k_ic.unionByName(stay)
                .groupBy("node", "cand").agg(F.max("k").alias("k")))
        cur = labels.select("node", F.col("community").alias("c_cur"))
        adj_tot = (F.col("tot")
                   - F.when(F.col("cand") == F.col("c_cur"),
                            F.col("deg")).otherwise(F.lit(0)))
        pick = (cand.join(sigma, "cand")
                .join(deg, "node").join(cur, "node")
                .crossJoin(F.broadcast(upairs))
                .withColumn("score",
                            F.col("u") * F.col("k") - F.col("deg") * adj_tot)
                .withColumn("rn", F.row_number().over(
                    W.partitionBy("node")
                    .orderBy(F.desc("score"), F.asc("cand"))))
                .filter(F.col("rn") == 1)
                .select("node", F.col("cand").alias("new_c")))
        active = ((F.col("node") + F.lit(s)) % 2 == 0)
        labels = (labels.join(pick, "node", "left")
                  .select("node",
                          F.when(active & F.col("new_c").isNotNull(),
                                 F.col("new_c"))
                          .otherwise(F.col("community")).alias("community"))
                  .localCheckpoint(eager=True))
    checksum = labels.agg(
        F.sum((F.col("node") * F.col("community")) % F.lit(1000003))
        .cast("long").alias("labels_checksum"))
    return (modularity_score(labels, edges, und=und)
            .crossJoin(F.broadcast(checksum)))


def snapshot(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark.sparkContext._jvm
    empty = jvm.java.util.ArrayList()
    jdouble = spark.sparkContext._gateway.new_array(jvm.double, 0)
    njobs = store.jobsList(None).size()
    stages = store.stageList(empty, False, False, jdouble,
                             jvm.java.util.ArrayList())
    tms = 0
    it = stages.iterator()
    while it.hasNext():
        tms += it.next().executorRunTime()
    return njobs, tms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/louvain_ab_r16.json")
    args = ap.parse_args()

    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.operators.graphq import q_graph_louvain
    import bench

    spark = get_spark("louvain-ab-r16")
    arms = {"old": old_louvain, "new": q_graph_louvain}

    o = old_louvain(spark, SF_DIR)
    n = q_graph_louvain(spark, SF_DIR)
    assert n.exceptAll(o).count() == 0 and o.exceptAll(n).count() == 0
    print("EQUIVALENT: rows identical")

    res = {"sf_dir": SF_DIR, "equivalent": True,
           "sentinel_before": bench.machine_sentinel(),
           "walls": {}, "work": {}}

    def flush():
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)

    for rep in range(args.reps):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab:{name}:{rep}")
            j0 = snapshot(spark)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            j1 = snapshot(spark)
            res["walls"].setdefault(name, []).append(round(wall, 3))
            res["work"][name] = {"jobs": j1[0] - j0[0],
                                 "task_time_s": round((j1[1] - j0[1]) / 1e3, 3)}
            flush()

    res["medians"] = {k: round(statistics.median(v), 3)
                      for k, v in res["walls"].items()}
    res["mins"] = {k: min(v) for k, v in res["walls"].items()}
    res["sentinel_after"] = bench.machine_sentinel()
    flush()
    print("WROTE", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
