#!/usr/bin/env python
"""Dump the formatted plan of ONE Louvain sweep's state-update frame —
old (r15) vs new (r16 fused) shape — to plans/r16/louvain_sweep2_*.txt.

SWEEP 2, not sweep 1: the registered query's final explain only shows
the post-checkpoint scoring tail (the sweep bodies execute at
construction), and sweep 1 is unrepresentative — its state checkpoint
derives from a bare vertices projection whose small size estimate lets
Catalyst broadcast the label side, while every later sweep's state is
join-derived (inflated estimate → SortMergeJoin), which is also the
only scale-correct shape (labels are |V|-sized; the r05 hint-audit rule
forbids broadcasting an sf-growing side). Sweep 2 is the steady state
the loop actually runs."""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r16"


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W
    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.operators.graphq import _lpa_graph

    spark = get_spark("louvain-sweep2-plan-r16")
    jvm = spark._jvm
    vertices, edges = _lpa_graph(spark, SF_DIR)
    und = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    deg = (und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
           .select(F.col("src").alias("node"), "deg")
           .localCheckpoint(eager=True))
    upairs = deg.agg(F.sum("deg").cast("long").alias("u")) \
        .localCheckpoint(eager=True)

    def dump(df, name):
        p = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT, name), "w") as f:
            f.write(p)
        print(name,
              "Exchange=", len(re.findall(r"\(\d+\) Exchange\b", p)),
              "SMJ=", len(re.findall(r"\(\d+\) SortMergeJoin", p)),
              "Window=", len(re.findall(r"\(\d+\) Window\b", p)))

    def old_sweep(labels, s):
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
        adj = (F.col("tot") - F.when(F.col("cand") == F.col("c_cur"),
                                     F.col("deg")).otherwise(F.lit(0)))
        pick = (cand.join(sigma, "cand").join(deg, "node").join(cur, "node")
                .crossJoin(F.broadcast(upairs))
                .withColumn("score",
                            F.col("u") * F.col("k") - F.col("deg") * adj)
                .withColumn("rn", F.row_number().over(
                    W.partitionBy("node")
                    .orderBy(F.desc("score"), F.asc("cand"))))
                .filter(F.col("rn") == 1)
                .select("node", F.col("cand").alias("new_c")))
        act = ((F.col("node") + F.lit(s)) % 2 == 0)
        return (labels.join(pick, "node", "left")
                .select("node",
                        F.when(act & F.col("new_c").isNotNull(),
                               F.col("new_c"))
                        .otherwise(F.col("community")).alias("community")))

    def new_sweep(labels, s):
        ldst = labels.select(F.col("node").alias("dst"),
                             F.col("community").alias("cn"))
        k_ic = (und.join(ldst, "dst")
                .groupBy(F.col("src").alias("node"),
                         F.col("cn").alias("cand"))
                .agg(F.count(F.lit(1)).alias("k")))
        sigma = (labels.groupBy(F.col("community").alias("cand"))
                 .agg(F.sum("deg").cast("long").alias("tot")))
        stay = labels.select("node", F.col("community").alias("cand"),
                             F.lit(0).cast("long").alias("k"))
        cand = (k_ic.unionByName(stay)
                .groupBy("node", "cand").agg(F.max("k").alias("k")))
        state = labels.select("node", F.col("community").alias("c_cur"),
                              "deg")
        adj = (F.col("tot") - F.when(F.col("cand") == F.col("c_cur"),
                                     F.col("deg")).otherwise(F.lit(0)))
        pick = (cand.join(sigma, "cand").join(state, "node")
                .crossJoin(F.broadcast(upairs))
                .withColumn("score",
                            F.col("u") * F.col("k") - F.col("deg") * adj)
                .groupBy("node")
                .agg(F.min_by("cand",
                              F.struct((-F.col("score")).alias("ns"),
                                       F.col("cand"))).alias("new_c")))
        act = ((F.col("node") + F.lit(s)) % 2 == 0)
        return (labels.join(pick, "node", "left")
                .select("node",
                        F.when(act & F.col("new_c").isNotNull(),
                               F.col("new_c"))
                        .otherwise(F.col("community")).alias("community"),
                        "deg"))

    lo = vertices.select("node", F.col("node").alias("community")) \
        .localCheckpoint(eager=True)
    lo = old_sweep(lo, 1).localCheckpoint(eager=True)
    dump(old_sweep(lo, 2), "louvain_sweep2_before.txt")

    ln = (vertices.join(deg, "node", "left")
          .select("node", F.col("node").alias("community"),
                  F.coalesce(F.col("deg"), F.lit(0).cast("long"))
                  .alias("deg"))
          .localCheckpoint(eager=True))
    ln = new_sweep(ln, 1).localCheckpoint(eager=True)
    dump(new_sweep(ln, 2), "louvain_sweep2_after.txt")
    spark.stop()


if __name__ == "__main__":
    main()
