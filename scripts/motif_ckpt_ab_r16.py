#!/usr/bin/env python
"""r16 A/B: var-length motif materialization strategy (VERDICT r15 #2).

Arms (graph/motif._CKPT_MODE):
  eager — r15 shape: localCheckpoint(eager=True) per hop (extra serial
          Spark jobs at construction, O(k) plan)
  lazy  — localCheckpoint(eager=False): same O(k) sharing, RDD computes
          inside the first consuming job (zero extra jobs)
  none  — r14 control: per-reference plan re-expansion (O(k^2) joins)

Bench methodology: noop sink, construction INSIDE the timed region
(bench.py times from before fn()), arms interleaved per repetition so
host drift hits all arms alike. Job/stage/task counts from the
AppStatusStore ride along (load-independent evidence). Results FLUSH
per measurement to --out (never parse stdout — Spark progress bars glue
lines).

Usage: python scripts/motif_ckpt_ab_r16.py [--reps 5] [--out FILE]
"""
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
QUERIES = ["graph_motif_varlength", "graph_motif_shortestpath"]
ARMS = ["eager", "lazy", "none"]


def snapshot(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark.sparkContext._jvm
    empty = jvm.java.util.ArrayList()
    jdouble = spark.sparkContext._gateway.new_array(jvm.double, 0)
    njobs = store.jobsList(None).size()
    stages = store.stageList(empty, False, False, jdouble,
                             jvm.java.util.ArrayList())
    tasks = 0
    it = stages.iterator()
    while it.hasNext():
        st = it.next()
        tasks += st.numCompleteTasks() + st.numFailedTasks()
    return njobs, stages.size(), tasks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/motif_ckpt_ab_r16.json")
    args = ap.parse_args()

    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.registry import all_queries
    from graph_database_project_spark.graph import motif
    import bench

    spark = get_spark("motif-ckpt-ab-r16")
    qs = all_queries()

    res: dict = {"sf_dir": SF_DIR, "reps": args.reps,
                 "sentinel_before": bench.machine_sentinel(),
                 "walls": {}, "work": {}}

    def flush():
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)

    # warm: build the memoized store + codegen for every arm once
    for arm in ARMS:
        motif._CKPT_MODE = arm
        for q in QUERIES:
            qs[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for rep in range(args.reps):
        for arm in ARMS:
            motif._CKPT_MODE = arm
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"ab:{arm}:{q}:{rep}")
                j0 = snapshot(spark)
                t0 = time.perf_counter()
                df = qs[q](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - t0
                j1 = snapshot(spark)
                key = f"{arm}:{q}"
                res["walls"].setdefault(key, []).append(round(wall, 3))
                res["work"][key] = {"jobs": j1[0] - j0[0],
                                    "stages": j1[1] - j0[1],
                                    "tasks": j1[2] - j0[2]}
                flush()

    res["medians"] = {k: round(statistics.median(v), 3)
                      for k, v in res["walls"].items()}
    res["sentinel_after"] = bench.machine_sentinel()
    flush()
    print("WROTE", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
