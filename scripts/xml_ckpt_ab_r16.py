#!/usr/bin/env python
"""r16 A/B: build_graph pc/fan materialization — eager (r15, two serial
jobs at construction) vs lazy (r16, computed inside the consuming action
where the DAG scheduler overlaps the two independent subtrees). Drives
bench.py's _xml_ingest_e2e callable (shred cache defeated per run).
The arm is forced by monkeypatching DataFrame.localCheckpoint's default
inside the ingest call. Interleaved reps; flushes to --out."""
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--out", default="/tmp/xml_ckpt_ab_r16.json")
    args = ap.parse_args()

    from pyspark.sql import DataFrame
    from graph_database_project_spark.session import get_spark
    import bench

    spark = get_spark("xml-ab-r16")
    orig = DataFrame.localCheckpoint

    def run(arm: str) -> float:
        def forced(self, eager=True):
            return orig(self, eager=(arm == "eager"))
        DataFrame.localCheckpoint = forced
        try:
            spark.sparkContext.setJobDescription(f"ab:{arm}")
            t0 = time.perf_counter()
            df = bench._xml_ingest_e2e(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        finally:
            DataFrame.localCheckpoint = orig

    # row-identity gate: same node/edge multiset both arms
    a = None
    for arm in ("eager", "lazy"):
        df = None
        def build():
            return bench._xml_ingest_e2e(spark, SF_DIR)
        def forced(self, eager=True):
            return orig(self, eager=(arm == "eager"))
        DataFrame.localCheckpoint = forced
        try:
            from pyspark.sql import functions as F
            df = build()
            # MAP columns reject set ops — stringify props for the gate
            df = df.withColumn("props", F.to_json("props"))
            if a is None:
                a = orig(df, True)
            else:
                assert df.exceptAll(a).count() == 0
                assert a.exceptAll(df).count() == 0
        finally:
            DataFrame.localCheckpoint = orig
    print("EQUIVALENT: rows identical")

    res = {"sf_dir": SF_DIR, "equivalent": True,
           "sentinel_before": bench.machine_sentinel(), "walls": {}}

    def flush():
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)

    for arm in ("eager", "lazy"):  # warm codegen
        run(arm)
    for rep in range(args.reps):
        for arm in ("eager", "lazy"):
            res["walls"].setdefault(arm, []).append(run(arm))
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
