#!/usr/bin/env python
"""r16 A/B: dedup_minhash_lsh restructure (VERDICT r15 #3).

Arms:
  old — r15 shape (inlined control): band relation derived per
        self-join side (minhash CPU x2), verify join-back broadcasts
        the full shingle relation twice
  new — the registry code: lazy-checkpointed band relation (minhash
        once), verify broadcasts the candidate side and streams the
        shingle cache

Also asserts the two arms return IDENTICAL rows (exceptAll both ways)
before timing. Interleaved reps, noop sink, construction timed.
Flushes to --out per measurement.
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


def old_minhash(spark, sf_dir):
    from pyspark.sql import functions as F
    from graph_database_project_spark.operators.dedup import (
        JACCARD_THRESHOLD_PPM, _shingle_rel, exact_jaccard_ppm,
        jaccard_companions, minhash_bands)

    sh = _shingle_rel(spark, sf_dir).filter(F.size("shingles") > 0)
    slim = minhash_bands(sh)
    a = slim.select(F.col("doc_id").alias("doc_a"), "band_idx", "bk")
    b_ = slim.select(F.col("doc_id").alias("doc_b"), "band_idx", "bk")
    cand = (
        a.join(b_, ["band_idx", "bk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"),
                     F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"),
                     F.col("shingles").alias("sh_b"))
    return (
        cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
        .withColumn("jaccard_ppm",
                    exact_jaccard_ppm(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_ppm") >= JACCARD_THRESHOLD_PPM)
        .select("doc_a", "doc_b",
                *jaccard_companions(F.col("sh_a"), F.col("sh_b")),
                "jaccard_ppm")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/dedup_minhash_ab_r16.json")
    args = ap.parse_args()

    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.operators.dedup import (
        q_dedup_minhash_lsh)
    import bench

    spark = get_spark("dedup-ab-r16")
    arms = {"old": old_minhash, "new": q_dedup_minhash_lsh}

    # equivalence gate first
    o = old_minhash(spark, SF_DIR)
    n = q_dedup_minhash_lsh(spark, SF_DIR)
    extra = n.exceptAll(o).count()
    missing = o.exceptAll(n).count()
    assert extra == 0 and missing == 0, (extra, missing)
    print("EQUIVALENT: rows identical")

    res = {"sf_dir": SF_DIR, "equivalent": True,
           "sentinel_before": bench.machine_sentinel(), "walls": {}}

    def flush():
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)

    for name, fn in arms.items():  # warm codegen per arm
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for rep in range(args.reps):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab:{name}:{rep}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            res["walls"].setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
            flush()

    res["medians"] = {k: round(statistics.median(v), 3)
                      for k, v in res["walls"].items()}
    res["sentinel_after"] = bench.machine_sentinel()
    flush()
    print("WROTE", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
