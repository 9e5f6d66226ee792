#!/usr/bin/env python
"""Per-round benchmark harness.

Runs the headline queries from the registry at ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {"q1": sec, ...}, "sf": ...}

``value`` is the sum of per-query wall-clock seconds (the driver compares it
against BASELINE.md round over round). Each query is forced through the
``noop`` batch sink, which materializes EVERY output column JVM-side (a bare
count() would let Spark prune unused columns out of the final project and
under-time wide results). Per BASELINE.md's frozen plan ("median of 3 warm
runs"), each query is executed NUM_RUNS times and the median is recorded —
the median discards both the one-time codegen-JIT hit of the first execution
and transient machine-load spikes, so round-over-round deltas track the plan,
not the noise (single-run totals on this box vary ±15% run to run). A failed
query contributes a fixed FAIL_PENALTY to the total — breakage must read as
a regression, never as a speedup. A warm-up pass on the flagship query first
absorbs JVM classloading so even the first per-query run measures mostly the
plan.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# The headline set: the flagship pricing summary plus one representative of
# each expensive operator family (join-heavy, window, graph loop, dedup, ANN,
# text). Cheap scalar-function demos are excluded — they don't move at scale.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q07_volume_shipping",
    "q10_returned_items",
    "q13_order_distribution",
    "q18_large_volume",
    "window_topk_per_group",
    "sessionize",
    "graph_connected_components",
    "graph_khop_seeded",
    "graph_triangle_count",
    "dedup_minhash_lsh",
    "dedup_exact",
    "sim_topk_bruteforce",
    # sim_ivf_topk intentionally excluded: since r04 the k-means index is
    # session-cached (build/serve split), so its timing here would measure
    # a cache read on warm runs and index construction on the first — and
    # HEADLINE membership is frozen by BASELINE.md v2 regardless
    "udf_embedding_norm",
    "text_stats",
    "pipeline_training_data",
    "mutation_merge_upsert",
]

# Floor charged per failed/missing headline query so breakage can only make
# the round-over-round total WORSE, never better. The actual charge scales
# with the slowest successful query (100×) so the penalty dominates at any
# SF, not just sf0.1.
FAIL_PENALTY = 600.0

# BASELINE.md freezes the methodology as the median of 3 warm runs per query.
NUM_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.registry import all_queries

    spark = get_spark("bench")
    queries = all_queries()

    # Warm-up: JVM classloading + codegen on a small action, plus one tiny
    # pandas_udf call so the Python worker pool + Arrow path is live before
    # any timed query needs it (worker spin-up is startup cost, not plan
    # cost, same as the JIT).
    try:
        queries["q01_pricing_summary"](spark, sf_dir).limit(1).count()
        from pyspark.sql.functions import pandas_udf
        import pandas as _pd

        @pandas_udf("double")
        def _warm(s: _pd.Series) -> _pd.Series:
            return s * 1.0

        spark.range(32).select(_warm("id")).write.format("noop") \
            .mode("overwrite").save()
    except Exception:
        pass

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    failed: list[str] = []
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            failed.append(name)
            continue
        runs: list[float] = []
        try:
            for i in range(NUM_RUNS):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                # noop sink: full-width materialization, zero serialization
                # to Python, no files written
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            cold[name] = round(runs[0], 3)
            timings[name] = round(statistics.median(runs), 3)
        except Exception as exc:
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            failed.append(name)

    penalty = max(FAIL_PENALTY, 100.0 * max(timings.values(), default=0.0))
    for name in failed:
        timings[name] = penalty

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    import pyspark

    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # transparency vs the single-run r01 numbers: the stat used and the
        # untrimmed first-run (JIT-inclusive) timings alongside the medians
        "stat": f"median_of_{NUM_RUNS}",
        "queries_first_run": cold,
        # round-over-round comparability: the runtime that produced these
        # numbers (the r02→r03 22% shift on identical code was a PySpark
        # 3.x→4.1 runtime change, not a plan change) and the fixed warmup
        # protocol that precedes the first timed run
        "pyspark_version": pyspark.__version__,
        "python_version": sys.version.split()[0],
        "warmup": "q01_limit1_count + pandas_udf_32row_noop (JVM codegen + Arrow worker pool)",
        "sink": "noop_full_width",
        "baseline": "BASELINE.md v2 (re-pinned r04 under this exact protocol)",
    }
    if failed:
        out["failed"] = failed
    print(json.dumps(out))
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
