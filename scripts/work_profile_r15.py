#!/usr/bin/env python
"""Per-query WORK profile: Spark jobs, stages, tasks, shuffle bytes and
summed executor task time for one noop-sunk execution of each named
registry query. Unlike wall-clock, job/stage/task/shuffle-byte counts are
host-load-independent, so before/after comparisons of an optimization are
meaningful on this drifty sandbox (task time still inflates under load —
treat it as secondary).

Usage: python scripts/work_profile_r15.py out.json [query ...]
Default query set = bench HEADLINE + EXTENDED (streaming rows included —
their drain executes real jobs).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def snapshot(spark):
    """(#jobs, #stages, #tasks, shuffle_read_b, shuffle_write_b, task_ms)
    from the AppStatusStore, cumulative since session start."""
    jvm = spark.sparkContext._jvm
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    jobs = store.jobsList(None)
    njobs = jobs.size()
    jdouble = spark.sparkContext._gateway.new_array(jvm.double, 0)
    stages = store.stageList(empty, False, False, jdouble,
                             jvm.java.util.ArrayList())
    nstages = stages.size()
    tasks = 0
    sr = sw = tms = 0
    it = stages.iterator()
    while it.hasNext():
        st = it.next()
        tasks += st.numCompleteTasks() + st.numFailedTasks()
        sr += st.shuffleReadBytes()
        sw += st.shuffleWriteBytes()
        tms += st.executorRunTime()
    return njobs, nstages, tasks, sr, sw, tms


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.registry import all_queries
    import bench

    spark = get_spark("work-profile-r15")
    qs = all_queries()
    if not names:
        names = [n for n in bench.HEADLINE + bench.EXTENDED if n in qs]
    # warm-up (codegen + python workers + session-memoized stats/caches so
    # the profiled run measures the steady-state plan, same as the bench)
    for n in names:
        try:
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"warm {n} FAILED: {exc}")
    res = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"profile:{n}")
        before = snapshot(spark)
        t0 = time.perf_counter()
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = snapshot(spark)
        d = [a - b for a, b in zip(after, before)]
        res[n] = {"jobs": d[0], "stages": d[1], "tasks": d[2],
                  "shuffle_read_mb": round(d[3] / 1e6, 3),
                  "shuffle_write_mb": round(d[4] / 1e6, 3),
                  "task_time_s": round(d[5] / 1e3, 3),
                  "wall_s": round(wall, 3)}
        print(f"{n:34s} jobs={d[0]:<3d} stages={d[1]:<4d} tasks={d[2]:<6d} "
              f"shw={res[n]['shuffle_write_mb']:<9.3f} "
              f"ttime={res[n]['task_time_s']:<8.3f} wall={wall:.3f}",
              flush=True)
    spark.sparkContext.setJobDescription(None)
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
