#!/usr/bin/env python
"""Capture .explain('formatted') for a set of registry queries into
plans/r16/<query>_<tag>.txt (optimization-round evidence files).

Usage: python scripts/plan_capture_r16.py <tag> [query ...]
With no query names, captures the full bench suite (HEADLINE + EXTENDED
+ CUSTOM-able registry keys) — streaming drains are skipped (their
shape is audited in tests/test_streaming.py; explain on an unstarted
readStream plan is not the executed shape).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r16"


def main() -> None:
    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.registry import all_queries
    import bench

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("plan-capture-r16")
    jvm = spark._jvm
    qs = all_queries()
    if not names:
        names = [n for n in bench.HEADLINE + bench.EXTENDED
                 if not n.startswith("stream_")]
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"skip {name}: not in registry")
            continue
        try:
            df = fn(spark, SF_DIR)
            p = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
            continue
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        import re
        n_sh = len(re.findall(r"\(\d+\) Exchange\n[^\n]*\n[^\n]*hashpartitioning", p))
        n_scan = len(re.findall(r"\(\d+\) Scan parquet", p))
        print(f"wrote {path} (shuffle_exchanges={n_sh} parquet_scans={n_scan})")
    spark.stop()


if __name__ == "__main__":
    main()
