#!/usr/bin/env python
"""Registry-wide physical-plan audit (r15 optimization round): for EVERY
registry key, count shuffle exchanges, broadcast joins, parquet/RDD scans,
Python-eval nodes, cartesian products, and duplicate-subtree signals
(same parquet location or same ExistingRDD output scanned repeatedly).
Streaming keys that cannot be explained lazily are skipped (their shape
is pinned in tests/test_streaming*.py).

Usage: python scripts/registry_plan_audit_r15.py out.json [sf_dir]
"""
from __future__ import annotations

import json
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def main() -> None:
    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.registry import all_queries

    spark = get_spark("registry-audit-r15")
    jvm = spark._jvm
    qs = all_queries()
    out = {}
    for name in sorted(qs):
        try:
            df = qs[name](spark, SF_DIR)
            p = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
            print(f"ERR {name}: {str(exc)[:120]}", flush=True)
            continue
        n_sh = len(re.findall(
            r"\(\d+\) Exchange\n[^\n]*\n[^\n]*hashpartitioning", p))
        n_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", p))
        n_smj = len(re.findall(r"\(\d+\) SortMergeJoin", p))
        n_py = len(re.findall(
            r"\(\d+\) (BatchEvalPython|ArrowEvalPython|MapInPandas|"
            r"MapInArrow|FlatMapGroupsInPandas)", p))
        n_cart = len(re.findall(
            r"\(\d+\) (CartesianProduct|BroadcastNestedLoopJoin)", p))
        # duplicate-scan signal: identical parquet Location lines
        locs = Counter(re.findall(r"Location: InMemoryFileIndex \[([^\]]+)", p))
        dup_parquet = {k.rsplit("/", 1)[-1]: v for k, v in locs.items() if v > 2}
        rdd_scans = len(re.findall(r"\(\d+\) Scan ExistingRDD", p))
        batch_py = len(re.findall(r"BatchEvalPython", p))
        out[name] = {
            "shuffles": n_sh, "bhj": n_bhj, "smj": n_smj, "py_nodes": n_py,
            "row_at_a_time_py": batch_py,
            "cartesian": n_cart, "rdd_scans": rdd_scans,
            "dup_parquet_scans": dup_parquet,
        }
        flags = []
        if n_cart:
            flags.append("CARTESIAN")
        if batch_py:
            flags.append("ROW_PY")
        if dup_parquet:
            flags.append(f"DUP_SCAN{dup_parquet}")
        if n_sh > 8:
            flags.append(f"SHUFFLES={n_sh}")
        print(f"{name:36s} sh={n_sh:<3d} bhj={n_bhj:<2d} smj={n_smj:<2d} "
              f"py={n_py:<2d} rdd={rdd_scans:<3d} {' '.join(flags)}",
              flush=True)
    with open(sys.argv[1], "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
