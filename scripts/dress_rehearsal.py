#!/usr/bin/env python
"""Driver-environment dress rehearsal.

Reproduces the external harness's exact conditions — a VANILLA
SparkSession (none of session.get_spark()'s confs, so every seam fix in
io.load_table has to do its job) — and runs EVERY ``queries()`` entry
against its ``oracle_sql()`` at sf0.01, comparing row count, column names,
and order-insensitive values (floats rounded to 1e-6, same normalization
as tests/oracle.py). Rows-only queries are executed and counted.

Usage::

    python scripts/dress_rehearsal.py [--tz America/New_York]
    python scripts/dress_rehearsal.py --debt   # verification-debt report only

``--tz`` additionally pins the driver session's time zone (the harness may
run in any zone; load_table must pin UTC at the seam regardless).

``--debt`` skips execution and diffs the registry against the union of
every ``CORRECTNESS_r*.json`` the driver has recorded, so the keys the
driver has NEVER value-checked (local-parity-only) are visible per round —
the rotation policy's work queue (VERDICT r05 #4/#7).

Exit code 0 iff every query is green. One summary line per query.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def debt_report() -> int:
    """Diff the registry against every recorded CORRECTNESS round: which
    keys has the external driver confirmed green / seen red / never seen."""
    import glob
    import json
    import re

    # registry import without Spark: parse the module's QUERIES keys via
    # the entry contract would start a session, so read the per-module
    # dicts through the registry (needs pyspark import only, no session)
    from graph_database_project_spark.registry import _DRIVER_WINDOW, all_queries

    keys = list(all_queries())
    seen: dict[str, dict[int, str]] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r0*(\d+)", path).group(1))
        for k, v in json.load(open(path)).items():
            ok = (v.get("rows_match") and v.get("schema_match")
                  and v.get("hash_match", True) and not v.get("err"))
            seen.setdefault(k, {})[rnd] = "green" if ok else "RED"
    never = [k for k in keys if k not in seen]
    red_latest = [k for k, h in seen.items() if h[max(h)] == "RED"]
    confirmed = [k for k in keys if k in seen and k not in red_latest]
    print(f"registry keys: {len(keys)}")
    print(f"driver-confirmed green (latest check): {len(confirmed)}")
    print(f"red at latest check: {len(red_latest)} {red_latest}")
    print(f"never driver-checked (local-parity-only): {len(never)}")
    in_window = [k for k in never if k in _DRIVER_WINDOW]
    print(f"  of which queued in the current window: {len(in_window)} {in_window}")
    for k in never:
        mark = " <- in window" if k in _DRIVER_WINDOW else ""
        print(f"  {k}{mark}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tz", default=None, help="pin a non-UTC driver session zone")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--debt", action="store_true",
                    help="verification-debt report (no execution)")
    args = ap.parse_args()
    if args.debt:
        return debt_report()

    from pyspark.sql import SparkSession

    b = (SparkSession.builder.master("local[32]")
         .appName("dress-rehearsal")
         .config("spark.sql.shuffle.partitions", "32"))
    if args.tz:
        b = b.config("spark.sql.session.timeZone", args.tz)
    spark = b.getOrCreate()

    import importlib

    mod = importlib.import_module("__spark_entry__")
    qs, os_ = mod.queries(), mod.oracle_sql()

    from tests.oracle import compare, duckdb_con

    con = duckdb_con(args.sf_dir)
    n_ok = n_bad = 0
    failures: list[str] = []
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            if name in os_:
                compare(fn(spark, args.sf_dir), con.execute(os_[name]).df(), name)
                kind = "oracle"
            else:
                n = fn(spark, args.sf_dir).count()
                assert n >= 0
                kind = f"rows={n}"
            n_ok += 1
            print(f"ok   {name} [{kind}] {time.perf_counter() - t0:.2f}s")
        except Exception as exc:
            n_bad += 1
            failures.append(name)
            print(f"FAIL {name}: {str(exc)[:300]}")
    print(f"\n{n_ok}/{n_ok + n_bad} green"
          + (f"; failures: {failures}" if failures else " — driver-ready"))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
