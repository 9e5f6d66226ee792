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

``--tz`` additionally pins the driver session's time zone (the harness may
run in any zone; load_table must pin UTC at the seam regardless).

Exit code 0 iff every query is green. One summary line per query.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tz", default=None, help="pin a non-UTC driver session zone")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

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
