"""Null-robustness of the mergeable-partials contract: the synthetic corpus
carries no NULL ts/value, so without these planted-null cases the
null-safety in rollup_partials/finish_partials and the incremental split
would be dead variation (the class of latent divergence the r05 review
found: bare `ts < wm` routes NULL-ts rows to NEITHER slice, and count(*)
denominators diverge from SQL's null-aware avg/stddev)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from graph_database_project_spark.operators.timeseries import (
    finish_partials, merge_partials, rollup_partials)


def _frame(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 30)
    rows = [
        ("a", t0, 1.0),
        ("a", t0, 3.0),
        ("a", t0, None),                       # NULL value, counted in n only
        ("a", None, 5.0),                      # NULL ts -> NULL-hour bucket
        ("b", t0, 2.0),
        ("b", None, None),
    ]
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, value double")


def test_finish_partials_matches_sql_semantics_with_nulls(spark):
    ev = _frame(spark)
    got = {(r["event_type"], r["bucket_start"]): r
           for r in finish_partials(rollup_partials(ev)).collect()}
    want = {(r["event_type"], r["bucket_start"]): r
            for r in ev.groupBy(
                "event_type",
                F.date_format(F.date_trunc("hour", "ts"),
                              "yyyy-MM-dd HH:mm:ss").alias("bucket_start"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"),
                 F.round(F.avg("value"), 6).alias("avg_value"),
                 F.round(F.min("value"), 6).alias("min_value"),
                 F.round(F.max("value"), 6).alias("max_value"),
                 F.round(F.stddev_samp("value"), 4).alias("stddev_value"))
            .collect()}
    assert set(got) == set(want)
    for k in want:
        for c in ["n_events", "sum_value", "avg_value", "min_value",
                  "max_value", "stddev_value"]:
            assert got[k][c] == want[k][c], (k, c, got[k][c], want[k][c])


def test_incremental_split_loses_no_null_ts_rows(spark):
    """Split at a watermark, merge the slices back: the result must equal
    the one-shot build — including the NULL-hour bucket (a bare `ts < wm`
    predicate silently drops NULL-ts rows from both slices)."""
    ev = _frame(spark)
    wm = F.lit(datetime.datetime(2024, 1, 1, 0, 0))
    stored = rollup_partials(ev.filter(F.coalesce(F.col("ts") < wm, F.lit(False))))
    delta = rollup_partials(ev.filter(F.coalesce(F.col("ts") >= wm, F.lit(True))))
    merged = {tuple(r) for r in finish_partials(merge_partials(stored, delta)).collect()}
    oneshot = {tuple(r) for r in finish_partials(rollup_partials(ev)).collect()}
    assert merged == oneshot
    # and the NULL-hour bucket is present, not dropped
    assert any(r[1] is None for r in oneshot)


def test_scd2_pit_join_preserves_every_fact_exactly_once(spark):
    """Temporal-correctness contract of the point-in-time join: SCD2
    validity intervals partition the version axis per key, so every fact
    matches EXACTLY one dimension row — no drops (a gap) and no
    duplicates (an overlap). The rollup's fact count must equal the raw
    fact count."""
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.mutation import scd2_pit_join

    from .conftest import SF_SMOKE

    rows = scd2_pit_join(spark, SF_SMOKE).collect()
    total = sum(r["n_facts"] for r in rows)
    assert total == load_table(spark, SF_SMOKE, "lineitem").count()
