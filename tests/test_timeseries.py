"""CUSUM change-point semantics the bit-exact oracle can't see: the
closed-form behaviour on a planted level shift, and the series invariants
(S_D = 0 exactly, single flagged peak) on the real corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_ORACLE


def test_cusum_planted_level_shift_flags_the_shift_day(spark):
    # 10 days at 100 then 10 days at 200: N=3000, D=20,
    # S_k = 20*cum_k - 3000k = -1000k for k<=10 (min -10000 at k=10),
    # then 1000k - 20000 (ending at exactly 0) — peak |S| at day 10.
    from graph_database_project_spark.operators.timeseries import cusum_over_daily

    daily = spark.createDataFrame(
        [(f"2024-02-{d:02d}", 100 if d <= 10 else 200) for d in range(1, 21)],
        "day string, x_cnt long")
    rows = cusum_over_daily(daily).collect()
    assert [r.cusum for r in rows] == [
        *(-1000 * k for k in range(1, 11)),
        *(1000 * k - 20000 for k in range(11, 21))]
    flagged = [r.day for r in rows if r.is_change_point]
    assert flagged == ["2024-02-10"]


def test_cusum_series_invariants_on_corpus(spark):
    from graph_database_project_spark.operators.timeseries import (
        q_ts_cusum_changepoint)

    rows = q_ts_cusum_changepoint(spark, SF_ORACLE).collect()
    assert rows, "empty series"
    # telescoping: S_D = D*N - D*N = 0 exactly (integer algebra, no float)
    assert rows[-1].cusum == 0
    flagged = [r for r in rows if r.is_change_point]
    assert len(flagged) == 1
    amax = max(abs(r.cusum) for r in rows)
    assert abs(flagged[0].cusum) == amax
    # earliest-day tie-break
    assert flagged[0].day == min(r.day for r in rows
                                 if abs(r.cusum) == amax)
    # the series must actually vary (dead-variation guard)
    assert amax > 0


def test_cusum_recomputes_from_daily_counts(spark):
    # independent recomputation: pull the daily counts with plain Spark,
    # fold the partial sums in Python, compare
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.timeseries import (
        q_ts_cusum_changepoint)

    daily = (load_table(spark, SF_ORACLE, "events")
             .filter(F.col("ts").isNotNull())
             .groupBy(F.date_format(F.date_trunc("day", F.col("ts")),
                                    "yyyy-MM-dd").alias("day"))
             .agg(F.count(F.lit(1)).alias("x")).orderBy("day").collect())
    n_total = sum(r.x for r in daily)
    n_days = len(daily)
    cum, expect = 0, {}
    for k, r in enumerate(daily, start=1):
        cum += r.x
        expect[r.day] = n_days * cum - k * n_total
    got = {r.day: r.cusum for r in q_ts_cusum_changepoint(spark, SF_ORACLE).collect()}
    assert got == expect
