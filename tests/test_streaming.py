"""Batch/stream equivalence (SURVEY.md §5.5): the same aggregation through
readStream must equal its batch twin."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from graph_database_project_spark.io import load_table
from graph_database_project_spark.operators.streamq import (
    q_session_window, q_stream_tumbling_hourly, read_events_stream,
)

from .conftest import SF_SMOKE


def test_stream_tumbling_equals_batch(spark):
    stream_out = {
        (r.window_start): (r.n_events, r.total_value)
        for r in q_stream_tumbling_hourly(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    batch = (
        ev.groupBy(F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .select(F.date_format(F.col("h").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss").alias("ws"),
                "n", "t")
    )
    batch_out = {r.ws: (r.n, r.t) for r in batch.collect()}
    assert stream_out == batch_out


def test_stream_session_window_equals_batch(spark):
    """session_window through a genuine streaming query (update-mode memory
    sink, availableNow) vs the batch session_window query."""
    ev = read_events_stream(spark, SF_SMOKE).withColumn("ts", F.col("ts").cast("timestamp"))
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id",
                F.date_format(F.col("sw.start").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                "n_events")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    stream_out = {(r.user_id, r.session_start): r.n_events
                  for r in spark.table(name).collect()}
    batch_out = {(r.user_id, r.session_start): r.n_events
                 for r in q_session_window(spark, SF_SMOKE).collect()}
    # append-mode watermark may hold back the final (unclosed) session per
    # user; everything emitted must match the batch result exactly
    assert stream_out
    for k, v in stream_out.items():
        assert batch_out.get(k) == v


def test_epoch_unit_detection_all_magnitudes(spark):
    """The seam must land on the same wall-clock instant whatever unit the
    reader hands back (s/ms/µs/ns) — the r03 regression was a fixed ÷1000
    assuming nanos while the Spark 4.1 streaming reader yields micros."""
    from pyspark.sql import functions as F

    from graph_database_project_spark.io import epoch_long_to_ts_ntz

    base_s = 1_704_067_200          # 2024-01-01 00:00:00 UTC
    rows = [(base_s, "s"), (base_s * 10**3, "ms"),
            (base_s * 10**6, "us"), (base_s * 10**9, "ns"),
            (None, "null")]
    out = {
        r["unit"]: r["ts"]
        for r in spark.createDataFrame(rows, "v long, unit string")
        .select("unit", epoch_long_to_ts_ntz(F.col("v")).alias("ts")).collect()
    }
    assert str(out["s"]) == "2024-01-01 00:00:00"
    assert out["s"] == out["ms"] == out["us"] == out["ns"]
    assert out["null"] is None
    # sub-second precision survives in the µs/ns branches (floored to µs)
    fine = spark.createDataFrame(
        [(base_s * 10**9 + 123_456_789,)], "v long"
    ).select(epoch_long_to_ts_ntz(F.col("v")).alias("ts")).first()["ts"]
    assert fine.microsecond == 123_456
    # boundary exactness: double division would round ns values in the
    # last ~128 ns of a µs up across the boundary (ulp(1.7e18) = 256);
    # the decimal floor-div must truncate like DuckDB's integer ns→µs
    edge_vals = [base_s * 10**9 + 999_999_999, base_s * 10**9 + 999_999_872]
    edges_ = spark.createDataFrame([(v,) for v in edge_vals], "v long") \
        .select(epoch_long_to_ts_ntz(F.col("v")).alias("ts")).collect()
    assert all(r["ts"].microsecond == 999_999 for r in edges_)
