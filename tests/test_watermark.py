"""Watermark semantics under real multi-batch streaming (SURVEY §4.5 /
M4 'late data'): a window closed by the watermark in batch N must ignore a
late row arriving in batch N+1, and each window is emitted exactly once
(append mode). Uses a file sink — the memory sink cannot recover from a
checkpoint across restarts.
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("v", T.DoubleType()),
])

OUT_SCHEMA = T.StructType([
    T.StructField("ws", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_once(spark, src_dir, checkpoint, out_dir):
    q = (
        spark.readStream.schema(SCHEMA).parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("total"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"), "n", "total")
        .writeStream.format("json")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.schema(OUT_SCHEMA).json(out_dir).collect()
    rows = {}
    for r in out:
        assert r.ws not in rows, f"window {r.ws} emitted twice"
        rows[r.ws] = (r.n, r.total)
    return rows


def test_late_rows_dropped_after_watermark(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = lambda h, m=0: dt.datetime(2026, 1, 1, h, m)

    # batch 1: events 09:00–12:30 → max ts 12:30, watermark 11:30 →
    # windows [09:00) and [10:00) close and emit; [11:00)/[12:00) held open
    _write_batch(spark, src, [
        (t(9, 10), 1.0), (t(9, 40), 2.0),
        (t(10, 15), 4.0),
        (t(11, 5), 8.0),
        (t(12, 30), 16.0),
    ])
    out1 = _run_once(spark, src, ckpt, out)
    assert out1.get("2026-01-01 09:00:00") == (2, 3.0)
    assert out1.get("2026-01-01 10:00:00") == (1, 4.0)
    assert "2026-01-01 11:00:00" not in out1  # watermark hasn't passed its end

    # batch 2: one LATE row for the already-closed 09:00 window, one row
    # advancing the clock to 14:30 (watermark 13:30 → closes 11/12 windows)
    _write_batch(spark, src, [
        (t(9, 50), 100.0),     # late — must be dropped
        (t(14, 30), 32.0),
    ])
    out2 = _run_once(spark, src, ckpt, out)
    # exactly-once per window, and the late row did NOT fold into 09:00
    assert out2.get("2026-01-01 09:00:00") == (2, 3.0)
    assert out2.get("2026-01-01 11:00:00") == (1, 8.0)
    assert out2.get("2026-01-01 12:00:00") == (1, 16.0)
