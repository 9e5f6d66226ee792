"""Shape-preservation contract of ts_lttb_downsample: endpoints survive,
every bucket keeps exactly one of ITS OWN points, and the kept middle
points are the per-bucket triangle-area maximizers (spike retention — the
property that makes LTTB a better plot reduction than bucket averages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_project_spark.io import load_table
from graph_database_project_spark.operators.timeseries import (
    LTTB_BUCKET_MS, q_ts_lttb_downsample)

from .conftest import SF_ORACLE


def test_lttb_keeps_endpoints_and_one_point_per_bucket(spark):
    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type", "event_id", "ts", "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("x"),
    ).withColumn("b", F.expr(f"x div {LTTB_BUCKET_MS}")).cache()
    down = q_ts_lttb_downsample(spark, SF_ORACLE).cache()

    # exactly one representative per non-empty (type, bucket)
    n_buckets = ev.select("event_type", "b").distinct().count()
    assert down.count() == n_buckets
    assert down.groupBy("event_type", "bucket_start").count() \
        .filter(F.col("count") > 1).isEmpty()

    # the representative comes from its own bucket (event_id membership)
    joined = down.join(
        ev.select("event_type", "event_id", F.col("b").alias("src_b")),
        ["event_type", "event_id"])
    assert joined.count() == n_buckets

    # endpoint retention: each series' global first and last raw points
    # appear in the downsampled output
    firsts = (ev.groupBy("event_type")
              .agg(F.min(F.struct("x", "event_id")).alias("f"))
              .select("event_type", F.col("f.event_id").alias("event_id")))
    lasts = (ev.groupBy("event_type")
             .agg(F.max(F.struct("x", "event_id")).alias("f"))
             .select("event_type", F.col("f.event_id").alias("event_id")))
    kept = down.select("event_type", "event_id")
    assert firsts.join(kept, ["event_type", "event_id"]).count() == firsts.count()
    assert lasts.join(kept, ["event_type", "event_id"]).count() == lasts.count()
    ev.unpersist(); down.unpersist()


def test_lttb_area_formula_closed_form(spark):
    """The area metric must BE the triangle area — the r06 first draft
    shipped |(ax-cx)(y-ay) - (ax-x)(ay-cy)| (second factor sign-flipped),
    which both engines mirrored, so only a closed-form check catches it.
    Anchors A=(0,0), C=(2,2): P1=(1,10) has true 2-area 18, P2=(1,-10)
    has 22 — the selector must prefer P2 (the wrong formula prefers P1)."""
    from graph_database_project_spark.operators.timeseries import _lttb_area2

    row = (spark.createDataFrame(
        [(0.0, 0.0, 2.0, 2.0, 1.0, 10.0), (0.0, 0.0, 2.0, 2.0, 1.0, -10.0)],
        "ax double, ay double, cx double, cy double, x double, y double")
        .select(_lttb_area2(F.col("ax"), F.col("ay"), F.col("cx"),
                            F.col("cy"), F.col("x"), F.col("y")).alias("a2"))
        .collect())
    assert [r.a2 for r in row] == [18.0, 22.0]
    # translation invariance in y (the flipped formula breaks this)
    shifted = (spark.createDataFrame(
        [(0.0, 5.0, 2.0, 7.0, 1.0, 15.0), (0.0, 5.0, 2.0, 7.0, 1.0, -5.0)],
        "ax double, ay double, cx double, cy double, x double, y double")
        .select(_lttb_area2(F.col("ax"), F.col("ay"), F.col("cx"),
                            F.col("cy"), F.col("x"), F.col("y")).alias("a2"))
        .collect())
    assert [r.a2 for r in shifted] == [18.0, 22.0]


def test_chunk_windows_cover_every_token_with_stride_overlap(spark):
    """Chunking contract: chunk 0 starts at token 0; consecutive starts
    step by CHUNK_STRIDE; the last chunk reaches the final token; every
    chunk except the last is exactly CHUNK_TOKENS long."""
    from graph_database_project_spark.operators.textops import (
        CHUNK_STRIDE, CHUNK_TOKENS, q_text_chunk_windows, _words)

    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", F.size(_words(F.col("text"))).alias("n")).filter("n > 0")
    ch = q_text_chunk_windows(spark, SF_ORACLE)
    agg = (ch.groupBy("doc_id").agg(
        F.min("start_token").alias("first_start"),
        F.max(F.col("start_token") + F.col("chunk_tokens")).alias("covered"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("chunk_tokens") != CHUNK_TOKENS).cast("long")).alias("n_short"))
        .join(docs, "doc_id"))
    bad = agg.filter(
        (F.col("first_start") != 0)
        | (F.col("covered") != F.col("n"))
        | (F.col("n_short") > 1)
        | (F.col("n_chunks") !=
           F.expr(f"(greatest(n - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE} - 1) "
                  f"div {CHUNK_STRIDE} + 1")))
    assert bad.isEmpty(), bad.limit(5).collect()
