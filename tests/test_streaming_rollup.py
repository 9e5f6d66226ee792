"""Continuous-aggregate refresh (streaming/rollup.py): the materialized
rollup must equal the one-shot batch aggregate after the stream drains, and
replaying a committed microbatch must be a no-op (the counts/sums are not
naturally idempotent — the ledger makes them so)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graph_database_project_spark.io import load_table
from graph_database_project_spark.streaming.rollup import (
    merge_rollup, read_rollup, rollup_partial, stream_rollup_events)


def _canon(df):
    rows = df.select(
        "event_type",
        F.date_format("b15", "yyyy-MM-dd HH:mm:ss").alias("b15"),
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    ).collect()
    return sorted((r.event_type, r.b15, r.n_events, r.sum_value) for r in rows)


def test_stream_rollup_matches_batch_and_replay_is_noop(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")

    # a drop directory of several files → several microbatches
    events_dir = str(tmp_path / "events")
    ev.repartition(4).write.parquet(events_dir)
    rollup_path = str(tmp_path / "rollup")

    stream_rollup_events(spark, events_dir, rollup_path,
                         schema=ev.schema, max_files_per_trigger=1)

    committed = os.listdir(os.path.join(rollup_path, "_committed"))
    assert len(committed) >= 2, "expected multiple microbatches"

    got = _canon(read_rollup(spark, rollup_path))
    want = _canon(rollup_partial(spark.read.parquet(events_dir)))
    assert got == want

    # replaying an already-committed batch id must change nothing
    replay_id = int(sorted(committed)[0])
    applied = merge_rollup(spark, rollup_path,
                           spark.read.parquet(events_dir), replay_id)
    assert applied is False
    assert _canon(read_rollup(spark, rollup_path)) == want

    # a genuinely new batch still applies on top
    extra = spark.read.parquet(events_dir).limit(10)
    assert merge_rollup(spark, rollup_path, extra, 10_000) is True
    n_after = read_rollup(spark, rollup_path).agg(F.sum("n_events")).first()[0]
    n_want = spark.read.parquet(events_dir).count() + 10
    assert n_after == n_want


def test_rollup_crash_replay_is_idempotent(spark, tmp_path):
    """The delta layout's reason to exist: a batch whose partial landed
    but whose ledger marker did NOT (crash window) must fold exactly once
    after the checkpoint replay re-runs it."""
    import os

    from pyspark.sql import functions as F

    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.streaming.rollup import (
        merge_rollup, read_rollup, rollup_partial, stream_rollup_events)

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "rollup")
    ev.repartition(2).write.parquet(events_dir)
    stream_rollup_events(spark, events_dir, store,
                         schema=ev.schema, max_files_per_trigger=1)
    committed = os.listdir(os.path.join(store, "_committed"))

    crash_batch = ev.filter(F.col("event_id") % 7 == 0)
    crash_id = max(int(b) for b in committed) + 1
    # crashed attempt: partial written, no marker
    rollup_partial(crash_batch).write.mode("overwrite").parquet(
        os.path.join(store, "data", f"batch={crash_id}"))
    # replay through the normal path
    assert merge_rollup(spark, store, crash_batch, crash_id) is True

    seen = ev.unionByName(crash_batch)
    from graph_database_project_spark.operators.timeseries import _b15
    want = {tuple(r) for r in seen.groupBy("event_type", _b15().alias("b15"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value")).collect()}
    got = {tuple(r) for r in read_rollup(spark, store)
           .select("event_type", "b15", "n_events",
                   F.round("sum_value", 6).alias("sum_value")).collect()}
    assert got == want


def test_compact_rollup_preserves_values_and_bounds_deltas(spark, tmp_path):
    """compact_rollup folds N delta dirs into one base delta with the
    read-side value UNCHANGED, leaves the ledger intact (a replayed
    pre-compaction batch id must still short-circuit, or the fold
    double-counts), and new batches keep landing beside the base."""
    from graph_database_project_spark.streaming.rollup import compact_rollup

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "rollup")
    ev.repartition(4).write.parquet(events_dir)
    stream_rollup_events(spark, events_dir, store,
                         schema=ev.schema, max_files_per_trigger=1)
    want = _canon(read_rollup(spark, store))
    committed = sorted(os.listdir(os.path.join(store, "_committed")))

    stats = compact_rollup(spark, store)
    assert stats["deltas_before"] >= 2
    data = os.path.join(store, "data")
    assert sorted(d for d in os.listdir(data) if d.startswith("batch=")) \
        == ["batch=-1"]
    assert _canon(read_rollup(spark, store)) == want

    # pre-compaction batch id replay: ledger survived → still a no-op
    replay_id = int(committed[0])
    assert merge_rollup(spark, store,
                        spark.read.parquet(events_dir), replay_id) is False
    assert _canon(read_rollup(spark, store)) == want

    # new batch after compaction folds on top of the base
    extra = spark.read.parquet(events_dir).limit(10)
    assert merge_rollup(spark, store, extra, 10_000) is True
    n_after = read_rollup(spark, store).agg(F.sum("n_events")).first()[0]
    assert n_after == spark.read.parquet(events_dir).count() + 10

    # compaction is re-runnable (base-only store folds to itself)
    stats2 = compact_rollup(spark, store)
    assert stats2["deltas_after"] == 1
    assert n_after == read_rollup(spark, store).agg(F.sum("n_events")).first()[0]
