"""Streaming sketch maintenance (streaming/sketch.py): after the drain the
stored CMS/HLL must equal their one-shot batch builds, replay must be a
no-op through the ledger, AND a ledger-bypassing replay must also be a
no-op — the per-batch delta layout makes the additive CMS idempotent by
construction (a replayed batch overwrites its own delta), closing the
crash-between-merge-and-marker window the old mutable-store design had
(HLL was always safe by max-algebra)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graph_database_project_spark.io import load_table
from graph_database_project_spark.operators.profiling import (
    cms_sketch, hll_registers)
from graph_database_project_spark.streaming.sketch import (
    _write_deltas, cms_keys, hll_keys, merge_sketches, read_sketches,
    stream_sketch_events)


def _cms_rows(df):
    return sorted((r.d, r.bucket, r.c) for r in df.collect())


def _hll_rows(df):
    return sorted((r.bucket, r.reg) for r in df.collect())


def test_stream_sketches_match_batch_replay_semantics(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")

    events_dir = str(tmp_path / "events")
    ev.repartition(4).write.parquet(events_dir)
    store = str(tmp_path / "sketches")

    stream_sketch_events(spark, events_dir, store,
                         schema=ev.schema, max_files_per_trigger=1)
    committed = os.listdir(os.path.join(store, "_committed"))
    assert len(committed) >= 2, "expected multiple microbatches"

    all_events = spark.read.parquet(events_dir)
    cms, hll = read_sketches(spark, store)
    assert _cms_rows(cms) == _cms_rows(cms_sketch(cms_keys(all_events)))
    assert _hll_rows(hll) == _hll_rows(hll_registers(hll_keys(all_events)))

    # keyed day-HLL: streaming fold ≡ one-shot grouped build — each
    # batch's delta covers only its days; the max fold completes them
    from graph_database_project_spark.operators.profiling import (
        hll_registers_grouped)
    from graph_database_project_spark.streaming.sketch import (
        hll_day_keys, read_day_hll)

    got = sorted((r.day, r.bucket, r.reg)
                 for r in read_day_hll(spark, store).collect())
    want = sorted((r.day, r.bucket, r.reg)
                  for r in hll_registers_grouped(
                      hll_day_keys(all_events)).collect())
    assert got == want

    # ledger: replaying a committed batch id is refused outright
    replay_id = int(sorted(committed)[0])
    assert merge_sketches(spark, store, all_events, replay_id) is False
    cms2, hll2 = read_sketches(spark, store)
    assert _cms_rows(cms2) == _cms_rows(cms) and _hll_rows(hll2) == _hll_rows(hll)

    # crash-replay simulation — the exact window the delta layout closes:
    # a NEW batch's deltas land but the process dies BEFORE the marker
    # (old design: the additive CMS had already absorbed the batch; the
    # checkpoint replay then absorbed it AGAIN). Replay the same batch id
    # through merge_sketches and require the end state to equal
    # processing the batch exactly once — for BOTH sketches.
    crash_batch = all_events.filter(F.col("event_id") % 7 == 0)
    crash_id = max(int(b) for b in committed) + 1
    _write_deltas(spark, store, crash_batch, crash_id)  # crashed attempt
    assert merge_sketches(spark, store, crash_batch, crash_id) is True
    seen = all_events.unionByName(crash_batch)
    cms3, hll3 = read_sketches(spark, store)
    assert _cms_rows(cms3) == _cms_rows(cms_sketch(cms_keys(seen)))
    assert _hll_rows(hll3) == _hll_rows(hll_registers(hll_keys(seen)))


def test_stream_sketches_resume_across_restarts(spark, tmp_path):
    """Checkpoint continuation: drain, land NEW files, drain again with
    the SAME checkpoint — the second run must process only the new files
    (batch ids continue, no re-fold of already-committed data) and the
    stores must equal the batch build over everything seen so far."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    first = ev.filter(F.col("event_id") % 3 != 0)
    late = ev.filter(F.col("event_id") % 3 == 0)

    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "sketches")
    first.repartition(2).write.parquet(events_dir)
    stream_sketch_events(spark, events_dir, store,
                         schema=ev.schema, max_files_per_trigger=1)
    n_first = len(os.listdir(os.path.join(store, "_committed")))

    late.repartition(2).write.mode("append").parquet(events_dir)
    stream_sketch_events(spark, events_dir, store,
                         schema=ev.schema, max_files_per_trigger=1)
    n_second = len(os.listdir(os.path.join(store, "_committed")))
    assert n_second > n_first  # new batch ids continued from the checkpoint

    all_events = spark.read.parquet(events_dir)
    cms, hll = read_sketches(spark, store)
    assert _cms_rows(cms) == _cms_rows(cms_sketch(cms_keys(all_events)))
    assert _hll_rows(hll) == _hll_rows(hll_registers(hll_keys(all_events)))

    # keyed day-HLL: streaming fold ≡ one-shot grouped build — each
    # batch's delta covers only its days; the max fold completes them
    from graph_database_project_spark.operators.profiling import (
        hll_registers_grouped)
    from graph_database_project_spark.streaming.sketch import (
        hll_day_keys, read_day_hll)

    got = sorted((r.day, r.bucket, r.reg)
                 for r in read_day_hll(spark, store).collect())
    want = sorted((r.day, r.bucket, r.reg)
                  for r in hll_registers_grouped(
                      hll_day_keys(all_events)).collect())
    assert got == want


def test_stream_topk_matches_batch_twin(spark, tmp_path):
    """Continuous top-k (r09): after the drain (a) the additive cms_day
    fold equals the one-shot grouped build cell for cell, (b) the stored
    candidate ledger is exactly the union of each microbatch's per-day
    top-TOPK_CAND (batch = one input file under maxFilesPerTrigger=1),
    (c) the served report never undercounts (CMS contract) and ranks are
    dense per day, and (d) a store missing the families is refused
    loudly, then repaired by backfill_topk."""
    import glob
    import shutil

    import pytest

    from graph_database_project_spark.operators.profiling import (
        cms_sketch_grouped)
    from graph_database_project_spark.streaming.sketch import (
        _fold_cms_day, _fold_topk_cand, backfill_topk, cms_day_keys,
        read_topk, topk_candidates)

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "sk")
    ev.repartition(4).write.parquet(events_dir)
    stream_sketch_events(spark, events_dir, store,
                         schema=ev.schema, max_files_per_trigger=1)
    all_events = spark.read.parquet(events_dir)

    # (a) stream ≡ batch for the sketch: fold of per-batch deltas equals
    # the one-shot corpus build (CMS additivity, now per day)
    got = sorted(map(tuple, _fold_cms_day(
        spark.read.parquet(os.path.join(store, "cms_day"))).collect()))
    want = sorted(map(tuple, cms_sketch_grouped(
        cms_day_keys(all_events)).collect()))
    assert got == want and len(got) > 0

    # (b) stream ≡ batch for the candidate ledger: union of per-file
    # candidate sets (file = microbatch under maxFilesPerTrigger=1)
    files = glob.glob(os.path.join(events_dir, "*.parquet"))
    assert len(files) >= 2
    per_file: set = set()
    for f in files:
        per_file |= {(r.day, r.k) for r in
                     topk_candidates(spark.read.parquet(f)).collect()}
    stored = {(r.day, r.k) for r in _fold_topk_cand(
        spark.read.parquet(os.path.join(store, "topk_cand"))).collect()}
    assert stored == per_file

    # (c) serving contract: dense ranks per day, CMS never undercounts
    rep = read_topk(spark, store, k=3).collect()
    exact = {(r.day, r.k): r.n for r in cms_day_keys(all_events)
             .groupBy("day", "k").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    by_day: dict = {}
    for r in rep:
        by_day.setdefault(r.day, []).append(r.rank)
        assert r.est_n >= exact[(r.day, r.user_id)], r
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in by_day.values())
    assert any(len(v) == 3 for v in by_day.values())

    # (d) pre-upgrade store: refused loudly, repaired by backfill
    shutil.rmtree(os.path.join(store, "topk_cand"))
    with pytest.raises(FileNotFoundError, match="backfill_topk"):
        read_topk(spark, store)
    backfill_topk(spark, all_events, store)
    rep2 = read_topk(spark, store, k=3).collect()
    # post-backfill candidates are the corpus-exact per-day top set, so
    # the report is the batch-twin answer: est ranking over corpus top keys
    assert len(rep2) >= len(by_day)
    for r in rep2:
        assert r.est_n >= exact[(r.day, r.user_id)], r


def test_compact_sketches_preserves_registers_and_cells(spark, tmp_path):
    """Both sketch stores compact to a single base delta with every CMS
    cell and HLL register value-identical — the fold is the read side's
    own merge algebra, so compaction cannot drift from reads."""
    from graph_database_project_spark.streaming.sketch import compact_sketches

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "sketches")
    ev.repartition(3).write.parquet(events_dir)
    stream_sketch_events(spark, events_dir, store,
                         schema=ev.schema, max_files_per_trigger=1)
    cms0, hll0 = read_sketches(spark, store)
    want_cms = sorted(map(tuple, cms0.collect()))
    want_hll = sorted(map(tuple, hll0.collect()))

    stats = compact_sketches(spark, store)
    assert stats["cms"]["deltas_before"] >= 2
    for which in ("cms", "hll", "hll_day", "cms_day", "topk_cand"):
        dirs = [d for d in os.listdir(os.path.join(store, which))
                if d.startswith("batch=")]
        assert dirs == ["batch=-1"], (which, dirs)
    cms1, hll1 = read_sketches(spark, store)
    assert sorted(map(tuple, cms1.collect())) == want_cms
    assert sorted(map(tuple, hll1.collect())) == want_hll
    from graph_database_project_spark.streaming.sketch import read_day_hll
    assert read_day_hll(spark, store).count() > 0


def test_pre_upgrade_store_refused_then_backfilled(spark, tmp_path):
    """A store created before the day-HLL family must not silently
    undercount: read_day_hll refuses it loudly (both the missing-dir and
    the partial-coverage shapes), compact_sketches skips the absent dir
    instead of crashing, and backfill_day_hll repairs the store to the
    exact one-shot grouped build (code-review finding, r06)."""
    import shutil

    import pytest

    from graph_database_project_spark.operators.profiling import (
        hll_registers_grouped)
    from graph_database_project_spark.streaming.sketch import (
        backfill_day_hll, compact_sketches, hll_day_keys, read_day_hll)

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "sk")
    ev.repartition(2).write.parquet(events_dir)
    stream_sketch_events(spark, events_dir, store, schema=ev.schema)

    # simulate a pre-upgrade store: drop the day family entirely
    shutil.rmtree(os.path.join(store, "hll_day"))
    with pytest.raises(FileNotFoundError, match="backfill_day_hll"):
        read_day_hll(spark, store)
    stats = compact_sketches(spark, store)
    assert "skipped" in stats["hll_day"]

    # partial coverage (resumed stream wrote SOME day deltas): also refused
    os.makedirs(os.path.join(store, "hll_day"))
    one = sorted(os.listdir(os.path.join(store, "_committed")))[0]
    all_events = spark.read.parquet(events_dir)
    hll_registers_grouped(hll_day_keys(all_events.limit(50))) \
        .write.mode("overwrite") \
        .parquet(os.path.join(store, "hll_day", f"batch={one}"))
    with pytest.raises(RuntimeError, match="predates"):
        read_day_hll(spark, store)

    # compaction must refuse the SAME partial-coverage state — folding it
    # into a batch=-1 base would manufacture the base read_day_hll's
    # coverage check trusts, converting the loud refusal above into a
    # silent per-day undercount (advisor finding, r06) — and must refuse
    # BEFORE touching cms/hll, leaving the whole store as it was
    cms_dirs_before = sorted(os.listdir(os.path.join(store, "cms")))
    with pytest.raises(RuntimeError, match="refusing to compact"):
        compact_sketches(spark, store)
    assert sorted(os.listdir(os.path.join(store, "cms"))) == cms_dirs_before
    with pytest.raises(RuntimeError, match="predates"):
        read_day_hll(spark, store)  # still refused — nothing was laundered

    # backfill covers everything; the fold then equals the one-shot build
    backfill_day_hll(spark, all_events, store)
    got = sorted(map(tuple, read_day_hll(spark, store).collect()))
    want = sorted(map(tuple, hll_registers_grouped(
        hll_day_keys(all_events)).collect()))
    assert got == want

    # the backfilled base (-2) satisfies coverage, so compaction proceeds
    # and the post-compaction fold still equals the one-shot build
    stats = compact_sketches(spark, store)
    assert stats["hll_day"]["deltas_after"] == 1
    got2 = sorted(map(tuple, read_day_hll(spark, store).collect()))
    assert got2 == want


def test_compact_deltas_restores_store_when_swap_fails(spark, tmp_path, monkeypatch):
    """If the second rename of the swap fails, compact_deltas must restore
    the live deltas (mirror of GraphStore.write_atomic's rollback) — a
    crash there used to leave data_dir absent and every read broken until
    manual repair (advisor finding, r06)."""
    import pytest

    from graph_database_project_spark.streaming import compaction
    from graph_database_project_spark.streaming.sketch import _fold_cms

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "sk")
    ev.repartition(2).write.parquet(events_dir)
    stream_sketch_events(spark, events_dir, store, schema=ev.schema)

    cms_dir = os.path.join(store, "cms")
    dirs_before = sorted(os.listdir(cms_dir))
    want_cms = _cms_rows(_fold_cms(spark.read.parquet(cms_dir)))

    real_rename = os.rename

    def failing_rename(src, dst):
        # fail ONLY the second swap rename (tmp -> data_dir); the recovery
        # rename (old -> data_dir) has src .compact-old and must succeed
        if dst == cms_dir and src.endswith(".compact-tmp"):
            raise OSError("injected swap failure")
        return real_rename(src, dst)

    monkeypatch.setattr(compaction.os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected swap failure"):
        compaction.compact_deltas(spark, cms_dir, _fold_cms)
    monkeypatch.undo()

    # the live deltas are back in place and reads still work
    assert sorted(os.listdir(cms_dir)) == dirs_before
    assert _cms_rows(_fold_cms(spark.read.parquet(cms_dir))) == want_cms


def test_stream_hist_matches_batch_and_backfill_replaces(spark, tmp_path):
    """r07 hist family: (a) after the drain the folded histogram equals
    the one-shot build over everything ingested (streaming ≡ batch under
    the additive fold); (b) a pre-hist store is refused loudly in both
    the missing-dir and partial-coverage shapes — and compaction refuses
    the partial shape too; (c) backfill_hist REPLACES the delta dir, so
    surviving partial deltas cannot double-count under sum."""
    import shutil

    import pytest

    from graph_database_project_spark.streaming.sketch import (
        backfill_hist, compact_sketches, hist_bins, read_hist)

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "sk")
    ev.repartition(3).write.parquet(events_dir)
    stream_sketch_events(spark, events_dir, store, schema=ev.schema)

    all_events = spark.read.parquet(events_dir)
    want = sorted((r.bin, r.c) for r in hist_bins(all_events).collect())

    # (a) streaming fold ≡ one-shot batch build
    got = sorted((r.bin, r.c) for r in read_hist(spark, store).collect())
    assert got == want

    # (b) pre-upgrade shapes refused
    shutil.rmtree(os.path.join(store, "hist"))
    with pytest.raises(FileNotFoundError, match="backfill_hist"):
        read_hist(spark, store)
    # partial coverage: ONE surviving batch delta, no base
    one = sorted(os.listdir(os.path.join(store, "_committed")))[0]
    partial = all_events.limit(100)
    hist_bins(partial).write.mode("overwrite").parquet(
        os.path.join(store, "hist", f"batch={one}"))
    with pytest.raises(RuntimeError, match="predates the hist"):
        read_hist(spark, store)
    with pytest.raises(RuntimeError, match="refusing to compact"):
        compact_sketches(spark, store)

    # (c) backfill REPLACES: the partial delta must not double-count
    backfill_hist(spark, all_events, store)
    got2 = sorted((r.bin, r.c) for r in read_hist(spark, store).collect())
    assert got2 == want
    dirs = [d for d in os.listdir(os.path.join(store, "hist"))
            if d.startswith("batch=")]
    assert dirs == ["batch=-2"]  # the partial per-batch delta is gone

    # compaction now proceeds and preserves every bin count
    stats = compact_sketches(spark, store)
    assert stats["hist"]["deltas_after"] == 1
    got3 = sorted((r.bin, r.c) for r in read_hist(spark, store).collect())
    assert got3 == want


def test_base_coverage_is_recorded_not_inferred(spark, tmp_path):
    """r07 verdict #4 / advisor's sturdier design: a base delta's coverage
    must come from its RECORDED ``_covers.json`` manifest, not from the
    mere presence of a base. (a) compaction records exactly the folded
    ids and reads keep working after per-batch dirs are gone; (b) a base
    whose manifest omits a committed id — the manufactured-base laundering
    shape — is refused loudly, where presence inference would accept it;
    (c) a backfill base records the full committed set; (d) a legacy base
    without a manifest still gets the documented presence-inference
    compat."""
    import json
    import shutil

    import pytest

    from graph_database_project_spark.streaming.compaction import (
        COVERS_FILE, read_covers)
    from graph_database_project_spark.streaming.sketch import (
        _missing_batches, backfill_hist, compact_sketches, hist_bins,
        read_hist)

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "sk")
    ev.repartition(3).write.parquet(events_dir)
    stream_sketch_events(spark, events_dir, store, schema=ev.schema)
    committed = sorted(int(b) for b in
                       os.listdir(os.path.join(store, "_committed")))
    assert len(committed) >= 2
    all_events = spark.read.parquet(events_dir)
    want = sorted((r.bin, r.c) for r in hist_bins(all_events).collect())

    # (a) compaction records the exact folded set; reads stay green on it
    compact_sketches(spark, store)
    m = read_covers(os.path.join(store, "hist", "batch=-1"))
    assert m is not None and not m["legacy_full"]
    assert sorted(m["covers"]) == committed
    assert _missing_batches(store, "hist") == []
    assert sorted((r.bin, r.c) for r in read_hist(spark, store).collect()) \
        == want

    # (b) shrink the manifest to omit one committed id — presence
    # inference would return []; the recorded check must name the gap
    victim = committed[0]
    mpath = os.path.join(store, "hist", "batch=-1", COVERS_FILE)
    with open(mpath, "w") as f:
        json.dump({"covers": [b for b in committed if b != victim],
                   "legacy_full": False}, f)
    assert _missing_batches(store, "hist") == [str(victim)]
    with pytest.raises(RuntimeError, match="predates the hist"):
        read_hist(spark, store)
    with pytest.raises(RuntimeError, match="refusing to compact"):
        compact_sketches(spark, store)

    # (c) backfill repairs and records the full committed set
    shutil.rmtree(os.path.join(store, "hist"))
    backfill_hist(spark, all_events, store)
    m2 = read_covers(os.path.join(store, "hist", "batch=-2"))
    assert m2 is not None and sorted(m2["covers"]) == committed
    assert _missing_batches(store, "hist") == []
    assert sorted((r.bin, r.c) for r in read_hist(spark, store).collect()) \
        == want

    # re-compaction folds the backfill base and CARRIES its recorded set
    compact_sketches(spark, store)
    m3 = read_covers(os.path.join(store, "hist", "batch=-1"))
    assert m3 is not None and not m3["legacy_full"]
    assert sorted(m3["covers"]) == committed

    # (d) legacy compat: a manifest-less base falls back to presence
    # inference (already-deployed stores keep reading)
    os.remove(os.path.join(store, "hist", "batch=-1", COVERS_FILE))
    assert _missing_batches(store, "hist") == []
    assert sorted((r.bin, r.c) for r in read_hist(spark, store).collect()) \
        == want


def test_manifest_deletion_beside_manifested_base_is_not_legacy(spark, tmp_path):
    """r08 advisor: the legacy presence-inference fallback applies only
    when NO base in the family carries a manifest. With two bases where
    one records a gap, deleting the OTHER base's ``_covers.json`` must
    not launder the gap into full coverage — the manifest-less base
    simply contributes no coverage claim."""
    import json
    import shutil

    from graph_database_project_spark.streaming.compaction import COVERS_FILE
    from graph_database_project_spark.streaming.sketch import (
        _missing_batches, compact_sketches)

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "sk")
    ev.repartition(3).write.parquet(events_dir)
    stream_sketch_events(spark, events_dir, store, schema=ev.schema)
    committed = sorted(int(b) for b in
                       os.listdir(os.path.join(store, "_committed")))
    assert len(committed) >= 2
    compact_sketches(spark, store)

    # craft the two-base state: batch=-1 (compaction base) + batch=-2
    # (backfill-slot base, here a copy), then record a GAP on -1 and
    # delete -2's manifest entirely
    victim = committed[0]
    hist = os.path.join(store, "hist")
    shutil.copytree(os.path.join(hist, "batch=-1"),
                    os.path.join(hist, "batch=-2"))
    with open(os.path.join(hist, "batch=-1", COVERS_FILE), "w") as f:
        json.dump({"covers": [b for b in committed if b != victim],
                   "legacy_full": False}, f)
    os.remove(os.path.join(hist, "batch=-2", COVERS_FILE))

    # the pre-fix code returned [] here (manifest-less -2 → legacy
    # inference), silently accepting the gap -1's manifest records
    assert _missing_batches(store, "hist") == [str(victim)]
