"""Streaming sketch maintenance: a streaming events source keeps the
count-min sketch (per-key frequency) and the HLL register table (distinct
count) fresh via ``foreachBatch`` — the streaming complement of
``operators/profiling.heavy_hitters_cms`` / ``cardinality_hll``, and the
online form of the mergeable-state contract (SCALE.md §7b): each
microbatch collapses to a constant-size partial (d×w cells / m registers)
map-side, and the store only ever touches sketch-sized relations no
matter how large the stream grows.

Contract (tests/test_streaming_sketch.py): after the stream drains, the
stored CMS equals ``cms_sketch(all keys so far)`` cell for cell and the
stored HLL equals ``hll_registers(all keys so far)`` register for
register — streaming ≡ batch.

Exactly-once comes from the STORAGE LAYOUT, not from ordering luck: each
microbatch writes its constant-size partial to its own ``batch=<id>``
delta directory with overwrite semantics, so a replayed batch (crash
after the delta write, before the ledger marker — Spark re-runs the same
batch id from its checkpoint) overwrites its own delta instead of
double-counting into a mutable store. The read side folds the deltas
(CMS: sum per cell; HLL: max per register). An earlier design merged each
batch INTO one mutable store and relied on a marker written AFTER the
merge — leaving a crash window where replay double-counted the additive
CMS; the delta layout closes it by making replay idempotent for BOTH
sketches (the HLL was always safe by max-algebra; now the CMS is safe by
construction too). The ``_committed/<id>`` ledger remains as a cheap
replay short-circuit and an audit trail, but correctness no longer
depends on it. Delta dirs accumulate one per microbatch;
``compact_sketches`` folds them into a single base delta (same fold
expression as the read side, atomic swap — see compaction.py).

r06 adds the KEYED form: per-day HLL register deltas (``hll_day``,
|days-in-batch|×m rows per batch) maintaining streaming daily-active-user
sketches — the grouped complement of ``cardinality_hll_grouped``, folded
by per-(day, bucket) max like the global table.

r07 adds the ADDITIVE-fold value histogram (``hist``, ≤ B rows per batch
on a FIXED config domain — a stream can't run the batch drift audit's
bounds pass), the store-side feed for drift_histogram_tv-style audits.
Additivity changes the repair contract: ``backfill_hist`` must REPLACE
the delta dir (an overlaid base double-counts under sum), where the
max-algebra day-HLL backfill could safely overlay.

r09 adds CONTINUOUS TOP-K (the verdict-#6 standing query): a per-day
CMS family (``cms_day``, additive) plus a bounded per-batch candidate
ledger (``topk_cand``, union fold — each batch contributes its per-day
exact top-TOPK_CAND keys). ``read_topk`` ranks the candidate union by
CMS-estimated total count, so the "top talkers per day" answer is served
from sketch-sized state at any stream size; the batch twin is
``operators/streamq.q_stream_topk_continuous`` (deterministic slices,
DuckDB-oracled) and the stream≡batch equality lives in
tests/test_streaming_sketch.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.profiling import (QH_BINS, cms_sketch, cms_sketch_grouped,
                                   hll_registers, hll_registers_grouped)

# Fixed histogram domain for the STREAMING value histogram (the batch
# drift audit discovers bounds with a corpus pass; a stream cannot — the
# domain is config, fixed a priori, and out-of-range values clamp into the
# edge bins). Feeds drift_histogram_tv-style audits over the maintained
# store without rescanning history.
STREAM_HIST_LO = 0.0
STREAM_HIST_HI = 500.0

# Continuous top-k (r09): per-batch candidate width. Each microbatch
# contributes its per-day exact top-TOPK_CAND keys to the standing
# candidate ledger; serving ranks the candidate union by CMS-estimated
# total count. Wider than the report size (3) so a key that is merely
# strong in every batch still surfaces; the documented residual miss —
# a key below rank TOPK_CAND in EVERY batch yet top-k overall — is the
# standard continuous-top-k admission trade (SpaceSaving-style ledgers
# make the same call), and narrows as TOPK_CAND grows.
TOPK_CAND = 8


def cms_keys(batch_df: DataFrame) -> DataFrame:
    """CMS key prep — mirrors q_heavy_hitters_cms."""
    return (batch_df.filter(F.col("user_id").isNotNull())
            .select(F.col("user_id").cast("long").alias("k")))


def hll_keys(batch_df: DataFrame) -> DataFrame:
    """HLL key prep (k < 2^31 domain) — mirrors q_cardinality_hll."""
    return (batch_df.filter(F.col("user_id").isNotNull())
            .select((F.col("user_id").cast("long") % 2147483648).alias("k")))


def hll_day_keys(batch_df: DataFrame) -> DataFrame:
    """Keyed-HLL prep (day, k) — mirrors q_cardinality_hll_grouped. A
    batch's day-HLL delta only covers the days the batch touched; the
    read-side max fold across deltas completes each day's registers."""
    return (batch_df.filter(F.col("user_id").isNotNull()
                            & F.col("ts").isNotNull())
            .select(F.date_format(F.date_trunc("day", F.col("ts")),
                                  "yyyy-MM-dd").alias("day"),
                    (F.col("user_id").cast("long") % 2147483648).alias("k")))


def cms_day_keys(batch_df: DataFrame) -> DataFrame:
    """Keyed-CMS prep (day, k) — the per-day frequency domain. Mirrors
    q_heavy_hitters_cms_grouped's key prep so the streaming fold is
    cell-for-cell comparable to the batch build."""
    return (batch_df.filter(F.col("user_id").isNotNull()
                            & F.col("ts").isNotNull())
            .select(F.date_format(F.date_trunc("day", F.col("ts")),
                                  "yyyy-MM-dd").alias("day"),
                    F.col("user_id").cast("long").alias("k")))


def topk_candidates(batch_df: DataFrame) -> DataFrame:
    """One microbatch's (day, k) candidate rows: the batch's exact per-day
    top-TOPK_CAND keys by count. Bounded delta (≤ days-in-batch ×
    TOPK_CAND rows); the ledger folds by set union, so replay overlap is
    harmless by algebra (same safety class as the max-fold HLL)."""
    from pyspark.sql.window import Window as W

    cnt = cms_day_keys(batch_df).groupBy("day", "k").agg(
        F.count(F.lit(1)).alias("n"))
    return (cnt.withColumn("rn", F.row_number().over(
        W.partitionBy("day").orderBy(F.desc("n"), F.asc("k"))))
        .filter(F.col("rn") <= TOPK_CAND)
        .select("day", "k"))


def hist_bins(batch_df: DataFrame) -> DataFrame:
    """(bin, c) value-histogram partial for one batch on the FIXED
    [STREAM_HIST_LO, STREAM_HIST_HI) domain — ≤ QH_BINS rows, map-side
    combined. Out-of-range values clamp into the edge bins so the fold
    never loses rows (count conservation is what the drift audit needs)."""
    w = (STREAM_HIST_HI - STREAM_HIST_LO) / QH_BINS
    return (batch_df.filter(F.col("value").isNotNull())
            .select(F.least(F.greatest(
                F.floor((F.col("value") - STREAM_HIST_LO) / w), F.lit(0)),
                F.lit(QH_BINS - 1)).cast("int").alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias("c")))


def _delta_dir(store_path: str, which: str, batch_id: int) -> str:
    # Hive-style partition naming: spark.read.parquet(<store>/<which>)
    # discovers every delta and exposes batch as a column the fold drops
    return os.path.join(store_path, which, f"batch={batch_id}")


def _write_deltas(spark: SparkSession, store_path: str,
                  batch_df: DataFrame, batch_id: int) -> None:
    """Write one microbatch's constant-size partials to the batch's own
    delta dirs. mode=overwrite scopes to THIS delta dir, so a replayed
    batch id replaces its previous (possibly partial) write — idempotent
    regardless of how many times Spark re-runs the batch."""
    cms_sketch(cms_keys(batch_df)).write.mode("overwrite") \
        .parquet(_delta_dir(store_path, "cms", batch_id))
    hll_registers(hll_keys(batch_df)).write.mode("overwrite") \
        .parquet(_delta_dir(store_path, "hll", batch_id))
    hll_registers_grouped(hll_day_keys(batch_df), group="day") \
        .write.mode("overwrite") \
        .parquet(_delta_dir(store_path, "hll_day", batch_id))
    hist_bins(batch_df).write.mode("overwrite") \
        .parquet(_delta_dir(store_path, "hist", batch_id))
    cms_sketch_grouped(cms_day_keys(batch_df), group="day") \
        .write.mode("overwrite") \
        .parquet(_delta_dir(store_path, "cms_day", batch_id))
    topk_candidates(batch_df).write.mode("overwrite") \
        .parquet(_delta_dir(store_path, "topk_cand", batch_id))


def merge_sketches(spark: SparkSession, store_path: str,
                   batch_df: DataFrame, batch_id: int) -> bool:
    """Fold one microbatch into the sketch store. Returns False when the
    batch id is already committed (ledger short-circuit — replay would be
    harmless anyway thanks to the delta layout, just wasted work)."""
    marker = os.path.join(store_path, "_committed", str(batch_id))
    if os.path.exists(marker):
        return False
    _write_deltas(spark, store_path, batch_df, batch_id)
    os.makedirs(marker, exist_ok=True)
    return True


def stream_sketch_events(spark: SparkSession, events_dir: str,
                         store_path: str, schema,
                         checkpoint_dir: str | None = None,
                         max_files_per_trigger: int = 1):
    """availableNow drain of ``events_dir``, folding every microbatch into
    the sketch store. Returns the finished StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(store_path, "_checkpoint")
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(events_dir))
    q = (src.writeStream
         .foreachBatch(lambda df, bid: merge_sketches(spark, store_path, df, bid))
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def _fold_cms(deltas: DataFrame) -> DataFrame:
    """CMS merge algebra: cells add. Shared by read and compaction."""
    return deltas.groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def _fold_hll(deltas: DataFrame) -> DataFrame:
    """HLL merge algebra: registers max. Shared by read and compaction."""
    return deltas.groupBy("bucket").agg(F.max("reg").alias("reg"))


def _fold_hll_day(deltas: DataFrame) -> DataFrame:
    """Keyed-HLL merge algebra: per-(day, bucket) max."""
    return deltas.groupBy("day", "bucket").agg(F.max("reg").alias("reg"))


def _missing_batches(store_path: str, which: str) -> list[str]:
    """Committed batch ids with no ``which`` delta and no base RECORDING
    coverage of them — the partially-covered state a pre-upgrade store
    lands in after resuming under newer code (deltas of a LATER-ADDED
    family exist only for post-upgrade batches). Shared by the family's
    read path (refuse to read) and ``compact_sketches`` (refuse to
    compact: folding a partial family into a ``batch=-1`` base would
    MANUFACTURE the base the read-side check trusts, laundering the
    undercount into a silently accepted store — the r06 advisor finding,
    generalized when the additive ``hist`` family joined ``hll_day`` in
    this class).

    Coverage is a RECORDED fact (r08, the advisor's sturdier design):
    every base written by compaction/backfill carries a ``_covers.json``
    manifest naming exactly the batch ids it folded, and this check
    unions those manifests with the per-batch deltas present. Base
    *presence* no longer implies full coverage — a base whose manifest
    omits a committed id leaves that id missing, loudly. Only a LEGACY
    base (written before manifests existed, or transitively folded from
    one) falls back to the old presence inference, documented compat for
    already-deployed stores — and (r08 advisor) that fallback applies
    only when NO base in the family carries a manifest: once any base
    records coverage, a sibling base missing its manifest contributes no
    coverage, so deleting a single ``_covers.json`` can never silently
    reopen the manufactured-base laundering path the manifests closed."""
    from .compaction import BASE_BATCH_ID, read_covers

    d = os.path.join(store_path, which)
    committed = os.path.join(store_path, "_committed")
    if not (os.path.isdir(d) and os.path.isdir(committed)):
        return []
    have = {e[len("batch="):] for e in os.listdir(d)
            if e.startswith("batch=")}
    covered = {b for b in have if not b.startswith("-")}
    bases = [b for b in (str(BASE_BATCH_ID), str(BASE_BATCH_ID - 1))
             if b in have]
    manifests = {b: read_covers(os.path.join(d, f"batch={b}")) for b in bases}
    has_any_manifest = any(m is not None for m in manifests.values())
    for b, m in manifests.items():
        if m is None:
            if not has_any_manifest:
                return []  # ALL bases legacy: pre-manifest inference
            continue  # manifest-less base beside a manifested one: no claim
        if m["legacy_full"]:
            return []  # recorded legacy lineage: presence inference
        covered |= {str(x) for x in m["covers"]}
    return [b for b in os.listdir(committed) if b not in covered]


def _fold_cms_day(deltas: DataFrame) -> DataFrame:
    """Keyed-CMS merge algebra: per-(day, d, bucket) cells ADD — the
    grouped twin of ``_fold_cms``; additivity means fold-of-slices equals
    the one-shot corpus build cell for cell."""
    return deltas.groupBy("day", "d", "bucket").agg(F.sum("c").alias("c"))


def _fold_topk_cand(deltas: DataFrame) -> DataFrame:
    """Candidate-ledger merge algebra: set UNION of (day, k) rows.
    Idempotent under overlap, so replay/backfill overlays are harmless."""
    return deltas.select("day", "k").dropDuplicates(["day", "k"])


# delta families added AFTER the original cms/hll pair — each needs the
# pre-upgrade coverage guard on read and before compaction
_GUARDED_FAMILIES = ("hll_day", "hist", "cms_day", "topk_cand")


def _committed_ids(store_path: str) -> set[int]:
    """Batch ids in the ledger — what a full-corpus backfill base covers."""
    committed = os.path.join(store_path, "_committed")
    if not os.path.isdir(committed):
        return set()
    return {int(b) for b in os.listdir(committed)}


def read_day_hll(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold the per-batch keyed-HLL deltas into the current per-day
    register tables — same max algebra, one more key column.

    A store populated BEFORE the day-HLL family existed has no
    ``hll_day/`` dir — and worse, once the stream resumes under the new
    code it gains day deltas for NEW batches only, silently undercounting
    every day covered solely by pre-upgrade batches. Refuse both states
    loudly instead of returning a wrong DAU table; ``backfill_day_hll``
    repairs them in one batch pass."""
    d = os.path.join(store_path, "hll_day")
    missing = _missing_batches(store_path, "hll_day")
    if missing:
        raise RuntimeError(
            f"sketch store {store_path!r} has committed batches with no "
            f"day-HLL delta ({sorted(missing)[:5]}…) — it predates the "
            "keyed day-HLL family; run backfill_day_hll before reading "
            "or the per-day counts silently omit those batches")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"no day-HLL deltas under {store_path!r} — the store predates "
            "the keyed day-HLL family; run backfill_day_hll(spark, "
            "events_df, store_path) to build them from the full corpus")
    return _fold_hll_day(spark.read.parquet(d))


def backfill_day_hll(spark: SparkSession, events_df: DataFrame,
                     store_path: str) -> None:
    """One-shot repair for stores that predate the day-HLL family: build
    the per-day register tables from the FULL corpus the store has
    ingested and write them as a ``batch=-2`` base delta (distinct from
    compaction's -1 so a later compaction folds both). Max-algebra makes
    overlap with any post-upgrade per-batch deltas harmless. The base
    records every batch id committed at backfill time in its coverage
    manifest (it is built from the FULL ingested corpus, so that claim
    is exact by construction)."""
    from .compaction import BASE_BATCH_ID, write_covers

    base = _delta_dir(store_path, "hll_day", BASE_BATCH_ID - 1)
    hll_registers_grouped(hll_day_keys(events_df), group="day") \
        .write.mode("overwrite").parquet(base)
    write_covers(base, _committed_ids(store_path))


def _fold_hist(deltas: DataFrame) -> DataFrame:
    """Histogram merge algebra: bin counts ADD. Shared by read and
    compaction. Additivity is also why hist backfill must REPLACE the
    delta dir rather than overlay a base (see ``backfill_hist``) — an
    overlapping base double-counts under sum, unlike max-algebra HLL."""
    return deltas.groupBy("bin").agg(F.sum("c").alias("c"))


def read_hist(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold the per-batch value-histogram deltas into the current (bin, c)
    table. Refuses partially-covered pre-upgrade stores loudly (same
    guard as ``read_day_hll`` — under the ADDITIVE fold a silent gap is
    an undercount the drift audit would act on); ``backfill_hist``
    repairs them."""
    d = os.path.join(store_path, "hist")
    missing = _missing_batches(store_path, "hist")
    if missing:
        raise RuntimeError(
            f"sketch store {store_path!r} has committed batches with no "
            f"histogram delta ({sorted(missing)[:5]}…) — it predates the "
            "hist family; run backfill_hist before reading or the bin "
            "counts silently omit those batches")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"no histogram deltas under {store_path!r} — the store predates "
            "the hist family; run backfill_hist(spark, events_df, "
            "store_path) to build them from the full corpus")
    return _fold_hist(spark.read.parquet(d))


def backfill_hist(spark: SparkSession, events_df: DataFrame,
                  store_path: str) -> None:
    """One-shot repair for stores that predate the hist family. UNLIKE
    ``backfill_day_hll`` (max algebra — overlap harmless), histogram
    counts ADD, so a base overlaid on surviving per-batch deltas would
    double-count them: the backfill REPLACES the whole ``hist`` dir with
    a single ``batch=-2`` base built from the full ingested corpus,
    using the compaction swap (temp-materialize → two renames with
    rollback) so a crash never leaves a half-state."""
    import shutil

    from .compaction import BASE_BATCH_ID, write_covers

    d = os.path.join(store_path, "hist")
    tmp, old = d + ".backfill-tmp", d + ".backfill-old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    base_tmp = os.path.join(tmp, f"batch={BASE_BATCH_ID - 1}")
    hist_bins(events_df).coalesce(1).write.mode("overwrite").parquet(base_tmp)
    write_covers(base_tmp, _committed_ids(store_path))
    if os.path.isdir(d):
        os.rename(d, old)
    try:
        os.rename(tmp, d)
    except Exception:
        if os.path.isdir(old):
            os.rename(old, d)
        raise
    shutil.rmtree(old, ignore_errors=True)


def read_topk(spark: SparkSession, store_path: str,
              k: int = 3) -> DataFrame:
    """The standing "top talkers per day" answer from the maintained
    store — the continuous top-k serving path (r08 verdict #6): fold the
    per-batch day-CMS deltas (cells add), fold the candidate ledger
    (set union), score every candidate by its CMS-estimated total count
    (min over the d hash rows), and rank per day.

    Touches only sketch-sized relations: |days|×d×w cells + the bounded
    candidate ledger — never the stream's history. Both families are
    coverage-guarded like hist/hll_day: a committed batch with no delta
    would silently undercount (cms_day, additive) or silently hide a
    winner (topk_cand), so refuse loudly and point at the backfill."""
    from ..operators.profiling import _cms_bucket, _cms_rows

    for fam in ("cms_day", "topk_cand"):
        missing = _missing_batches(store_path, fam)
        if missing:
            raise RuntimeError(
                f"sketch store {store_path!r} has committed batches with "
                f"no {fam} delta ({sorted(missing)[:5]}…) — it predates "
                f"the continuous top-k family; run backfill_topk before "
                f"reading or the per-day report silently omits them")
        if not os.path.isdir(os.path.join(store_path, fam)):
            raise FileNotFoundError(
                f"no {fam} deltas under {store_path!r} — the store "
                f"predates the continuous top-k family; run "
                f"backfill_topk(spark, events_df, store_path)")
    sketch = _fold_cms_day(
        spark.read.parquet(os.path.join(store_path, "cms_day")))
    cand = _fold_topk_cand(
        spark.read.parquet(os.path.join(store_path, "topk_cand")))
    probe = (cand.select("day", "k", F.explode(_cms_rows()).alias("r"))
             .select("day", "k", F.col("r.d").alias("d"),
                     _cms_bucket(F.col("k"), F.col("r.a"),
                                 F.col("r.b")).alias("bucket")))
    est = (sketch.join(F.broadcast(probe), ["day", "d", "bucket"])
           .groupBy("day", "k").agg(F.min("c").alias("est_n")))
    from pyspark.sql.window import Window as W
    return (est.withColumn("rank", F.row_number().over(
        W.partitionBy("day").orderBy(F.desc("est_n"), F.asc("k"))))
        .filter(F.col("rank") <= k)
        .select("day", F.col("k").alias("user_id"), "est_n", "rank")
        .orderBy("day", "rank"))


def backfill_topk(spark: SparkSession, events_df: DataFrame,
                  store_path: str) -> None:
    """One-shot repair for stores that predate the continuous top-k
    families. Two algebras, two repair shapes (the delta-store fold rule):
    ``cms_day`` is ADDITIVE → atomically REPLACE its dir with a single
    full-corpus base (overlap with surviving deltas would double-count);
    ``topk_cand`` folds by UNION → overlay a ``batch=-2`` base (overlap
    harmless, and the corpus-exact per-day top-TOPK_CAND is at least as
    strong a candidate set as any per-batch union it covers)."""
    import shutil

    from .compaction import BASE_BATCH_ID, write_covers

    d = os.path.join(store_path, "cms_day")
    tmp, old = d + ".backfill-tmp", d + ".backfill-old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    base_tmp = os.path.join(tmp, f"batch={BASE_BATCH_ID - 1}")
    cms_sketch_grouped(cms_day_keys(events_df), group="day") \
        .coalesce(1).write.mode("overwrite").parquet(base_tmp)
    write_covers(base_tmp, _committed_ids(store_path))
    if os.path.isdir(d):
        os.rename(d, old)
    try:
        os.rename(tmp, d)
    except Exception:
        if os.path.isdir(old):
            os.rename(old, d)
        raise
    shutil.rmtree(old, ignore_errors=True)

    base = _delta_dir(store_path, "topk_cand", BASE_BATCH_ID - 1)
    topk_candidates(events_df).write.mode("overwrite").parquet(base)
    write_covers(base, _committed_ids(store_path))


def read_sketches(spark: SparkSession, store_path: str) -> tuple[DataFrame, DataFrame]:
    """Fold the per-batch deltas into the current sketches: CMS cells add,
    HLL registers max — the same constant-size merge the batch operators
    define, run over (n_batches × sketch-size) rows."""
    cms = _fold_cms(spark.read.parquet(os.path.join(store_path, "cms")))
    hll = _fold_hll(spark.read.parquet(os.path.join(store_path, "hll")))
    return cms, hll


def compact_sketches(spark: SparkSession, store_path: str) -> dict:
    """Fold each sketch's accumulated deltas into one ``batch=-1`` base
    delta (see compaction.py for the swap/replay contract) — the
    maintenance job the module docstring promises. Run only while the
    stream is stopped (single-writer)."""
    from .compaction import compact_deltas

    # refuse up front (before touching cms/hll, so a refusal leaves the
    # store untouched): a PARTIALLY-covered later-added family
    # (pre-upgrade store resumed under new code) must not be folded into
    # a batch=-1 base — the base would satisfy the read-side coverage
    # check and turn its loud refusal into a silent undercount of every
    # pre-upgrade batch
    for fam in _GUARDED_FAMILIES:
        missing = _missing_batches(store_path, fam)
        if missing:
            raise RuntimeError(
                f"refusing to compact sketches in {store_path!r}: committed "
                f"batches {sorted(missing)[:5]}… have no {fam} delta and "
                f"no base covers them — compacting would fold a partial "
                f"{fam} into a base the read side then trusts; run the "
                f"family's backfill first")
    out = {
        "cms": compact_deltas(spark, os.path.join(store_path, "cms"), _fold_cms),
        "hll": compact_deltas(spark, os.path.join(store_path, "hll"), _fold_hll),
    }
    for fam, fold in (("hll_day", _fold_hll_day), ("hist", _fold_hist),
                      ("cms_day", _fold_cms_day),
                      ("topk_cand", _fold_topk_cand)):
        fam_dir = os.path.join(store_path, fam)
        if os.path.isdir(fam_dir):  # absent on pre-upgrade stores (backfill repairs)
            out[fam] = compact_deltas(spark, fam_dir, fold)
        else:
            out[fam] = {"skipped": f"no {fam} dir (pre-upgrade store)"}
    return out
