"""Delta-store compaction for the streaming rollup/sketch layouts.

Both stores accumulate one ``batch=<id>`` delta dir per microbatch
forever (exactly-once-by-layout, see rollup.py/sketch.py docstrings), so
read-side fold cost and small-file count grow with stream lifetime.
``compact_deltas`` closes that bound: read every delta, run the SAME fold
expression the read side uses, and atomically swap the folded result in
as a single ``batch=-1`` base delta (numeric sentinel — microbatch ids
are nonnegative, so the base can never collide with a live batch).

Correctness under replay: the ``_committed`` ledger is left untouched, so
a crash-replayed pre-compaction batch id still short-circuits at the
marker instead of re-adding rows the base already folded in. New batches
land beside the base and the unchanged read-side fold absorbs both — the
fold is associative/commutative by construction (sum / max), which is
what makes base+delta a valid state.

Swap protocol mirrors ``GraphStore.write_atomic``: materialize the fold
into a temp dir FIRST (it scans the live deltas, so it must finish before
anything moves), then two directory renames. Local-POSIX only, same guard
and reason as GraphStore (object stores want a transactional format's
metadata commit). Single-writer assumption: don't compact while the
stream's foreachBatch is live.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..graph.store import _require_posix

BASE_BATCH_ID = -1

# Coverage manifest written INSIDE each base delta dir (underscore prefix:
# Spark's file listing treats it as hidden, so parquet discovery never sees
# it). Records exactly which batch ids the base folded — the r07 advisor's
# sturdier design: coverage is a recorded fact, not an inference from base
# presence, so a base manufactured out of a PARTIAL family can no longer
# satisfy the read-side check (its manifest names only what it truly holds).
COVERS_FILE = "_covers.json"


def write_covers(base_dir: str, covers: set[int] | list[int],
                 legacy_full: bool = False) -> None:
    with open(os.path.join(base_dir, COVERS_FILE), "w") as f:
        json.dump({"covers": sorted(int(b) for b in covers),
                   "legacy_full": bool(legacy_full)}, f)


def read_covers(base_dir: str) -> dict | None:
    """Manifest of a base delta dir, or None for a legacy base written
    before manifests existed (callers fall back to the old presence
    inference for those — documented compat, never for new bases)."""
    p = os.path.join(base_dir, COVERS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        m = json.load(f)
    return {"covers": {int(b) for b in m.get("covers", [])},
            "legacy_full": bool(m.get("legacy_full", False))}


def compact_deltas(spark: SparkSession, data_dir: str,
                   fold: Callable[[DataFrame], DataFrame]) -> dict:
    """Fold every ``batch=*`` delta under ``data_dir`` into one base delta.

    ``fold`` receives the raw union of all deltas (without the batch
    column) and must return the merged table — pass the exact expression
    the store's read side uses so compaction can never drift from reads.

    Returns ``{"deltas_before", "deltas_after", "rows"}``.
    """
    data_dir = _require_posix(data_dir, "compact_deltas")
    delta_names = [d for d in os.listdir(data_dir) if d.startswith("batch=")]
    deltas_before = len(delta_names)
    tmp, old = data_dir + ".compact-tmp", data_dir + ".compact-old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    # coverage the new base will RECORD: every per-batch id folded, plus
    # whatever any prior base recorded. A prior base without a manifest
    # (written before manifests existed) degrades the new manifest to
    # legacy_full — readers then apply the old presence inference for it,
    # but every base minted from per-batch deltas alone carries the exact
    # recorded set
    ids = [int(d[len("batch="):]) for d in delta_names]
    covers: set[int] = {b for b in ids if b >= 0}
    legacy_full = False
    for b in ids:
        if b < 0:
            m = read_covers(os.path.join(data_dir, f"batch={b}"))
            if m is None or m["legacy_full"]:
                legacy_full = True
            if m is not None:
                covers |= m["covers"]

    folded = fold(spark.read.parquet(data_dir).drop("batch"))
    # the folded table is store-sized (buckets × types / sketch cells),
    # orders of magnitude below a data partition — one file is right
    base_tmp = os.path.join(tmp, f"batch={BASE_BATCH_ID}")
    folded.coalesce(1).write.mode("overwrite").parquet(base_tmp)
    write_covers(base_tmp, covers, legacy_full=legacy_full)
    rows = spark.read.parquet(tmp).count()

    os.rename(data_dir, old)
    try:
        os.rename(tmp, data_dir)
    except Exception:
        # mirror write_atomic's recovery (store.py): restore the live
        # deltas so data_dir never stays absent — otherwise every read
        # breaks until someone hand-renames .compact-old back
        os.rename(old, data_dir)
        raise
    shutil.rmtree(old)
    return {"deltas_before": deltas_before, "deltas_after": 1, "rows": rows}
