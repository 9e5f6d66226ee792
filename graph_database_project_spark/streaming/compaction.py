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

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..graph.store import _require_posix

BASE_BATCH_ID = -1


def compact_deltas(spark: SparkSession, data_dir: str,
                   fold: Callable[[DataFrame], DataFrame]) -> dict:
    """Fold every ``batch=*`` delta under ``data_dir`` into one base delta.

    ``fold`` receives the raw union of all deltas (without the batch
    column) and must return the merged table — pass the exact expression
    the store's read side uses so compaction can never drift from reads.

    Returns ``{"deltas_before", "deltas_after", "rows"}``.
    """
    data_dir = _require_posix(data_dir, "compact_deltas")
    deltas_before = len([d for d in os.listdir(data_dir)
                         if d.startswith("batch=")])
    tmp, old = data_dir + ".compact-tmp", data_dir + ".compact-old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    folded = fold(spark.read.parquet(data_dir).drop("batch"))
    # the folded table is store-sized (buckets × types / sketch cells),
    # orders of magnitude below a data partition — one file is right
    folded.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, f"batch={BASE_BATCH_ID}"))
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
