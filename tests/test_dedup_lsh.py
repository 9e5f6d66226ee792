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

from .conftest import SF_ORACLE, SF_SMOKE
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


def test_prefix_filter_prunes_candidates_losslessly(spark):
    """The point of the PPJoin prefix filter is the CANDIDATE count: the
    naive inverted-index join examines every shingle-sharing pair
    (Σ df²-bounded), the prefix join only pairs meeting on a RARE
    (prefix) shingle under the length filter. Recall is proven by the
    oracle equality in test_parity (prefix result ≡ naive result); here
    we pin the pruning ratio so a regression that silently widens the
    prefix (or drops the length filter) fails loudly."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from graph_database_project_spark.operators.dedup import (
        PF_TAU_DEN, PF_TAU_NUM, _shingle_rel)

    sh = _shingle_rel(spark, SF_ORACLE)
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    naive = (ex.alias("a").join(
        ex.alias("b"),
        (F.col("a.s") == F.col("b.s"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count())

    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = (ex.join(dfreq, "s")
              .withColumn("pos", F.row_number().over(
                  W.partitionBy("doc_id").orderBy("df", "s")))
              .join(sizes, "doc_id"))
    prefix = ranked.filter(
        F.col("pos") <= F.col("n")
        - F.expr(f"({PF_TAU_NUM}*n + {PF_TAU_NUM}) div {PF_TAU_DEN}") + 1)
    a = prefix.select(F.col("doc_id").alias("da"), "s", F.col("n").alias("na"))
    b = prefix.select(F.col("doc_id").alias("db"), "s", F.col("n").alias("nb"))
    pruned = (a.join(b, "s")
              .filter((F.col("da") < F.col("db"))
                      & (PF_TAU_DEN * F.col("nb") >= PF_TAU_NUM * F.col("na"))
                      & (PF_TAU_DEN * F.col("na") >= PF_TAU_NUM * F.col("nb")))
              .select("da", "db").distinct().count())
    assert pruned < naive / 3, (pruned, naive)
    assert pruned >= 25  # at least every true pair survives as a candidate


def test_entity_resolution_class_contract(spark):
    """The keyed corruption classes map to deterministic bands: a clean or
    one-typo name with balance shift ≤ 100 is always a 'match'; two-typo
    odd-key far-balance records are always 'non_match'; genuine impostor
    candidates (block collisions, did != cid + base) exist and never reach
    'match' unless they agree on every scored field."""
    from graph_database_project_spark.operators.dedup import (
        ER_ID_BASE, ER_T_MATCH, q_entity_resolution)

    rows = q_entity_resolution(spark, SF_ORACLE).collect()
    assert rows, "no candidate pairs"
    true_pairs = [r for r in rows if r.did == r.cid + ER_ID_BASE]
    impostors = [r for r in rows if r.did != r.cid + ER_ID_BASE]
    assert impostors, "blocking produced no impostor candidates — the " \
                      "non-trivial bands are untested (dead variation)"
    for r in true_pairs:
        k = r.cid
        if k % 3 in (0, 1) and k % 5 in (0, 1, 2):
            assert r.band == "match", r          # name 40 + balance 25
        if k % 3 == 2 and k % 5 in (3, 4) and k % 2 == 1:
            assert r.band == "non_match", r      # nothing agrees
    for r in impostors:
        if r.band == "match":
            assert r.score >= ER_T_MATCH and r.lev <= 1, r
    # every band actually occurs (live variation)
    assert {r.band for r in rows} == {"match", "possible", "non_match"}


def test_entity_resolution_plan_is_blocked_equi_join(spark):
    """The ER blocking contract at the plan level: candidate generation
    must be an equi-join on the block key — a cartesian or broadcast
    nested-loop roster x roster join would be the quadratic shape
    blocking exists to prevent (same assert family as the LSH
    no-quadratic-join tests)."""
    from graph_database_project_spark.operators import dedup

    p = _plan(dedup.q_entity_resolution(spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
