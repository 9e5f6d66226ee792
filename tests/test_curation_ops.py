"""Closed-form invariants for the r10 curation additions — properties
the DuckDB oracle (same formula, other engine) cannot distinguish from
a shared mistake."""

from __future__ import annotations

from graph_database_project_spark.operators.curation import (
    q_batch_padding_audit, q_dedup_weighted_mass)

SF = "/root/testdata/sf0.01"


def test_padding_buckets_are_powers_of_two_and_waste_bounded(spark):
    rows = q_batch_padding_audit(spark, SF).collect()
    assert len(rows) >= 3  # several geometric buckets populated
    for r in rows:
        # bucket tops are exact powers of two
        assert r.bucket_top & (r.bucket_top - 1) == 0
        # every doc in a bucket has n > top/2, so waste is STRICTLY
        # under 50% — the closed-form guarantee of geometric bucketing
        assert 0 <= r.waste_ppm < 500_000
        assert r.padded_tokens == r.n_docs * r.bucket_top
        assert r.sum_tokens <= r.padded_tokens


def test_dedup_weighted_mass_bounds_and_live_weighting(spark):
    rows = q_dedup_weighted_mass(spark, SF).collect()
    assert len(rows) == 20
    n_down = 0
    for r in rows:
        # effective mass never exceeds raw mass, and a cluster member
        # always keeps at least 1/n of its tokens (so > 0)
        assert 0 < r.eff_tokens_ppm <= r.raw_tokens * 1_000_000
        assert r.n_clusters <= r.n_docs
        if r.eff_tokens_ppm < r.raw_tokens * 1_000_000:
            n_down += 1
    # dead-variation guard: the down-weighting path is live at the
    # oracle scale (word-set clusters span sources)
    assert n_down >= 10
