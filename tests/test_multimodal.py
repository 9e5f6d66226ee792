"""Multimodal plumbing tests: binary column materialization, Arrow batch
decode stub determinism, schema stability."""

from __future__ import annotations

from graph_database_project_spark.operators.multimodal import (
    FEATURE_SCHEMA, binarize_documents, q_multimodal_decode,
)

from .conftest import SF_SMOKE


def test_binarize_schema(spark):
    df = binarize_documents(spark, SF_SMOKE)
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.first()
    assert row.n_bytes == len(row.payload)


def test_decode_deterministic_and_schema(spark):
    a = {r.doc_id: (r.width, r.height, r.mode, r.feat_mean)
         for r in q_multimodal_decode(spark, SF_SMOKE).collect()}
    b = {r.doc_id: (r.width, r.height, r.mode, r.feat_mean)
         for r in q_multimodal_decode(spark, SF_SMOKE).collect()}
    assert a == b
    assert len(a) == 500
    w, h, mode, fm = next(iter(a.values()))
    assert 1 <= w <= 640 and 1 <= h <= 480 and mode in ("RGB", "L")
    assert 0.0 <= fm <= 1.0
    assert q_multimodal_decode(spark, SF_SMOKE).schema == FEATURE_SCHEMA
