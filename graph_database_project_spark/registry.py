"""Aggregated query/oracle registry — the single source the driver contract
(``__spark_entry__.py``) and the local parity harness both read.

Invariant (tested in tests/test_registry.py): every ORACLE key exists in
QUERIES; queries without an oracle entry are the documented rows-only ones
(iterative algorithms, Python-UDF seams, XML ingest).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    dedup, graphq, multimodal, mutation, pipeline, relational, similarity,
    streamq, textops, tpch_ext, xmlq,
)
from .plans import nl2query

_MODULES = [relational, tpch_ext, mutation, graphq, dedup, similarity,
            textops, multimodal, streamq, xmlq, nl2query, pipeline]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
