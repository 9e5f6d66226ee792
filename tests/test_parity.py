"""Differential test: every oracle-checkable query must match DuckDB at
sf0.01 — the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from graph_database_project_spark.registry import all_oracles, all_queries

from .conftest import SF_ORACLE
from .oracle import assert_driver_canonicalizable, compare, duckdb_con

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    spark_df = QUERIES[name](spark, SF_ORACLE)
    oracle_pdf = con.execute(ORACLES[name]).df()
    # bit-exact for EVERY key: the driver's value hash has no float
    # tolerance, and an r06 sweep showed all 147 oracle keys already
    # match to the last ulp — so any future divergence is a real defect
    # the 1e-6 rounding would have hidden until a window rotation
    # exposed it (the r05 join_bloom_prune hash-fail).
    compare(spark_df, oracle_pdf, name, bitexact=True)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Rows-only queries still cross the driver's canonicalizer (rows +
    schema recorded), so they get the same driver-shaped lint as the
    oracle-checked set — this is what would have caught xml_khop_flagship
    locally in r02."""
    df = QUERIES[name](spark, SF_ORACLE)
    assert len(df.schema.fields) > 0
    sample = df.limit(50).toPandas()
    assert_driver_canonicalizable(df, name, sample_pdf=sample)
    assert df.count() >= 0
