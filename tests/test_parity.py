"""Differential test: every oracle-checkable query must match DuckDB at
sf0.01 — the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from graph_database_project_spark.registry import all_oracles, all_queries

from .conftest import SF_ORACLE
from .oracle import compare, duckdb_con

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
    compare(spark_df, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
