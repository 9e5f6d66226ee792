"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.B.
``oracle_sql()`` — DuckDB-equivalent SQL for each oracle-checkable query.
Since r08 EVERY ``queries()`` key has an oracle entry (the last rows-only
key, the multimodal decode stub, gained a value oracle: its features are
a pure function of md5(payload), recomputable from the hex digest).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graph_database_project_spark.registry import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-style pricing summary (scan → pushdown filter →
    partial-agg groupBy) on sf0.001. Deliberately the workhorse shape —
    the same query family bench.py times at sf0.1."""
    from graph_database_project_spark.operators.relational import q01_pricing_summary
    return q01_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
