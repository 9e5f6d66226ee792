"""Bucketed co-located join — the 100 TB shuffle-elimination strategy,
proven in plan form: writing both join sides bucketed on the join key lets
the sort-merge join read pre-partitioned data with NO Exchange on either
side (SURVEY.md §2.B 'co-locate joins via bucketing').
"""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from graph_database_project_spark.io import load_table

from .conftest import SF_ORACLE


def plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture()
def bucketed_tables(spark):
    # spark.sql.warehouse.dir is a static conf — tables land in the
    # default ./spark-warehouse; DROP TABLE removes the data too.
    orders = load_table(spark, SF_ORACLE, "orders")
    li = load_table(spark, SF_ORACLE, "lineitem")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey") \
        .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey") \
        .mode("overwrite").saveAsTable("b_lineitem")
    yield
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable broadcast: at test scale orders would broadcast and hide the
    # bucketed layout this test exists to prove
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = plan(joined)
        # the join itself must consume bucketed layout directly: no hash
        # exchange feeding the join inputs (the only exchange allowed is
        # the final single-key aggregate)
        assert p.count("Exchange hashpartitioning") <= 1, p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, p
        # and the result is still right
        total = joined.agg(F.sum("n").alias("t")).first()["t"]
        assert total == load_table(spark, SF_ORACLE, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
