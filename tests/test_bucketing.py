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


@pytest.fixture()
def bucketed_edges(spark):
    """An edge relation (src, dst) written bucketed on src — SCALE.md §1's
    prescription for the traversal join's big side."""
    orders = load_table(spark, SF_ORACLE, "orders")
    edges = orders.select(F.col("o_custkey").alias("src"),
                          F.col("o_orderkey").alias("dst"))
    spark.sql("DROP TABLE IF EXISTS b_edges")
    edges.write.bucketBy(8, "src").sortBy("src") \
        .mode("overwrite").saveAsTable("b_edges")
    yield edges
    spark.sql("DROP TABLE IF EXISTS b_edges")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_khop_over_bucketed_edges_is_edge_side_exchange_free(
        spark, bucketed_edges):
    """The k_hop loop joins (frontier.node == edges.src) every hop; with the
    edge table bucketed on src the edge side must feed the join with NO
    Exchange in any hop — only the (small) frontier side repartitions to
    meet the bucketed layout. Proven differentially: the identical hop plan
    over a plain parquet-scan edge relation carries exactly one more
    hash exchange (the edge side's)."""
    from graph_database_project_spark.graph.traverse import k_hop

    plain_edges = bucketed_edges
    bucketed = spark.table("b_edges")
    seeds = (
        load_table(spark, SF_ORACLE, "customer").limit(3)
        .select(F.col("c_custkey").alias("seed"), F.col("c_custkey").alias("node"))
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # one hop of k_hop's exact join shape, frontier materialized the way
        # the loop materializes it (localCheckpoint)
        frontier = seeds.select("seed", "node", F.lit(0).alias("depth")) \
            .distinct().localCheckpoint(eager=True)

        def hop_plan(edges):
            nxt = (
                frontier.join(edges, frontier.node == edges.src)
                .select("seed", F.col("dst").alias("node"),
                        F.lit(1).alias("depth"))
                .distinct()
            )
            return plan(nxt)

        p_bucketed = hop_plan(bucketed)
        p_plain = hop_plan(plain_edges)
        assert "Bucketed: true" in p_bucketed, p_bucketed
        # formatted explain lists each Exchange's partitioning on its own
        # "Arguments: hashpartitioning(...)" detail line
        n_b = p_bucketed.count("Arguments: hashpartitioning")
        n_p = p_plain.count("Arguments: hashpartitioning")
        # plain: frontier exchange + EDGE exchange + distinct exchange;
        # bucketed: the edge-side exchange must be gone, nothing else moves
        assert n_b == n_p - 1, (n_b, n_p, p_bucketed)

        # and the full traversal over the bucketed table returns the exact
        # same reachability set as over the plain relation
        got = sorted(map(tuple, k_hop(seeds, bucketed, 2).collect()))
        want = sorted(map(tuple, k_hop(seeds, plain_edges, 2).collect()))
        assert got == want and len(got) > 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


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
        # the final single-key aggregate). Count the formatted explain's
        # per-Exchange "Arguments: hashpartitioning(...)" detail lines —
        # the phrase "Exchange hashpartitioning" never appears in this
        # explain mode, so the old count was vacuously 0.
        assert p.count("Arguments: hashpartitioning") <= 1, p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, p
        # and the result is still right
        total = joined.agg(F.sum("n").alias("t")).first()["t"]
        assert total == load_table(spark, SF_ORACLE, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
