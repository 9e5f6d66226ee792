"""Unit tests for the reference-derived scalar string functions
(SURVEY.md §2.A #14-16, #22-23)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_project_spark.functions.strings import (
    extract_content, extract_nested_content, format_node_label,
    parse_airplanes, sanitize_relationship, tag_prefix_numeric,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_sanitize_relationship(spark):
    got = _one(spark, sanitize_relationship(F.lit("Planning Information (1)")))
    assert got == "PLANNING_INFORMATION__1_"


def test_format_node_label(spark):
    assert _one(spark, format_node_label(F.lit("HAS_PLANNING_INFORMATION"))) == \
        "Planning_Information"
    assert _one(spark, format_node_label(F.lit("work_instructions"))) == \
        "Work_Instructions"


def test_tag_prefix_numeric(spark):
    df = spark.createDataFrame([("737_thing",), ("header",)], "t string")
    got = [r.v for r in df.select(tag_prefix_numeric("t").alias("v")).collect()]
    assert got == ["Tag_737_thing", "header"]


def test_extract_content_first_vs_nested_greedy(spark):
    line = "<a>x</a><a>y</a>"
    assert _one(spark, extract_content(F.lit(line), "a")) == "x"
    assert _one(spark, extract_nested_content(F.lit(line), "a")) == "x</a><a>y"


def test_parse_airplanes_micro_format(spark):
    content = "737-8 and 737-9 Airplane(s), line number(s) 5602, 5668, 6975-6976"
    row = _one(spark, parse_airplanes(F.lit(content)))
    assert list(row.types) == ["737-8", "737-9"]
    assert list(row.line_numbers) == ["5602", "5668", "6975-6976"]


def test_approx_count_distinct_within_tolerance(spark):
    """approx_count_distinct (HLL++ sketch, mergeable map-side — the 100 TB
    count-distinct) must land within 5% of exact on the orders table."""
    from pyspark.sql import functions as F
    from graph_database_project_spark.io import load_table
    from .conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05

    # the registered rows-only query self-reports its error per group
    from graph_database_project_spark.operators.relational import (
        q_agg_approx_distinct,
    )

    rows = q_agg_approx_distinct(spark, SF_ORACLE).collect()
    assert rows and all(r.approx_ok for r in rows)
