"""NL→query→NL lifecycle tests (offline, rule-based translator)."""

from __future__ import annotations

import pytest

from graph_database_project_spark.plans.nl2query import (
    answer, derive_catalog, explain_result, rule_based_translate,
)

from .conftest import SF_SMOKE


def test_translate_count_per():
    sql = rule_based_translate("How many orders per priority?", {})
    assert "o_orderpriority" in sql and "GROUP BY" in sql


def test_translate_unknown_raises():
    with pytest.raises(ValueError):
        rule_based_translate("what is the meaning of life", {})


def test_catalog_is_derived_not_hardcoded(spark):
    cat = derive_catalog(spark, SF_SMOKE)
    assert set(cat) == {"region", "nation", "customer", "supplier", "part",
                        "orders", "lineitem", "events", "documents", "embeddings"}
    assert "o_orderpriority" in cat["orders"]


def test_full_lifecycle(spark):
    sql, df = answer(spark, SF_SMOKE, "top 3 customers by revenue")
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]["revenue"] >= rows[1]["revenue"] >= rows[2]["revenue"]
    text = explain_result("top 3 customers by revenue", rows)
    assert "3 row(s)" in text and "revenue=" in text


def test_pluggable_translator(spark):
    def fake_llm(question, catalog):
        assert "orders" in catalog  # the derived catalog reaches the seam
        return "SELECT count(*) AS n FROM orders"
    sql, df = answer(spark, SF_SMOKE, "anything", translate=fake_llm)
    assert df.first()["n"] == 1500


def test_graph_question_flagship(spark):
    """The reference's chat loop end-to-end: NL → 3-hop downward traversal
    from the named ServiceBulletin → per-seed grouped result → NL text."""
    from graph_database_project_spark.graph.shred import ingest_xml
    from graph_database_project_spark.graph.store import GraphStore
    from graph_database_project_spark.plans.nl2query import answer_graph

    nodes, edges = ingest_xml(spark, "/root/reference/boeing_service_bulletin_*.xml")
    store = GraphStore(nodes, edges)

    df = answer_graph(spark, store, "What is connected to bulletin 737-00-1028 up to 3 levels?")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["seed_name"] == "737-00-1028"
    assert rows[0]["n_connected"] > 10

    # default depth is the reference's contract (3)
    df2 = answer_graph(spark, store, "contents of '737-00-1028'")
    assert df2.first()["n_connected"] == rows[0]["n_connected"]

    text = explain_result("what is connected to 737-00-1028", rows)
    assert "1 row(s)" in text

    with pytest.raises(ValueError):
        answer_graph(spark, store, "how is the weather")
