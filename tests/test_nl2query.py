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


def test_table_grounding_deplurals_one_suffix_only():
    """Deplural must strip ONE -s/-es suffix, not every trailing 's'
    (rstrip('s') turned 'addresses' into 'addre' and made s-final table
    names ungroundable — ADVICE r04)."""
    from graph_database_project_spark.plans.nl2query import _table_name

    cat = {"address": {"id": "bigint"}, "status": {"id": "bigint"},
           "orders": {"o_orderkey": "bigint"}}
    assert _table_name("address", cat) == "address"     # as-is, s-final
    assert _table_name("addresses", cat) == "address"   # -es stripped once
    assert _table_name("status", cat) == "status"
    assert _table_name("order", cat) == "orders"        # pluralize
    assert _table_name("orders", cat) == "orders"
    assert _table_name("orderss", cat) == "orders"  # one -s strip suffices
    with pytest.raises(ValueError):
        _table_name("ordersss", cat)  # but stripping never recurses


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


def test_followup_resolves_prior_entity():
    from graph_database_project_spark.plans.nl2query import resolve_question

    q = resolve_question([
        "total revenue per nation in region 'ASIA'",
        "and for EUROPE?",
    ])
    assert q == "total revenue per nation in region 'EUROPE'"
    # follow-up chains anchor on the nearest grounded (non-follow-up) turn
    q2 = resolve_question([
        "total revenue per nation in region 'ASIA'",
        "and for EUROPE?",
        "what about AFRICA?",
    ])
    assert q2 == "total revenue per nation in region 'AFRICA'"
    # a non-follow-up passes through untouched
    assert resolve_question(["top 3 customers by revenue"]) == \
        "top 3 customers by revenue"


def test_self_grounded_question_is_not_a_followup():
    from graph_database_project_spark.plans.nl2query import resolve_question

    # Starts with "and" but matches a translation rule on its own — must pass
    # through untouched, not have its tail swallowed as a follow-up referent.
    q = resolve_question([
        "total revenue per nation in region 'ASIA'",
        "and how many orders are there per status?",
    ])
    assert q == "and how many orders are there per status"
    # referent capture is capped at 4 tokens, so long rule-less sentences
    # opening with a follow-up cue also fall through rather than rewrite
    q2 = resolve_question([
        "total revenue per nation in region 'ASIA'",
        "and please give me something completely different and unrelated here",
    ])
    assert q2.startswith("and please give me")


def test_followup_without_anchor_raises():
    import pytest as _pytest
    from graph_database_project_spark.plans.nl2query import resolve_question

    with _pytest.raises(ValueError):
        resolve_question(["and for EUROPE?"])


def test_answer_chat_multi_turn(spark):
    from graph_database_project_spark.plans.nl2query import answer_chat

    sql, df = answer_chat(spark, SF_SMOKE, [
        "total revenue per nation in region 'ASIA'",
        "and for EUROPE?",
    ])
    assert "r_name = 'EUROPE'" in sql
    # result must be exactly EUROPE's nations (synthetic corpus names)
    expected = {
        r["n_name"]
        for r in spark.sql(
            "SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE'").collect()
    }
    assert {r["n_name"] for r in df.collect()} == expected and expected


def test_unknown_identifier_rejected_not_interpolated(spark):
    """The injection seam: question-derived identifiers must validate
    against the derived catalog, not be spliced into SQL."""
    from graph_database_project_spark.plans.nl2query import derive_catalog

    cat = derive_catalog(spark, SF_SMOKE)
    with pytest.raises(ValueError, match="unknown"):
        rule_based_translate(
            "how many distinct name values in pg_tables", cat)
    with pytest.raises(ValueError, match="unknown column"):
        rule_based_translate(
            "how many distinct bogus_col values in orders", cat)
    # the grounded form still translates
    sql = rule_based_translate(
        "how many distinct o_orderpriority values in orders", cat)
    assert "count(DISTINCT o_orderpriority)" in sql


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


def test_graph_question_routes_through_motif(spark):
    """Pattern-shaped questions compile to a declarative motif
    (graph/motif.py), not the k-hop fallback: the routed answer must
    equal the registry motif query's golden row for the same bulletin."""
    from graph_database_project_spark.operators.motifq import (
        q_graph_motif_chain, q_graph_motif_fanout)
    from graph_database_project_spark.operators.xmlq import _store
    from graph_database_project_spark.plans.nl2query import answer_graph

    store = _store(spark)
    df = answer_graph(
        spark, store, "Which airplanes are affected by bulletin 737-00-1028?")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["docnbr"] == "737-00-1028"
    import hashlib
    golden = {r.docnbr: (r.airplanes_md5, r.airplanes_len)
              for r in q_graph_motif_chain(spark, "/root/testdata/sf0.01")
              .collect()}
    txt = rows[0]["airplanes"]
    assert (hashlib.md5(txt.encode()).hexdigest(), len(txt)) \
        == golden["737-00-1028"]

    df2 = answer_graph(spark, store, "subject of '737-00-1029'")
    fan = {r.docnbr: r.subject
           for r in q_graph_motif_fanout(spark, "/root/testdata/sf0.01")
           .collect()}
    assert df2.first()["subject"] == fan["737-00-1029"]


def test_new_rules_ground_and_validate(spark):
    """Count-all / global-agg / sum-per rules: grounded SQL, plural
    normalization, and unknown-identifier rejection."""
    import pytest

    from graph_database_project_spark.plans.nl2query import (
        answer, derive_catalog, rule_based_translate)

    cat = derive_catalog(spark, SF_SMOKE)

    assert rule_based_translate("how many orders are there", cat) \
        == "SELECT count(*) AS n FROM orders"
    # plural → singular grounding
    assert "FROM customer" in rule_based_translate("how many customers?", cat) \
        .replace("?", "")
    sql = rule_based_translate("average o_totalprice in orders", cat)
    assert "avg(o_totalprice)" in sql
    sql = rule_based_translate("max value in events", cat)
    assert "max(value)" in sql and "FROM events" in sql
    sql = rule_based_translate("total o_totalprice per o_orderstatus in orders", cat)
    assert "GROUP BY o_orderstatus" in sql

    with pytest.raises(ValueError):
        rule_based_translate("average nonexistent_col in orders", cat)
    with pytest.raises(ValueError):
        rule_based_translate("how many flurbs", cat)

    # end-to-end through the engine
    _sql, df = answer(spark, SF_SMOKE, "how many orders are there?")
    assert df.first()["n"] > 0


def test_non_numeric_agg_rejected_at_translation(spark):
    """min/max/avg/sum over a valid but non-numeric column must raise
    ValueError at translation (→ 422 path), not AnalysisException at
    execution (→ 500)."""
    import pytest

    from graph_database_project_spark.plans.nl2query import (
        derive_catalog, rule_based_translate)

    cat = derive_catalog(spark, SF_SMOKE)
    for q in ("max event_type in events", "average o_orderstatus in orders",
              "total o_orderstatus per o_orderpriority in orders"):
        with pytest.raises(ValueError):
            rule_based_translate(q, cat)
    # numeric columns still translate
    assert "max(value)" in rule_based_translate("max value in events", cat)


def test_agg_rules_word_bounded_and_anchored(spark):
    """'min' inside 'admin' must not fire the min rule, and a trailing
    qualifier the grammar can't express must ValueError rather than be
    silently dropped (both reproduced bugs from the r04 review)."""
    import pytest

    from graph_database_project_spark.plans.nl2query import (
        derive_catalog, rule_based_translate)

    cat = derive_catalog(spark, SF_SMOKE)
    with pytest.raises(ValueError):
        rule_based_translate("count admin value in events", cat)
    with pytest.raises(ValueError):
        rule_based_translate("average value in events per user", cat)


def test_search_rule_matches_bm25_operator(spark):
    """'search documents for ...' compiles to one Spark SQL statement whose
    ranking must agree EXACTLY with the DataFrame-API text_bm25_search
    operator on the same fixed terms — two independent expressions of the
    Okapi arithmetic. Injection-shaped phrases are rejected at translation."""
    import pytest

    from graph_database_project_spark.operators.textops import (
        BM25_TERMS, BM25_TOP_N, q_bm25_search)
    from graph_database_project_spark.plans.nl2query import answer

    phrase = " ".join(BM25_TERMS)
    sql, df = answer(spark, SF_SMOKE, f"search documents for '{phrase}'")
    got = [(r["doc_id"], r["bm25"]) for r in df.collect()]
    want = [(r["doc_id"], r["bm25"])
            for r in q_bm25_search(spark, SF_SMOKE).collect()[:10]]
    assert got == want
    assert len(got) == 10 and got[0][1] >= got[-1][1]

    from graph_database_project_spark.plans.nl2query import rule_based_translate
    with pytest.raises(ValueError):
        rule_based_translate("search documents for 'x; DROP TABLE y'", {})


def test_followup_anchors_through_earlier_marker_turn():
    """An image-marker turn EARLIER in the transcript must not derail
    later follow-ups: the marker is stripped from every turn, so turn 2
    is recognized as a follow-up (skipped as an anchor) and turn 3
    anchors on turn 1 (code-review finding, r06)."""
    from graph_database_project_spark.plans.nl2query import resolve_question

    got = resolve_question([
        "total revenue per nation in region 'ASIA'",
        "[image attached: a.png, 10 bytes] and for EUROPE?",
        "and for AFRICA?",
    ])
    assert got == "total revenue per nation in region 'AFRICA'"


def test_numeric_question_emits_cast_pattern(spark):
    """r14: 'tasks over N hours' routes through the numeric pattern
    surface (toFloat cast + float literal) and must agree with the
    directly-computed answer."""
    from graph_database_project_spark.operators.xmlq import _store
    from graph_database_project_spark.plans.nl2query import answer_graph

    store = _store(spark)
    df = answer_graph(spark, store,
                      "Which tasks take more than 25.5 task hours?")
    got = [(r.docnbr, r.task, r.hours) for r in df.collect()]
    # corpus task_hours: 40, 50 (1028), 30 (1029), 20 (1030)
    assert got == [
        ("737-00-1028", "Angle of Attack (AOA) Sensor System Test", "40"),
        ("737-00-1028", "Operational Readiness Flight", "50"),
        ("737-00-1029", "Fuel Pump Replacement", "30"),
    ]
    # integer-spelled threshold works too (float regex admits both)
    df2 = answer_graph(spark, store,
                       "which tasks need more than 45 hours")
    assert [(r.docnbr, r.hours) for r in df2.collect()] == [
        ("737-00-1028", "50")]


def test_exists_question_emits_semi_pattern(spark):
    """r14: 'which X have any Y' routes through the positive
    existential predicate — only the numbered (work-instruction) steps
    survive, counted per parent without per-number multiplication."""
    from graph_database_project_spark.operators.motifq import (
        q_graph_motif_exists)
    from graph_database_project_spark.operators.xmlq import _store
    from graph_database_project_spark.plans.nl2query import answer_graph

    store = _store(spark)
    df = answer_graph(spark, store, "which steps have any numbers")
    got = sorted((r.docnbr, r.parent, r.n) for r in df.collect())
    golden = sorted(
        (r.docnbr, r.parent, r.n_steps)
        for r in q_graph_motif_exists(spark, "/root/testdata/sf0.01")
        .collect())
    assert got == golden
    assert all(p == "work_instructions" for _, p, _ in got)


def test_numeric_agg_question_emits_expr_aggregates(spark):
    """r14b: the rollup question routes through aggregates over cast
    expressions and must equal the golden registry key."""
    from graph_database_project_spark.operators.motifq import (
        q_graph_motif_numeric_agg)
    from graph_database_project_spark.operators.xmlq import _store
    from graph_database_project_spark.plans.nl2query import answer_graph

    store = _store(spark)
    df = answer_graph(spark, store,
                      "total and average task hours per bulletin")
    got = [(r.docnbr, r.n_tasks, r.total_hours, r.avg_hours)
           for r in df.collect()]
    golden = [(r.docnbr, r.n_tasks, r.total_hours, r.avg_hours)
              for r in q_graph_motif_numeric_agg(
                  spark, "/root/testdata/sf0.01").collect()]
    assert got == golden == [
        ("737-00-1028", 2, 90, 45.0),
        ("737-00-1029", 1, 30, 30.0),
        ("737-00-1030", 1, 20, 20.0),
    ]


def test_cond_count_question_emits_case_aggregate(spark):
    """r15: 'how many tasks take at least N hours per bulletin' routes
    through the sum(CASE WHEN ... THEN 1 ELSE 0 END) conditional
    aggregate — per-bulletin counts against the corpus hours
    {1028: 40,50; 1029: 30; 1030: 20}."""
    from graph_database_project_spark.operators.xmlq import _store
    from graph_database_project_spark.plans.nl2query import answer_graph

    store = _store(spark)
    df = answer_graph(spark, store,
                      "how many tasks take at least 30 hours per bulletin")
    got = [(r.docnbr, r.n_matching, r.n_tasks) for r in df.collect()]
    assert got == [
        ("737-00-1028", 2, 2),
        ("737-00-1029", 1, 1),
        ("737-00-1030", 0, 1),
    ]
    # 'over N' is STRICT (r15 review finding: the first draft compiled
    # both phrasings to >=, silently counting the exactly-30h task)
    df2 = answer_graph(spark, store,
                       "how many tasks take over 30 hours per bulletin")
    got2 = [(r.docnbr, r.n_matching, r.n_tasks) for r in df2.collect()]
    assert got2 == [
        ("737-00-1028", 2, 2),
        ("737-00-1029", 0, 1),
        ("737-00-1030", 0, 1),
    ]


def test_label_question_emits_concat_pattern(spark):
    """r15: 'label each task with its hours' routes through string '+'
    concatenation and size() — label cells match the registry key's
    hand-verified shapes."""
    from graph_database_project_spark.operators.xmlq import _store
    from graph_database_project_spark.plans.nl2query import answer_graph

    store = _store(spark)
    df = answer_graph(spark, store, "label each task with its hours")
    got = [(r.docnbr, r.label, r.name_len) for r in df.collect()]
    assert ("737-00-1029", "Fuel Pump Replacement (30h)", 21) in got
    assert len(got) == 4
    assert all(lbl.endswith("h)") for _, lbl, _ in got)
