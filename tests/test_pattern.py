"""Tests for the MATCH-string parser (graph/pattern.py) — the text
front-end of the motif compiler.

Three layers: (1) a pure parse battery (accepted shapes produce the
expected NodePat/EdgePat specs; everything outside the subset is
rejected at parse time with a positioned error); (2) text≡object
equivalence on a synthetic graph (the same pattern written as a string
and as Python objects must return identical bindings — the parser adds
syntax, never semantics); (3) corpus equivalence: the shipped
object-API registry keys re-expressed as strings return byte-identical
answers, and the two r11 text keys' NULL-flattening/projection contracts
hold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_project_spark.graph.motif import (
    EdgePat, NodePat, match_motif)
from graph_database_project_spark.graph.pattern import (
    PatternSyntaxError, match_pattern, parse_match)

SF = "/root/testdata/sf0.01"


# --- layer 1: pure parsing -----------------------------------------------

def test_parse_chain_with_props_and_return():
    p = parse_match(
        "MATCH (a:L {name: 'x', docnbr: 'y', k: 'v'})-[:T]->(b) "
        "RETURN a.docnbr AS d, b.name")
    assert p.node_pats == [
        NodePat("a", label="L", name="x", docnbr="y", prop=("k", "v")),
        NodePat("b")]
    assert p.edge_pats == [EdgePat("a", "b", "T")]
    assert p.returns == [("a", "docnbr", "d"), ("b", "name", "b_name")]
    assert not p.distinct


def test_parse_directions():
    out = parse_match("MATCH (a)-[:T]->(b) RETURN a.id").edge_pats[0]
    assert (out.direction, out.src, out.dst) == ("out", "a", "b")
    rev = parse_match("MATCH (a)<-[:T]-(b) RETURN a.id").edge_pats[0]
    assert (rev.direction, rev.src, rev.dst) == ("in", "a", "b")
    both = parse_match("MATCH (a)-[:T]-(b) RETURN a.id").edge_pats[0]
    assert both.direction == "both"
    # bracketless sugar
    assert parse_match("MATCH (a)-->(b) RETURN a.id").edge_pats[0] \
        .direction == "out"
    assert parse_match("MATCH (a)<--(b) RETURN a.id").edge_pats[0] \
        .direction == "in"


def test_parse_hop_ranges():
    e = parse_match("MATCH (a)-[:T*1..3]->(b) RETURN a.id").edge_pats[0]
    assert (e.min_hops, e.max_hops) == (1, 3)
    e = parse_match("MATCH (a)-[*2]->(b) RETURN a.id").edge_pats[0]
    assert (e.min_hops, e.max_hops, e.rel_type) == (2, 2, None)
    e = parse_match("MATCH (a)-[:T*..4]->(b) RETURN a.id").edge_pats[0]
    assert (e.min_hops, e.max_hops) == (1, 4)


def test_parse_optional_match_and_negation():
    p = parse_match(
        "MATCH (a:L)-[:T]->(b) OPTIONAL MATCH (b)-[:U]->(c) "
        "WHERE NOT (a)-[:V]->(:M {docnbr: 'z'}) "
        "RETURN DISTINCT a.name")
    kinds = [(e.optional, e.negated) for e in p.edge_pats]
    assert kinds == [(False, False), (True, False), (False, True)]
    neg = p.edge_pats[-1]
    aux = next(n for n in p.node_pats if n.var == neg.dst)
    assert aux.label == "M" and aux.docnbr == "z"
    assert p.distinct


def test_parse_where_comparisons_build_columns(spark):
    p = parse_match(
        "MATCH (a:L)-[:T]->(b:L) WHERE a.docnbr < b.docnbr "
        "AND a.name <> 'x' RETURN a.id")
    col = p.where_column()
    assert col is not None
    s = str(col)
    assert "a_docnbr" in s and "b_docnbr" in s and "a_name" in s


@pytest.mark.parametrize("bad,hint", [
    ("MATCH (a)", "no edge"),
    ("MATCH (a)-[r:T]->(b) RETURN a.id", "edge variable"),
    ("MATCH (a)-[:T*]->(b) RETURN a.id", "unbounded"),
    ("MATCH (a)-[:T*2..]->(b) RETURN a.id", "unbounded"),
    ("MATCH (a)-[:T]->(b) WHERE a.id = 1 OR b.id = 2 RETURN a.id", "OR"),
    ("MATCH (a)-[:T]->(b) RETURN a.id ORDER BY a.id", "unexpected"),
    ("MATCH (A)-[:T]->(b) RETURN b.id", "variable"),
    ("MATCH (a {x: 'p', y: 'q'})-[:T]->(b) RETURN a.id", "one non-name"),
    ("MATCH (a)-[:T]->(b) RETURN c.id", "unknown variable"),
    ("MATCH (a)-[:T]->(b) WHERE a.zzz = 'x' RETURN a.id", "not carried"),
    ("MATCH (a)-[:T]->(b) RETURN a AS x", "bare variable"),
    ("MATCH (a:L)-[:T]->(a:M) RETURN a.id", "re-declared"),
    ("MATCH (a {k: 1})-[:T]->(b) RETURN a.id", "quoted"),
    ("MATCH (a)-[:T]->(b) WHERE NOT (a)-[:U]->(c)-[:V]->(d) "
     "RETURN a.id", "single-edge"),
])
def test_parse_rejects_with_positioned_errors(bad, hint):
    with pytest.raises(PatternSyntaxError) as ei:
        parse_match(bad)
    assert hint.lower().split()[0] in str(ei.value).lower()


# --- layer 2: text ≡ object on a synthetic graph ---------------------------

@pytest.fixture(scope="module")
def tiny(spark):
    nodes = spark.createDataFrame(
        [(1, ["A"], "a1", None, "d1", {"k": "v"}),
         (2, ["A"], "a2", None, "d2", {}),
         (3, ["B"], "b1", None, "d1", {}),
         (4, ["B"], "b2", None, "d2", {}),
         (5, ["C"], "c1", None, "d1", {})],
        "id long, labels array<string>, name string, content string, "
        "docnbr string, props map<string,string>")
    edges = spark.createDataFrame(
        [(1, 3, "R"), (2, 4, "R"), (3, 5, "S"), (4, 5, "S"), (5, 1, "T")],
        "src long, dst long, rel_type string")
    return nodes, edges


def _bindings(df):
    return sorted(tuple(r) for r in df.collect())


def test_text_equals_object_chain(tiny):
    nodes, edges = tiny
    via_text = match_pattern(
        nodes, edges, "MATCH (a:A)-[:R]->(b:B)-[:S]->(c:C) "
        "RETURN a.name AS an, b.name AS bn, c.name AS cn")
    via_obj = match_motif(
        nodes, edges,
        [NodePat("a", "A"), NodePat("b", "B"), NodePat("c", "C")],
        [EdgePat("a", "b", "R"), EdgePat("b", "c", "S")],
    ).select(F.col("a_name").alias("an"), F.col("b_name").alias("bn"),
             F.col("c_name").alias("cn"))
    assert _bindings(via_text) == _bindings(via_obj)


def test_text_equals_object_negation_where_and_prop(tiny):
    nodes, edges = tiny
    via_text = match_pattern(
        nodes, edges,
        "MATCH (a:A {k: 'v'})-[:R]->(b:B) "
        "WHERE NOT (b)-[:NOPE]->(c) AND a.docnbr = b.docnbr "
        "RETURN a.name AS an, b.name AS bn")
    via_obj = match_motif(
        nodes, edges,
        [NodePat("a", "A", prop=("k", "v")), NodePat("b", "B"),
         NodePat("c")],
        [EdgePat("a", "b", "R"), EdgePat("b", "c", "NOPE", negated=True)],
        where=F.col("a_docnbr") == F.col("b_docnbr"),
    ).select(F.col("a_name").alias("an"), F.col("b_name").alias("bn"))
    assert _bindings(via_text) == _bindings(via_obj) \
        == [("a1", "b1")]


def test_text_optional_preserves_unmatched(tiny):
    nodes, edges = tiny
    rows = _bindings(match_pattern(
        nodes, edges,
        "MATCH (b:B) OPTIONAL MATCH (b)-[:T]->(z) "
        "RETURN b.name AS bn, z.name AS zn"))
    # no B node has an outgoing T edge: both preserved with NULL
    assert rows == [("b1", None), ("b2", None)]
    rows2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (c:C) OPTIONAL MATCH (c)-[:T]->(z) "
        "RETURN c.name AS cn, z.name AS zn"))
    assert rows2 == [("c1", "a1")]


def test_label_and_reltype_disjunction(tiny):
    """Cypher's ``:A|B`` alternation, text and object forms agreeing."""
    nodes, edges = tiny
    via_text = match_pattern(
        nodes, edges,
        "MATCH (x:A|B)-[:R|S]->(y:B|C) RETURN x.name AS xn, y.name AS yn")
    via_obj = match_motif(
        nodes, edges,
        [NodePat("x", label=("A", "B")), NodePat("y", label=("B", "C"))],
        [EdgePat("x", "y", rel_type=("R", "S"))],
    ).select(F.col("x_name").alias("xn"), F.col("y_name").alias("yn"))
    rows = _bindings(via_text)
    assert rows == _bindings(via_obj)
    # A-R->B and B-S->C both admitted; nothing else
    assert rows == [("a1", "b1"), ("a2", "b2"), ("b1", "c1"), ("b2", "c1")]


def test_disjunction_broadcast_needs_every_branch_bounded(tiny):
    """label_counts: a disjunction broadcasts only when all branches are
    catalog-bounded and their SUM fits."""
    from graph_database_project_spark.graph.motif import match_motif

    nodes, edges = tiny

    def plan(label, counts):
        df = match_motif(
            nodes, edges, [NodePat("x", label=label), NodePat("y")],
            [EdgePat("x", "y", "R")], label_counts=counts)
        return df._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan(("A", "B"), {"A": 2, "B": 2})
    # one unknown branch → no broadcast hint for the node side
    assert "BroadcastHashJoin" not in plan(("A", "Z"), {"A": 2})
    # sum over the cap → no broadcast
    assert "BroadcastHashJoin" not in plan(
        ("A", "B"), {"A": 2, "B": 200_000})


def test_bare_return_variable_expands_to_carry_columns(tiny):
    nodes, edges = tiny
    df = match_pattern(nodes, edges, "MATCH (a:A)-[:R]->(b:B) RETURN b")
    assert df.columns == ["b_id", "b_name", "b_content", "b_docnbr"]


# --- layer 3: corpus — shipped keys, text front-end ------------------------

@pytest.fixture(scope="module")
def store(spark):
    from graph_database_project_spark.operators.xmlq import _store
    return _store(spark)


@pytest.fixture(scope="module")
def stats(spark):
    from graph_database_project_spark.operators.motifq import _label_stats
    return _label_stats(spark)


def test_text_reproduces_shared_key(spark, store, stats):
    from graph_database_project_spark.operators.motifq import (
        q_graph_motif_shared)
    via_text = match_pattern(
        store.nodes, store.edges,
        "MATCH (ln:LineNumber)-[:included_in]->(a1:Airplane), "
        "(ln)-[:included_in]->(a2:Airplane) "
        "WHERE a1.docnbr < a2.docnbr "
        "RETURN DISTINCT ln.name AS line_number, a1.docnbr AS doc_a, "
        "a2.docnbr AS doc_b",
        label_counts=stats)
    assert _bindings(via_text) == _bindings(q_graph_motif_shared(spark, SF))


def test_text_reproduces_varlength_key(spark, store, stats):
    from graph_database_project_spark.operators.motifq import (
        q_graph_motif_varlength)
    via_text = (match_pattern(
        store.nodes, store.edges,
        "MATCH (sb:ServiceBulletin)-[*1..3]->(x) WHERE x.id <> sb.id "
        "RETURN sb.docnbr AS docnbr",
        label_counts=stats)
        .groupBy("docnbr").agg(F.count(F.lit(1)).alias("n_reachable")))
    assert _bindings(via_text) == \
        _bindings(q_graph_motif_varlength(spark, SF))


def test_registry_optional_key_null_flattening(spark):
    from graph_database_project_spark.operators.motifq import (
        q_graph_motif_optional)
    rows = q_graph_motif_optional(spark, SF).collect()
    assert len(rows) == 10
    stepless = [r for r in rows if r.step_head == "(no steps)"]
    assert len(stepless) == 3            # one summary description per doc
    assert all(r.step_len == -1 for r in stepless)
    assert all(r.parent == "summary" for r in stepless)
    stepped = [r for r in rows if r.step_len > 0]
    assert len(stepped) == 7             # 2+2+3 planning steps
    assert {r.parent for r in stepped} == {"planning_information"}


def test_registry_parsed_key_matches_object_form(spark, store, stats):
    """The parsed key's answer, recomputed through the OBJECT API — the
    two front-ends must agree on the same plan semantics."""
    from graph_database_project_spark.operators.motifq import (
        q_graph_motif_parsed)
    via_obj = match_motif(
        store.nodes, store.edges,
        [NodePat("sb", label="ServiceBulletin"), NodePat("h"),
         NodePat("d"), NodePat("subj")],
        [EdgePat("sb", "h", "HAS_HEADER"),
         EdgePat("h", "d", "HAS_ORIGINAL_ISSUE_DATE"),
         EdgePat("subj", "h", "HAS_SUBJECT", direction="in")],
        label_counts=stats,
    ).select(F.col("sb_docnbr").alias("docnbr"),
             F.col("d_content").alias("issue_date"),
             F.col("subj_content").alias("subject"))
    assert _bindings(q_graph_motif_parsed(spark, SF)) == _bindings(via_obj)


def test_nl_graph_rules_emit_text_patterns(spark, store):
    """The NL layer's pattern rules now go question → MATCH string →
    parse_match (the reference's GPT lifecycle); answers unchanged."""
    from graph_database_project_spark.plans.nl2query import answer_graph
    df = answer_graph(
        spark, store, "Which airplanes are affected by '737-00-1029'?")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].docnbr == "737-00-1029"
    df2 = answer_graph(spark, store, "subject of '737-00-1028'")
    assert "Angle of Attack" in df2.collect()[0].subject


# --- property-based round-trip: render → parse → identical spec -----------

import hypothesis.strategies as st
from hypothesis import given, settings

from graph_database_project_spark.graph.pattern import render_match

_ident = st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True)
_name1 = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)
# a single label/type stays a STRING; a disjunction is a 2-tuple (the
# parser's canonical forms — a 1-tuple would not round-trip)
_label = st.one_of(st.none(), _name1, st.tuples(_name1, _name1))
_val = st.from_regex(r"[A-Za-z0-9 ._-]{1,12}", fullmatch=True)
_dirn = st.sampled_from(["out", "in", "both"])
_hops = st.one_of(st.just((1, 1)),
                  st.tuples(st.integers(1, 3), st.integers(1, 3))
                  .map(lambda t: (min(t), max(t))))


@st.composite
def _specs(draw):
    n = draw(st.integers(2, 5))
    vars_ = [f"v{i}" for i in range(n)]
    nodes = []
    for v in vars_:
        nodes.append(NodePat(
            v, label=draw(_label),
            name=draw(st.one_of(st.none(), _val)),
            docnbr=draw(st.one_of(st.none(), _val)),
            prop=draw(st.one_of(st.none(),
                                st.tuples(_ident, _val)))))
    edges = []
    # spanning chain: edge i binds v_{i+1} to a random earlier variable,
    # so every rendered pattern is connected (the compiler's contract)
    for i in range(1, n):
        lo, hi = draw(_hops)
        edges.append(EdgePat(
            src=draw(st.sampled_from(vars_[:i])), dst=vars_[i],
            rel_type=draw(st.one_of(st.none(), _name1,
                                    st.tuples(_name1, _name1))),
            direction=draw(_dirn), min_hops=lo, max_hops=hi,
            # only the final chain edge may be optional: its dst is then
            # a leaf referenced by exactly that edge (the compiler rule)
            optional=(i == n - 1) and draw(st.booleans())))
    if draw(st.booleans()):
        # a negated edge to a fresh auxiliary variable, appended last
        # (the parser materializes WHERE NOT terms after all clauses)
        aux = "aux0"
        nodes.append(NodePat(aux, label=draw(_label)))
        edges.append(EdgePat(src="v0", dst=aux,
                             rel_type=draw(st.one_of(st.none(), st.just("T"))),
                             direction=draw(st.sampled_from(["out", "in"])),
                             negated=True))
    return nodes, edges


@settings(max_examples=200, deadline=None)
@given(_specs())
def test_render_parse_roundtrip(spec):
    nodes, edges = spec
    text = render_match(nodes, edges)
    parsed = parse_match(text)
    assert set(parsed.node_pats) == set(nodes), text
    assert parsed.edge_pats == edges, text
