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
    # r13 (Cypher WHERE binding): the NOT pattern rides the WHERE of
    # the positive clause — after the OPTIONAL clause it would be a
    # (rejected) match-time pattern predicate
    p = parse_match(
        "MATCH (a:L)-[:T]->(b) WHERE NOT (a)-[:V]->(:M {docnbr: 'z'}) "
        "OPTIONAL MATCH (b)-[:U]->(c) "
        "RETURN DISTINCT a.name")
    kinds = [(e.optional, e.negated) for e in p.edge_pats]
    assert kinds == [(False, False), (False, True), (True, False)]
    neg = next(e for e in p.edge_pats if e.negated)
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
    ("MATCH (a)-[:T*]->(b) RETURN a.id", "unbounded"),
    ("MATCH (a)-[:T*2..]->(b) RETURN a.id", "unbounded"),
    ("MATCH (a)-[:T]->(b) WHERE NOT (a)-[:U]->(x) OR a.id = 1 "
     "RETURN a.id", "anti-/semi-join"),
    ("MATCH (a)-[:T]->(b) WHERE a.id = 1 OR NOT (a)-[:U]->(x) "
     "RETURN a.id", "not allowed"),
    ("MATCH (A)-[:T]->(b) RETURN b.id", "variable"),
    ("MATCH (a {x: 'p', y: 'q'})-[:T]->(b) RETURN a.id", "one non-name"),
    ("MATCH (a)-[:T]->(b) RETURN c.id", "unknown variable"),
    ("MATCH (a)-[:T]->(b) WHERE a.zzz = 'x' RETURN a.id", "not carried"),
    ("MATCH (a)-[:T]->(b) RETURN a AS x", "bare variable"),
    ("MATCH (a:L)-[:T]->(a:M) RETURN a.id", "re-declared"),
    ("MATCH (a {k: 1})-[:T]->(b) RETURN a.id", "quoted"),
    ("MATCH (a)-[:T]->(b) WHERE NOT (a)-[:U]->(c)-[:V]->(d) "
     "RETURN a.id", "single-edge"),
    # --- r12: result modifiers only valid after RETURN ---
    ("MATCH (a)-[:T]->(b) LIMIT 5", "only valid after RETURN"),
    ("MATCH (a)-[:T]->(b) ORDER BY a.id RETURN a.id",
     "only valid after RETURN"),
    ("MATCH (a)-[:T]->(b) RETURN a.id ORDER BY z.name", "output column"),
    ("MATCH (a)-[:T]->(b) RETURN a.name AS an ORDER BY a.id",
     "output column"),
    # --- r12: edge-variable boundaries, all parse-time ---
    ("MATCH (a)-[r:T*1..3]->(b) RETURN a.id", "variable-length"),
    ("MATCH (a)-[r:T]->(b)-[r:U]->(c) RETURN a.id", "collides"),
    ("MATCH (a)-[b:T]->(b) RETURN a.id", "already an edge variable"),
    ("MATCH (a)-[r:T]->(b) RETURN r.name", "rel_type"),
    ("MATCH (a)-[r:T]->(b) WHERE r.name = 'x' RETURN a.id", "rel_type"),
    ("MATCH (a)-[:T]->(b) WHERE NOT (a)-[r:U]->(c) RETURN a.id",
     "binds nothing"),
    # --- r12: negation-only auxiliaries rejected at parse time (ADVICE)
    ("MATCH (a)-[:T]->(b) WHERE NOT (a)-[:U]->(c) RETURN c.name",
     "only inside a NOT"),
    ("MATCH (a)-[:T]->(b) WHERE NOT (a)-[:U]->(c) AND c.name = 'x' "
     "RETURN a.id", "only inside a NOT"),
    ("MATCH (a)-[:T]->(b) WHERE NOT (q)-[:U]->(w) RETURN a.id",
     "anchor"),
    # --- r13: multi-hop OPTIONAL chains are now compiled (all-or-
    # nothing, see test_optional_chain_*); only malformed chains reject,
    # e.g. one anchored on a variable that is not yet bound
    ("OPTIONAL MATCH (b)-[:U]->(c)-[:V]->(d) MATCH (a)-[:T]->(b) "
     "RETURN a.id", "already-bound"),
])
def test_parse_rejects_with_positioned_errors(bad, hint):
    with pytest.raises(PatternSyntaxError) as ei:
        parse_match(bad)
    assert hint.lower().split()[0] in str(ei.value).lower()


def test_parse_edge_variable_accepted():
    """r12 (verdict #4): ``-[r:T]->`` parses, binds r to rel_type."""
    p = parse_match("MATCH (a)-[r:T]->(b) RETURN a.name, r.rel_type")
    assert p.edge_pats == [EdgePat("a", "b", "T", var="r")]
    assert p.edge_vars == ("r",)
    assert ("r", "rel_type", "r_rel_type") in p.returns
    # bare edge variable expands to its one carried field
    p2 = parse_match("MATCH (a)-[r]->(b) RETURN r")
    assert p2.returns == [("r", "rel_type", "r_rel_type")]
    # AS alias on the field form and the bare form
    p3 = parse_match("MATCH (a)-[r]->(b) RETURN r.rel_type AS t, r AS u")
    assert p3.returns == [("r", "rel_type", "t"), ("r", "rel_type", "u")]


def test_parse_refinement_re_mention():
    """ADVICE r11: a predicated re-mention of a previously BARE variable
    refines it (Cypher refinement); bare-after-predicated still re-uses;
    conflicting predicated mentions still reject."""
    p = parse_match("MATCH (a)-[:T]->(b) MATCH (a:L)-[:U]->(c) RETURN a.id")
    assert next(n for n in p.node_pats if n.var == "a").label == "L"
    p2 = parse_match("MATCH (a:L)-[:T]->(b) MATCH (a)-[:U]->(c) "
                     "RETURN a.id")
    assert next(n for n in p2.node_pats if n.var == "a").label == "L"


def test_parse_unescapes_string_literals(spark):
    """ADVICE r11: backslash-escaped quotes in literals are unescaped at
    parse time (property map and WHERE literal positions). (spark: the
    WHERE thunk builds Columns, which need an active session.)"""
    p = parse_match(r"MATCH (a {name: 'it\'s'})-[:T]->(b) "
                    r"WHERE b.name = 'a\\b' RETURN a.id")
    assert next(n for n in p.node_pats if n.var == "a").name == "it's"
    # the WHERE thunk carries the unescaped literal
    s = str(p.where_column())
    assert "a\\b" in s or "a\\\\b" in s  # Column repr escapes once more


def test_parse_clause_groups_tracked():
    # r13 (Cypher WHERE binding): the NOT pattern rides the WHERE of a
    # POSITIVE clause — a WHERE after the OPTIONAL clause would be its
    # match-time predicate, where NOT patterns are rejected
    p = parse_match(
        "MATCH (a)-[:T]->(b), (b)-[:U]->(c) MATCH (c)-[:V]->(d) "
        "WHERE NOT (a)-[:X]->(z) OPTIONAL MATCH (d)-[:W]->(e) "
        "RETURN a.id")
    assert p.clauses == [(0, 1), (2,), (4,)]
    assert p.edge_pats[3].negated  # the NOT edge is in no clause


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


# --- r12: edge variables ----------------------------------------------------

def test_edge_variable_binds_rel_type(tiny):
    nodes, edges = tiny
    rows = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[r]->(b:C) RETURN a.name AS an, r.rel_type AS t"))
    assert rows == [("b1", "S"), ("b2", "S")]
    # WHERE over the edge variable's carried field
    rows2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[r]->(b) WHERE r.rel_type = 'S' RETURN a.name AS an"))
    assert rows2 == [("b1",), ("b2",)]


def test_edge_variable_untyped_per_relationship_multiplicity(spark):
    """An untyped ``-[r]->`` binds one row per distinct type on a pair
    (Cypher's per-relationship multiplicity); without the variable the
    pair collapses to one binding (the documented pair-dedup)."""
    nodes = spark.createDataFrame(
        [(1, ["A"], "a", None, "d", {}), (2, ["B"], "b", None, "d", {})],
        "id long, labels array<string>, name string, content string, "
        "docnbr string, props map<string,string>")
    edges = spark.createDataFrame(
        [(1, 2, "R"), (1, 2, "S"), (1, 2, "S")],
        "src long, dst long, rel_type string")
    with_var = _bindings(match_pattern(
        nodes, edges, "MATCH (a)-[r]->(b) RETURN r"))
    assert with_var == [("R",), ("S",)]
    without = _bindings(match_pattern(
        nodes, edges, "MATCH (a)-[]->(b) RETURN a.name AS an"))
    assert without == [("a",)]


def test_edge_variable_on_optional_and_closing_edges(tiny):
    nodes, edges = tiny
    # optional edge with a variable: NULL rel_type on preserved rows
    rows = _bindings(match_pattern(
        nodes, edges,
        "MATCH (b:B) OPTIONAL MATCH (b)-[r:T]->(z) "
        "RETURN b.name AS bn, r.rel_type AS t"))
    assert rows == [("b1", None), ("b2", None)]
    # closing edge of a cycle with a variable carries the bound type
    rows2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b)-[:S]->(c)-[r]->(a) RETURN a.name AS an, r"))
    assert rows2 == [("a1", "T")]


def test_edge_variable_object_api_matches_text(tiny):
    nodes, edges = tiny
    via_obj = match_motif(
        nodes, edges, [NodePat("a"), NodePat("b", "C")],
        [EdgePat("a", "b", None, var="r")],
    ).select(F.col("a_name").alias("an"), F.col("r_rel_type").alias("t"))
    via_text = match_pattern(
        nodes, edges, "MATCH (a)-[r]->(b:C) RETURN a.name AS an, "
        "r.rel_type AS t")
    assert _bindings(via_obj) == _bindings(via_text)


# --- r12: edge_distinct (Cypher relationship-uniqueness) --------------------

def test_edge_distinct_excludes_same_edge_bindings(tiny):
    """(x:B)-[:S]->(y)<-[:S]-(z:B): homomorphism admits x=z (both
    patterns binding the SAME stored edge); edge_distinct forbids it —
    the one semantic divergence from Cypher, now closed (verdict #3)."""
    nodes, edges = tiny
    text = ("MATCH (x:B)-[:S]->(y), (z:B)-[:S]->(y) "
            "RETURN x.name AS xn, z.name AS zn")
    homo = _bindings(match_pattern(nodes, edges, text))
    assert len(homo) == 4  # (3,3),(3,4),(4,3),(4,4) onto node 5
    dist = _bindings(match_pattern(nodes, edges, text, edge_distinct=True))
    assert dist == [("b1", "b2"), ("b2", "b1")]
    # object API (flat one-clause scoping) agrees
    via_obj = match_motif(
        nodes, edges,
        [NodePat("x", "B"), NodePat("y"), NodePat("z", "B")],
        [EdgePat("x", "y", "S"), EdgePat("z", "y", "S")],
        edge_distinct=True,
    ).select(F.col("x_name").alias("xn"), F.col("z_name").alias("zn"))
    assert _bindings(via_obj) == dist


def test_edge_distinct_scoped_per_match_clause(tiny):
    """Edges in DIFFERENT MATCH clauses may bind the same stored edge —
    Cypher's actual scoping, preserved by the text front-end."""
    nodes, edges = tiny
    two_clauses = ("MATCH (x:B)-[:S]->(y) MATCH (z:B)-[:S]->(y) "
                   "RETURN x.name AS xn, z.name AS zn")
    rows = _bindings(match_pattern(nodes, edges, two_clauses,
                                   edge_distinct=True))
    assert len(rows) == 4  # no uniqueness across clauses


def test_edge_distinct_type_disjoint_pairs_unconstrained(tiny):
    """Type-disjoint edge patterns can never bind the same stored edge —
    no predicate is emitted (edge_distinct_where returns None)."""
    from graph_database_project_spark.graph.motif import edge_distinct_where
    assert edge_distinct_where(
        [EdgePat("a", "b", "R"), EdgePat("b", "c", "S")]) is None
    assert edge_distinct_where([EdgePat("a", "b", "R")]) is None
    # overlapping disjunctions DO constrain
    assert edge_distinct_where(
        [EdgePat("a", "b", ("R", "S")), EdgePat("b", "c", "S")]) is not None
    nodes, edges = tiny
    text = ("MATCH (a:A)-[:R]->(b)-[:S]->(c) "
            "RETURN a.name AS an, c.name AS cn")
    assert _bindings(match_pattern(nodes, edges, text)) == \
        _bindings(match_pattern(nodes, edges, text, edge_distinct=True))


def test_edge_distinct_undirected_unordered_compare(tiny):
    """With an undirected pattern the storage orientation of the bound
    edge is unobservable — the predicate compares endpoint tuples
    UNORDERED, so walking the single T edge forward-then-back is
    excluded."""
    nodes, edges = tiny
    text = ("MATCH (x)-[:T]-(y)-[:T]-(z) "
            "RETURN x.name AS xn, y.name AS yn, z.name AS zn")
    homo = _bindings(match_pattern(nodes, edges, text))
    assert len(homo) == 2  # 5-1-5 and 1-5-1, same edge twice
    assert _bindings(
        match_pattern(nodes, edges, text, edge_distinct=True)) == []


def test_edge_distinct_varlength_raises(tiny):
    from graph_database_project_spark.graph.motif import edge_distinct_where
    with pytest.raises(ValueError, match="variable-length"):
        edge_distinct_where(
            [EdgePat("a", "b", "R", min_hops=1, max_hops=3),
             EdgePat("b", "c", "R")])


def test_render_escapes_quotes_roundtrip():
    """ADVICE r11: render_match escapes quotes/backslashes so a NodePat
    value containing them round-trips through text."""
    from graph_database_project_spark.graph.pattern import render_match
    nodes = [NodePat("a", name="it's", prop=("k", "a\\b")),
             NodePat("b", docnbr="x'y")]
    edges = [EdgePat("a", "b", "T")]
    text = render_match(nodes, edges)
    parsed = parse_match(text)
    assert set(parsed.node_pats) == set(nodes), text
    assert parsed.edge_pats == edges


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
    # r12b: the aggregate-threshold question emits a WITH pipeline
    df3 = answer_graph(
        spark, store, "which description nodes have at least 2 "
        "outgoing links?")
    rows = [(r.docnbr, r.name, r.out_deg) for r in df3.collect()]
    assert rows == [("737-00-1028", "description", 3),
                    ("737-00-1029", "description", 4),
                    ("737-00-1030", "description", 3)]
    # r12b: the distance question emits shortestPath text
    df4 = answer_graph(
        spark, store, "how far is '737-00-1029' from its effectivity?")
    rows4 = [(r.name, r.hops) for r in df4.collect()]
    assert rows4 and all(n == "effectivity" for n, _ in rows4)
    assert min(h for _, h in rows4) >= 2  # root -> planning -> eff


# --- property-based round-trip: render → parse → identical spec -----------

import hypothesis.strategies as st
from hypothesis import given, settings

from graph_database_project_spark.graph.pattern import render_match

_ident = st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True)
_name1 = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)
# a single label/type stays a STRING; a disjunction is a 2-tuple (the
# parser's canonical forms — a 1-tuple would not round-trip)
_label = st.one_of(st.none(), _name1, st.tuples(_name1, _name1))
# r12: values may contain quotes/backslashes — render escapes, parse
# unescapes (the ADVICE escaping fix, property-tested here)
_val = st.from_regex(r"[A-Za-z0-9 ._'\\-]{1,12}", fullmatch=True)
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
            optional=(i == n - 1) and draw(st.booleans()),
            # r12: edge variables render/parse too (single-hop only)
            var=f"r{i}" if (lo, hi) == (1, 1) and draw(st.booleans())
            else None))
    if draw(st.booleans()) and any(not e.optional for e in edges):
        # a negated edge to a fresh auxiliary variable — only when a
        # positive clause exists (r13: WHERE NOT cannot render after a
        # lone OPTIONAL clause, whose WHERE is match-time)
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
    # r13: render places WHERE NOT before trailing OPTIONAL clauses (a
    # WHERE after an OPTIONAL MATCH is its match-time predicate), so
    # edge ORDER may differ from the spec's — compare as multisets
    # (order affects join sequencing, never semantics)
    assert sorted(map(repr, parsed.edge_pats)) == \
        sorted(map(repr, edges)), text


def test_catalog_label_injection_on_terse_patterns(spark, store, stats):
    """r12 (verdict #8): unlabeled GPT-shaped pattern text gets provable
    catalog labels injected (inject_labels via rel_signatures), turning
    the label_counts broadcast hints on by default — measured as an
    exchange-count drop vs the same terse text compiled bare, with
    identical answers."""
    import re
    from graph_database_project_spark.graph.pattern import inject_labels
    from graph_database_project_spark.plans.nl2query import (
        _catalog_rel_signatures)

    sigs = _catalog_rel_signatures(spark, store)
    terse = ("MATCH (sb)-[:HAS_HEADER]->(h)-[:HAS_SUBJECT]->(s) "
             "RETURN sb.docnbr AS docnbr, s.content AS subject")
    spec = parse_match(terse)
    pats, n = inject_labels(spec.node_pats, spec.edge_pats, sigs)
    assert n == 3
    assert {p.var: p.label for p in pats} == {
        "sb": "ServiceBulletin", "h": "header", "s": "subject"}
    bare = match_pattern(store.nodes, store.edges, terse)
    good = match_pattern(store.nodes, store.edges, terse,
                         rel_signatures=sigs, label_counts=stats)

    def n_exchanges(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"Exchange hashpartitioning", p))

    nb, ng = n_exchanges(bare), n_exchanges(good)
    assert ng < nb, (nb, ng)  # the injected labels ARE the plan lever
    assert _bindings(good) == _bindings(bare)  # semantics preserved


def test_injection_skips_ambiguous_and_labeled(spark, store):
    """Injection must stay semantics-preserving: already-labeled
    variables keep their labels; rel_types without a UNIQUE signature
    are pre-filtered out of the signature dict entirely."""
    from graph_database_project_spark.graph.motif import EdgePat, NodePat
    from graph_database_project_spark.graph.pattern import inject_labels
    from graph_database_project_spark.plans.nl2query import (
        _catalog_rel_signatures)

    sigs = _catalog_rel_signatures(spark, store)
    # IS_PART_OF / included_in span many label pairs in the corpus —
    # they must not appear in the unique-signature dict
    multi = {r.rel_type for r in
             store.catalog_relationships().groupBy("rel_type").count()
             .filter("count > 1").collect()}
    assert not (multi & set(sigs))
    pats, n = inject_labels(
        [NodePat("a", label="Airplane"), NodePat("b")],
        [EdgePat("a", "b", "HAS_HEADER")], sigs)
    # a keeps its (even "wrong") explicit label — never overwritten
    assert next(p for p in pats if p.var == "a").label == "Airplane"
    assert next(p for p in pats if p.var == "b").label == "header"
    assert n == 1


# --- r12: RETURN aggregates (implicit grouping) -----------------------------

def test_return_aggregates_parse_shapes():
    p = parse_match(
        "MATCH (ln:L)-[:T]->(a:M) RETURN a.docnbr AS d, "
        "count(DISTINCT ln.name) AS n, count(*) AS nb, min(ln.name)")
    assert p.returns == [("ln", None, "ln")] or True  # see below
    # precise: one key item + three aggregates
    assert p.returns == [("a", "docnbr", "d")]
    assert p.aggregates == [
        ("count", "ln", "name", True, "n"),
        ("count", None, None, False, "nb"),
        ("min", "ln", "name", False, "min_ln_name")]
    # count(v) defaults to the id field; edge var to rel_type
    p2 = parse_match("MATCH (a)-[r]->(b) RETURN count(b), count(r)")
    assert p2.aggregates == [
        ("count", "b", "id", False, "count_b_id"),
        ("count", "r", "rel_type", False, "count_r_rel_type")]


@pytest.mark.parametrize("bad,hint", [
    ("MATCH (a)-[:T]->(b) RETURN sum(a.name)", "numeric"),
    ("MATCH (a)-[:T]->(b) RETURN min(DISTINCT a.name)", "count only"),
    ("MATCH (a)-[:T]->(b) RETURN count(z)", "unknown"),
    ("MATCH (a)-[:T]->(b) WHERE NOT (a)-[:U]->(c) RETURN count(c)",
     "only inside a NOT"),
    ("MATCH (a)-[:T]->(b) RETURN avg(*)", "count"),
])
def test_return_aggregate_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError) as ei:
        parse_match(bad)
    assert hint.lower().split()[0] in str(ei.value).lower()


def test_return_aggregates_implicit_grouping_semantics(tiny):
    """The text form's groupBy must equal the hand-built one."""
    nodes, edges = tiny
    via_text = match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "RETURN b.docnbr AS d, count(*) AS n, min(a.name) AS mn")
    via_obj = (match_motif(
        nodes, edges, [NodePat("a", "A"), NodePat("b", "B")],
        [EdgePat("a", "b", "R")])
        .groupBy(F.col("b_docnbr").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("a_name").alias("mn")))
    assert _bindings(via_text) == _bindings(via_obj)
    # all-aggregate RETURN: the global 1-row aggregate
    rows = _bindings(match_pattern(
        nodes, edges, "MATCH (a)-[:S]->(b) RETURN count(*) AS n, "
        "count(DISTINCT b.name) AS nb"))
    assert rows == [(2, 1)]  # edges 3->5 and 4->5, one distinct dst


# --- r12: ORDER BY / SKIP / LIMIT -------------------------------------------

def test_parse_result_modifiers():
    p = parse_match(
        "MATCH (a:L)-[:T]->(b) RETURN a.docnbr AS d, b.name "
        "ORDER BY a.docnbr DESC, b_name SKIP 2 LIMIT 3")
    # a.docnbr maps through its alias; b.name has the default alias
    assert p.order_by == [("d", False), ("b_name", True)]
    assert (p.skip, p.limit) == (2, 3)
    # aggregates order by their alias
    p2 = parse_match("MATCH (a)-[:T]->(b) RETURN b.docnbr AS d, "
                     "count(*) AS n ORDER BY n DESC LIMIT 1")
    assert p2.order_by == [("n", False)] and p2.limit == 1


def test_result_modifiers_semantics(tiny):
    nodes, edges = tiny
    got = [tuple(r) for r in match_pattern(
        nodes, edges,
        "MATCH (a:A|B|C) MATCH (a)-[:R|S|T]->(x) "
        "RETURN a.name AS an, x.name AS xn "
        "ORDER BY an DESC, xn SKIP 1 LIMIT 2").collect()]
    twin = (match_pattern(
        nodes, edges,
        "MATCH (a:A|B|C) MATCH (a)-[:R|S|T]->(x) "
        "RETURN a.name AS an, x.name AS xn")
        .orderBy(F.col("an").desc(), "xn").offset(1).limit(2))
    assert got == [tuple(r) for r in twin.collect()]
    assert len(got) == 2


# --- r12b: WITH pipeline stages ---------------------------------------------

def test_parse_with_stage_structure():
    p = parse_match(
        "MATCH (ln:L)-[:T]->(a:M) "
        "WITH ln, count(DISTINCT a.docnbr) AS nd WHERE nd >= 2 "
        "MATCH (ln)-[:T]->(b:M) "
        "RETURN ln.name AS line, nd, count(*) AS nb ORDER BY line")
    assert len(p.stages) == 1
    st = p.stages[0]
    assert st.items == [("ln", None, "ln")]
    assert st.aggregates == [("count", "a", "docnbr", True, "nd")]
    assert len(st.post_where) == 1 and st.join_vars == ("ln",)
    assert st.edge_pats == [EdgePat("ln", "b", "T")]
    # the flat fields stay stage-0's pattern + the FINAL projection
    assert p.edge_pats == [EdgePat("ln", "a", "T")]
    assert p.returns == [("ln", "name", "line"), (None, "nd", "nd")]
    assert p.aggregates == [("count", None, None, False, "nb")]
    assert p.order_by == [("line", True)]


def test_parse_with_multi_stage_and_carried_cols():
    p = parse_match(
        "MATCH (a:A)-[:T]->(b) WITH a, count(b) AS c "
        "WITH a.name AS nm, c WHERE c > 1 RETURN nm, sum(c) AS tot")
    assert len(p.stages) == 2
    assert p.stages[1].items == [("a", "name", "nm"), (None, "c", "c")]
    assert p.stages[1].edge_pats == []
    # aggregate over a carried column in the final RETURN
    assert p.aggregates == [("sum", None, "c", False, "tot")]


@pytest.mark.parametrize("bad,hint", [
    # out-of-scope after WITH (Cypher's scoping rule, positioned)
    ("MATCH (a)-[:T]->(b) WITH a RETURN b.name", "unknown variable"),
    ("MATCH (a)-[:T]->(b) WITH a.name AS n WHERE a.id = 1 RETURN n",
     "output column"),
    # WITH grammar boundaries
    ("MATCH (a)-[:T]->(b) WITH * RETURN a.name", "not supported"),
    ("MATCH (a)-[:T]->(b) WITH a, count(b) AS c", "must end with RETURN"),
    ("MATCH (a)-[:T]->(b) WITH a MATCH (c)-[:U]->(d) RETURN a.name",
     "re-anchor"),
    ("MATCH (a)-[:T]->(b) WITH a MATCH (a:L)-[:U]->(c) RETURN c.name",
     "carried variable"),
    ("MATCH (a)-[:T]->(b) WITH a, count(b) AS c "
     "WHERE NOT (a)-[:U]->(x) RETURN c", "not allowed"),
    ("MATCH (a)-[:T]->(b) WITH a WHERE q > 1 RETURN a.name",
     "output column"),
    ("MATCH (a)-[:T]->(b) WITH a "
     "WHERE NOT (a)-[:U]->(x) RETURN a.name", "not allowed"),
    # a stage WHERE may carry a NOT only when the stage has its own
    # positive MATCH edge to anchor on
    ("MATCH (a)-[:T]->(b) WITH a MATCH (a) "
     "WHERE NOT (a)-[:U]->(x) RETURN a.name", "positive MATCH"),
    # ... and a NOT whose anchor was never re-mentioned in the stage is
    # flagged as negation-only (it binds nothing in the stage's motif)
    ("MATCH (a)-[:T]->(b) WITH a WHERE a_id > 0 "
     "WHERE NOT (a)-[:U]->(x) RETURN a.name", "anchor"),
    # a variable name may not collide with a carried column
    ("MATCH (a)-[:T]->(b) WITH b.name AS c MATCH (b)-[:U]->(d) "
     "RETURN c", "re-anchor"),
    ("MATCH (a)-[:T]->(b) WITH a, b.name AS c MATCH (a)-[:U]->(c) "
     "RETURN c.name", "collides"),
])
def test_parse_with_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError) as ei:
        parse_match(bad)
    assert hint.lower().split()[0] in str(ei.value).lower()


def test_with_having_equals_hand_built(tiny):
    """WITH + trailing WHERE + re-anchored MATCH ≡ the groupBy/filter/
    join twin built by hand on the same motif output."""
    nodes, edges = tiny
    via_text = match_pattern(
        nodes, edges,
        "MATCH (x)-[:S]->(c:C) WITH c, count(x) AS nin WHERE nin >= 2 "
        "MATCH (c)-[:T]->(y) RETURN c.name AS cn, nin, y.name AS yn")
    base = match_motif(nodes, edges, [NodePat("x"), NodePat("c", "C")],
                       [EdgePat("x", "c", "S")])
    agg = (base.groupBy("c_id", "c_name", "c_content", "c_docnbr")
           .agg(F.count("x_id").alias("nin")).filter("nin >= 2"))
    hop = match_motif(nodes, edges, [NodePat("c", "C"), NodePat("y")],
                      [EdgePat("c", "y", "T")])
    twin = (agg.join(hop.drop("c_name", "c_content", "c_docnbr"), "c_id")
            .select(F.col("c_name").alias("cn"), "nin",
                    F.col("y_name").alias("yn")))
    assert _bindings(via_text) == _bindings(twin)
    assert _bindings(via_text) == [("c1", 2, "a1")]


def test_with_projection_only_and_second_aggregation(tiny):
    """A WITH with no follow-on MATCH + a second aggregation level over
    the carried column (count-of-counts shape)."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A|B)-[:R|S]->(b) WITH b.docnbr AS d, count(*) AS n "
        "RETURN min(d) AS mind, sum(n) AS total"))
    # R: 1->3, 2->4; S: 3->5, 4->5 -> groups d1:3 rows, d2:1 row
    assert got == [("d1", 4)]


def test_with_boundary_modifiers_clause_order(tiny):
    """ORDER BY/SKIP/LIMIT at the boundary run BEFORE its trailing
    WHERE (the grammar's clause order)."""
    nodes, edges = tiny
    # all 5 edges -> DISTINCT src names, order desc, limit 3 keeps
    # c1,b2,b1; the trailing WHERE then drops c1
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (s)-[]->(t) WITH DISTINCT s.name AS sn "
        "ORDER BY sn DESC LIMIT 3 WHERE sn <> 'c1' RETURN sn"))
    assert got == [("b1",), ("b2",)]


def test_with_carried_edge_var_and_alias_scoping(tiny):
    nodes, edges = tiny
    # bare-carried edge var stays usable as r.rel_type downstream
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[r]->(b) WITH r, count(*) AS n "
        "RETURN r.rel_type AS t, n ORDER BY t"))
    assert got == [("R", 2), ("S", 2), ("T", 1)]
    # aliased carry is a plain column; the old name is out of scope
    with pytest.raises(PatternSyntaxError):
        parse_match("MATCH (a)-[r]->(b) WITH r AS u, count(*) AS n "
                    "RETURN r.rel_type, n")


# --- r12b: shortestPath distance semantics ----------------------------------

def test_parse_shortestpath_shapes():
    p = parse_match("MATCH p = shortestPath((a:A)-[:T*1..4]->(b:B)) "
                    "RETURN a.name, length(p) AS hops")
    ep = p.edge_pats[0]
    assert (ep.path_var, ep.min_hops, ep.max_hops, ep.rel_type) == \
        ("p", 1, 4, "T")
    assert ("p", "len", "hops") in p.returns
    # default alias + aggregate over length + WHERE on length
    p2 = parse_match("MATCH q = shortestPath((a)-[*2]->(b)) "
                     "WHERE length(q) >= 2 "
                     "RETURN length(q), min(length(q)) AS m")
    assert ("q", "len", "length_q") in p2.returns
    assert ("min", "q", "len", False, "m") in p2.aggregates
    assert len(p2.where_fn) == 1


@pytest.mark.parametrize("bad,hint", [
    ("MATCH p = shortestPath((a)-[*]->(b)) RETURN length(p)",
     "unbounded"),
    ("MATCH shortestPath((a)-[*1..2]->(b)) RETURN a.id",
     "path variable"),
    ("MATCH p = shortestPath((a)-[*1..2]->(b)-[:T]->(c)) "
     "RETURN length(p)", "single"),
    ("MATCH p = shortestPath((a)-[r*1..2]->(b)) RETURN length(p)",
     "variable-length"),
    ("MATCH (a)-[:T]->(b) RETURN length(q)", "in-scope"),
    ("MATCH p = shortestPath((a)-[*1..2]->(b)) RETURN p",
     "no bare projection"),
    ("OPTIONAL MATCH p = shortestPath((a)-[*1..2]->(b)) "
     "RETURN length(p)", "OPTIONAL"),
    ("MATCH (a)-[:T]->(b) WHERE NOT p = shortestPath((a)-[*1..2]->(c)) "
     "RETURN a.id", "NOT"),
    ("MATCH p = shortestPath((a)-[*1..2]->(b)), (p)-[:T]->(c) "
     "RETURN length(p)", "already a path"),
])
def test_parse_shortestpath_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError) as ei:
        parse_match(bad)
    assert hint.lower().split()[0] in str(ei.value).lower()


def test_shortestpath_distances(tiny):
    """BFS distances on the known tiny graph, including the cycle back
    to the seed; WHERE length + WITH carry compose."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH p = shortestPath((a:A {name: 'a1'})-[*1..4]->(x)) "
        "RETURN x.name AS xn, length(p) AS hops ORDER BY hops, xn"))
    assert got == [("a1", 3), ("b1", 1), ("c1", 2)]
    # min_hops=2 floor: the direct neighbor's admissible length is the
    # shortest path of >= 2 edges
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH p = shortestPath((a:A {name: 'a1'})-[*2..4]->(x)) "
        "RETURN x.name AS xn, length(p) AS hops"))
    assert ("c1", 2) in got2 and all(h >= 2 for _, h in got2)
    # WITH carries length(p) as a plain column
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH p = shortestPath((a:A {name: 'a1'})-[*1..4]->(x)) "
        "WITH x, length(p) AS d WHERE d <= 2 "
        "MATCH (x)-[]->(y) RETURN x.name AS xn, d, y.name AS yn"))
    assert got3 == [("b1", 1, "c1"), ("c1", 2, "a1")]


def test_render_shortestpath_round_trip():
    from graph_database_project_spark.graph.pattern import render_match
    nodes = [NodePat("a", label="L"), NodePat("b")]
    edges = [EdgePat("a", "b", "T", min_hops=1, max_hops=3, path_var="p")]
    txt = render_match(nodes, edges)
    assert "p = shortestPath(" in txt
    p = parse_match(txt + " RETURN length(p)")
    assert p.edge_pats == edges and set(p.node_pats) == set(nodes)


# --- property-based: WITH pipelines vs a pure-Python evaluator -------------

from hypothesis import HealthCheck

_wp_label = st.sampled_from([None, "A", "B"])
_wp_type = st.sampled_from(["R", "S"])


@st.composite
def _with_cases(draw):
    n = draw(st.integers(3, 7))
    edges = draw(st.sets(st.tuples(st.integers(1, n), st.integers(1, n),
                                   _wp_type), min_size=2, max_size=14))
    return dict(
        n=n, edges=sorted(edges),
        l1=draw(_wp_label), l2=draw(_wp_label),
        t1=draw(_wp_type),
        dist=draw(st.booleans()),      # count(DISTINCT y.docnbr) vs count(y)
        k=draw(st.sampled_from([None, 1, 2])),     # post-WHERE threshold
        t2=draw(st.sampled_from([None, "R", "S"])),  # second-stage MATCH
    )


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_with_cases())
def test_with_pipeline_matches_python_evaluator(spark, case):
    """Random graph + random staged query: the WITH compile must equal
    a direct set-semantics evaluation (pair-dedup per edge pattern,
    implicit grouping, post-WHERE, re-anchored join, final count)."""
    n, edges = case["n"], case["edges"]
    lab = {i: ("A" if i % 2 else "B") for i in range(1, n + 1)}
    nodes_df = spark.createDataFrame(
        [(i, [lab[i]], f"n{i}", None, f"d{i % 3}", {})
         for i in range(1, n + 1)],
        "id long, labels array<string>, name string, content string, "
        "docnbr string, props map<string,string>")
    edges_df = spark.createDataFrame(
        edges, "src long, dst long, rel_type string")

    def ok(i, want):
        return want is None or lab[i] == want

    # stage 0: distinct (x, y) pairs of type t1 with label predicates
    pairs = sorted({(s, d) for s, d, t in edges
                    if t == case["t1"] and ok(s, case["l1"])
                    and ok(d, case["l2"])})
    agg: dict[int, int] = {}
    for s, d in pairs:
        agg.setdefault(s, set()).add(d)
    c_of = {s: (len({f"d{d % 3}" for d in ds}) if case["dist"]
                else len(ds))
            for s, ds in agg.items()}
    if case["k"] is not None:
        c_of = {s: c for s, c in c_of.items() if c >= case["k"]}
    if case["t2"] is None:
        expect = sorted((f"n{s}", c) for s, c in c_of.items())
    else:
        expect = []
        for s, c in c_of.items():
            zs = {d for s2, d, t in edges if s2 == s and t == case["t2"]}
            if zs:
                expect.append((f"n{s}", c, len(zs)))
        expect.sort()

    l1 = f":{case['l1']}" if case["l1"] else ""
    l2 = f":{case['l2']}" if case["l2"] else ""
    cnt = "count(DISTINCT y.docnbr)" if case["dist"] else "count(y)"
    q = (f"MATCH (x{l1})-[:{case['t1']}]->(y{l2}) "
         f"WITH x, {cnt} AS c ")
    if case["k"] is not None:
        q += f"WHERE c >= {case['k']} "
    if case["t2"] is None:
        q += "RETURN x.name AS xn, c ORDER BY xn"
    else:
        q += (f"MATCH (x)-[:{case['t2']}]->(z) "
              "RETURN x.name AS xn, c, count(z) AS nz ORDER BY xn")
    got = [tuple(r) for r in
           match_pattern(nodes_df, edges_df, q).collect()]
    assert got == expect, (q, got, expect)


def test_edge_distinct_scoped_per_stage_clause(tiny):
    """Cypher scopes relationship-uniqueness PER MATCH clause: two
    same-type edges in ONE clause may not bind the same stored edge,
    but the same pattern split across a WITH boundary may."""
    nodes, edges = tiny
    one_clause = match_pattern(
        nodes, edges,
        "MATCH (x)-[:S]->(c), (y)-[:S]->(c) "
        "RETURN x.name AS xn, y.name AS yn", edge_distinct=True)
    # edges 3->5 and 4->5: uniqueness forbids x=y, keeps the two
    # ordered cross pairs
    assert _bindings(one_clause) == [("b1", "b2"), ("b2", "b1")]
    split = match_pattern(
        nodes, edges,
        "MATCH (x)-[:S]->(c) WITH x, c MATCH (y)-[:S]->(c) "
        "RETURN x.name AS xn, y.name AS yn", edge_distinct=True)
    # across stages the same stored edge may bind both patterns —
    # the x=y diagonal comes back (Cypher's own scoping)
    assert _bindings(split) == [("b1", "b1"), ("b1", "b2"),
                                ("b2", "b1"), ("b2", "b2")]


def test_with_global_aggregate_stage(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WITH count(*) AS total "
        "RETURN total"))
    assert got == [(5,)]
    # a MATCH after an all-aggregate WITH has nothing to re-anchor on
    with pytest.raises(PatternSyntaxError) as ei:
        parse_match("MATCH (a)-[:R]->(b) WITH count(*) AS total "
                    "MATCH (c)-[:S]->(d) RETURN total")
    assert "re-anchor" in str(ei.value)


# --- r12b: string / null predicates ----------------------------------------

def test_string_predicates_semantics(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WHERE a.name STARTS WITH 'a' "
        "AND b.name CONTAINS '1' RETURN a.name AS an, b.name AS bn"))
    assert got == [("a1", "b1")]
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R]->(b) WHERE b.name ENDS WITH '2' "
        "RETURN b.name AS bn"))
    assert got2 == [("b2",)]
    # r13: a WHERE after the OPTIONAL clause is MATCH-TIME (Cypher's
    # binding): no :C named-NULL node exists, so nothing matches and
    # every anchor row is preserved NULL-filled
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b) OPTIONAL MATCH (b)-[:T]->(c) "
        "WHERE c.name IS NULL RETURN a.name AS an"))
    assert got3 == [("a1",), ("a2",)]  # all anchors preserved
    got4 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:B)-[:S]->(b) OPTIONAL MATCH (b)-[:T]->(c) "
        "WHERE c.name IS NOT NULL RETURN DISTINCT c.name AS cn"))
    assert got4 == [("a1",)]  # c1's T edge goes to a1
    # the POST-FILTER idiom (keep only rows WITHOUT the optional edge)
    # is Cypher's WITH ... WHERE form
    got4b = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) OPTIONAL MATCH (b)-[:T]->(c) "
        "WITH a, b.name AS bn, c.name AS cn WHERE cn IS NULL "
        "MATCH (a)-[:R]->(x:B) RETURN a.name AS an, bn"))
    assert got4b == [("a1", "b1"), ("a2", "b2")]  # no B has a T edge
    # in a WITH's trailing WHERE over an output column
    got5 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WITH a.name AS an, count(*) AS n "
        "WHERE an STARTS WITH 'b' RETURN an, n ORDER BY an"))
    assert got5 == [("b1", 1), ("b2", 1)]


@pytest.mark.parametrize("bad,hint", [
    ("MATCH (a)-[:T]->(b) WHERE a.name STARTS 'x' RETURN a.id", "WITH"),
    ("MATCH (a)-[:T]->(b) WHERE a.name CONTAINS b.name RETURN a.id",
     "quoted string"),
    ("MATCH (a)-[:T]->(b) WHERE a.name IS 'x' RETURN a.id", "NULL"),
])
def test_string_predicate_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError) as ei:
        parse_match(bad)
    assert hint.lower().split()[0] in str(ei.value).lower()


def test_in_list_predicate(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WHERE a.name IN ['a1', 'c1'] "
        "RETURN a.name AS an, b.name AS bn ORDER BY an, bn"))
    assert got == [("a1", "b1"), ("c1", "a1")]
    # numeric list over ids; also valid after a WITH boundary
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WITH a.id AS i, count(*) AS n "
        "WHERE i IN [1, 5] RETURN i, n ORDER BY i"))
    assert got2 == [(1, 1), (5, 1)]
    with pytest.raises(PatternSyntaxError) as ei:
        parse_match("MATCH (a)-[:T]->(b) WHERE a.name IN [c.name] "
                    "RETURN a.id")
    assert "literal" in str(ei.value)


# --- r12b: OR + grouped predicates ------------------------------------------

def test_where_or_and_precedence(tiny):
    nodes, edges = tiny
    # plain OR
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WHERE a.name = 'a1' OR a.name = 'c1' "
        "RETURN a.name AS an, b.name AS bn ORDER BY an"))
    assert got == [("a1", "b1"), ("c1", "a1")]
    # AND binds tighter: x OR (y AND z)
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WHERE a.name = 'c1' "
        "OR a.name STARTS WITH 'b' AND b.name = 'c1' "
        "RETURN a.name AS an, b.name AS bn ORDER BY an, bn"))
    assert got2 == [("b1", "c1"), ("b2", "c1"), ("c1", "a1")]
    # parens flip it: (x OR starts-b) AND b=c1
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WHERE (a.name = 'c1' "
        "OR a.name STARTS WITH 'b') AND b.name = 'c1' "
        "RETURN a.name AS an ORDER BY an"))
    assert got3 == [("b1",), ("b2",)]
    # NOT pattern still composes as a top-level conjunct next to an OR
    got4 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S]->(b) WHERE NOT (b)-[:T]->(x) "
        "AND (a.name = 'a1' OR a.name = 'a2') "
        "RETURN a.name AS an, b.name AS bn ORDER BY an"))
    # T edges: 5->1 only, so b=5 (c1) is excluded; R edges keep b1/b2
    assert got4 == [("a1", "b1"), ("a2", "b2")]
    # OR in a WITH's trailing WHERE
    got5 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WITH a.name AS an, count(*) AS n "
        "WHERE an = 'a1' OR an = 'c1' RETURN an, n ORDER BY an"))
    assert got5 == [("a1", 1), ("c1", 1)]


def test_case_folding_wrappers(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WHERE toUpper(a.name) STARTS WITH 'A' "
        "RETURN a.name AS an, b.name AS bn ORDER BY an"))
    assert got == [("a1", "b1"), ("a2", "b2")]
    # on both sides of a comparison
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) "
        "WHERE toLower(a.name) = toLower(b.name) RETURN a.name AS an"))
    assert got2 == []  # no self-named pairs in the tiny graph
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:C)-[:T]->(b) WHERE toUpper(b.name) = 'A1' "
        "RETURN b.name AS bn"))
    assert got3 == [("a1",)]


# --- r13 ADVICE fixes: parse-time guards ---------------------------------

@pytest.mark.parametrize("bad,hint", [
    # a NEW stage variable whose derived carry column collides with a
    # carried alias — the stage join would silently keep the carried copy
    ("MATCH (a:A)-[:R]->(b) WITH a, b.name AS p_name "
     "MATCH (a)-[:R]->(p) RETURN p_name",
     "carry column"),
    # same trap through an edge variable's <var>_rel_type column
    ("MATCH (a:A)-[:R]->(b) WITH a, b.name AS r_rel_type "
     "MATCH (a)-[r:R]->(p) RETURN r_rel_type",
     "r_rel_type collides"),
    # and through a path variable's <var>_len distance column
    ("MATCH (a:A)-[:R]->(b) WITH a, b.name AS q_len "
     "MATCH q = shortestPath((a)-[:R*1..2]->(z)) RETURN q_len",
     "q_len collides"),
], ids=["node-carry-col", "edge-var-col", "path-var-col"])
def test_stage_carry_column_collisions_rejected(bad, hint):
    with pytest.raises(PatternSyntaxError, match=hint):
        parse_match(bad)


def test_stage_carry_collision_would_have_been_wrong(tiny):
    """The semantic differentiator behind the parse reject: before the
    guard, the carried alias shadowed the motif's column — the query ran
    and returned the CARRIED value under the new variable's name."""
    nodes, edges = tiny
    # the non-colliding spelling works and returns the motif-side name
    ok = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b) WITH a, b.name AS bname "
        "MATCH (a)-[:R]->(p) RETURN a.name AS an, bname, p.name AS pn"))
    assert ok == [("a1", "b1", "b1"), ("a2", "b2", "b2")]


@pytest.mark.parametrize("bad,hint", [
    # single-node MATCH after WITH: predicate would be silently discarded
    ("MATCH (a:A)-[:R]->(b) WITH a MATCH (c:B) RETURN a.name",
     "has no edge"),
    # bare re-anchor with no edge is equally dead
    ("MATCH (a:A)-[:R]->(b) WITH a MATCH (a) RETURN a.name",
     "has no edge"),
    # a second WHERE after the boundary's own trailing WHERE, with no
    # MATCH — the stage where_fn would be silently dropped
    ("MATCH (a:A)-[:R]->(b) WITH a, count(b) AS c WHERE c > 0 "
     "WHERE c > 1 RETURN c",
     "has no edge"),
], ids=["single-node", "bare-reanchor", "dangling-where"])
def test_edgeless_stage_rejected(bad, hint):
    with pytest.raises(PatternSyntaxError, match=hint):
        parse_match(bad)


@pytest.mark.parametrize("bad,hint", [
    ("MATCH (a:A)-[:R]->(b) RETURN a.name AS x, b.name AS x",
     "duplicate output column 'x'"),
    # a bare variable's expanded carry columns collide with an alias
    ("MATCH (a:A)-[:R]->(b) RETURN a, b.name AS a_name",
     "duplicate output column 'a_name'"),
    # at a WITH boundary: bare-carried a expands to a_id + the aggregate
    ("MATCH (a:A)-[:R]->(b) WITH a, count(b) AS a_id "
     "MATCH (a)-[:R]->(p) RETURN a_id",
     "duplicate output column 'a_id'"),
    # two bare mentions of the same variable
    ("MATCH (a:A)-[:R]->(b) RETURN a, a",
     "duplicate output column 'a_id'"),
], ids=["alias-alias", "bare-vs-alias", "with-boundary", "bare-bare"])
def test_duplicate_output_columns_rejected(bad, hint):
    with pytest.raises(PatternSyntaxError, match=hint):
        parse_match(bad)


# --- r13: collect() list aggregate ---------------------------------------

def test_parse_collect_shapes():
    p = parse_match(
        "MATCH (a:A)-[:R]->(b:B) "
        "RETURN a.name AS an, collect(b.name) AS bs, "
        "collect(DISTINCT b.docnbr) AS docs")
    assert ("collect", "b", "name", False, "bs") in p.aggregates
    assert ("collect", "b", "docnbr", True, "docs") in p.aggregates
    # a bare NODE variable collects the WHOLE node (r14) — the
    # '__node__' sentinel renders one 'id:name' cell per node (before
    # r14 this silently collapsed to collect(b.id))
    p2 = parse_match("MATCH (a:A)-[:R]->(b) RETURN collect(b)")
    assert p2.aggregates == [("collect", "b", "__node__", False,
                              "collect_b")]
    # collect over an edge variable's rel_type and a path distance
    p3 = parse_match("MATCH (a)-[r]->(b) RETURN a.name, collect(r)")
    assert p3.aggregates == [
        ("collect", "r", "rel_type", False, "collect_r_rel_type")]
    p4 = parse_match(
        "MATCH q = shortestPath((a:A)-[:R*1..2]->(b)) "
        "RETURN a.name, collect(length(q)) AS ls")
    assert p4.aggregates == [("collect", "q", "len", False, "ls")]


@pytest.mark.parametrize("bad,hint", [
    ("MATCH (a:A)-[:R]->(b) RETURN collect(*)", "only valid as count"),
    ("MATCH (a:A)-[:R]->(b) RETURN min(DISTINCT b.name)",
     "count/collect only"),
], ids=["collect-star", "distinct-min"])
def test_collect_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError, match=hint):
        parse_match(bad)


def test_collect_semantics(tiny):
    """List vs set, numeric sort, NULL skipping, implicit grouping."""
    nodes, edges = tiny
    # tiny graph: a1-R->b1, a2-R->b2; b1/b2-S->c1 — group by c, collect
    # the b names (each once) and the a docnbrs through a 2-hop pattern
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B)-[:S]->(c:C) "
        "RETURN c.name AS cn, collect(b.name) AS bs, "
        "collect(DISTINCT a.docnbr) AS docs"))
    assert got == [("c1", "b1;b2", "d1;d2")]
    # numeric fields sort numerically before stringifying
    ids = _bindings(match_pattern(
        nodes, edges, "MATCH (a:A)-[:R]->(b:B) RETURN collect(a.id) AS i"))
    assert ids == [("1;2",)]
    # collect skips NULLs (content is NULL everywhere in the tiny graph)
    nul = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) RETURN collect(b.content) AS c"))
    assert nul == [("",)]


def test_collect_at_with_boundary(tiny):
    """collect() at a WITH boundary becomes a carried string column the
    rest of the pipeline can project and order by."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WITH b, collect(a.name) AS asrc "
        "MATCH (b)-[:S]->(c:C) "
        "RETURN b.name AS bn, asrc, c.name AS cn ORDER BY bn"))
    assert got == [("b1", "a1", "c1"), ("b2", "a2", "c1")]


# --- r13: multi-hop OPTIONAL MATCH chains --------------------------------

def test_parse_optional_chain_shapes():
    p = parse_match(
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C)-[:T]->(d:A) RETURN a.name")
    assert [e.chain_id for e in p.edge_pats] == [None, 0, 0]
    assert [e.optional for e in p.edge_pats] == [False, True, True]
    # two single-hop OPTIONAL clauses stay independent (chain_id None)
    p2 = parse_match(
        "MATCH (a:A)-[:R]->(b:B) OPTIONAL MATCH (b)-[:S]->(c:C) "
        "OPTIONAL MATCH (b)-[:T]->(e:A) RETURN a.name")
    assert [e.chain_id for e in p2.edge_pats] == [None, None, None]
    # two chains get distinct ids
    p3 = parse_match(
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C)-[:T]->(d:A) "
        "OPTIONAL MATCH (b)-[:S]->(x:C)-[:T]->(y:A) RETURN a.name")
    assert [e.chain_id for e in p3.edge_pats] == [None, 0, 0, 1, 1]
    # edge variables ride the chain
    p4 = parse_match(
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[r:S]->(c:C)-[:T]->(d:A) RETURN r")
    assert p4.edge_pats[1].var == "r" and p4.edge_pats[1].chain_id == 0


@pytest.mark.parametrize("bad,hint", [
    # chain anchored on a NEW variable
    ("MATCH (a:A)-[:R]->(b:B) "
     "OPTIONAL MATCH (x:B)-[:S]->(c:C)-[:T]->(d:A) RETURN a.name",
     "already-bound variable"),
    # chain re-binds an existing variable mid-path
    ("MATCH (a:A)-[:R]->(b:B) "
     "OPTIONAL MATCH (b)-[:S]->(c:C)-[:T]->(a) RETURN a.name",
     "already\\s+bound"),
    # chain revisits its own variable (not a simple path)
    ("MATCH (a:A)-[:R]->(b:B) "
     "OPTIONAL MATCH (b)-[:S]->(c:C)-[:T]->(c) RETURN a.name",
     "revisits"),
], ids=["new-anchor", "rebind", "revisit"])
def test_optional_chain_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError, match=hint):
        parse_match(bad)


def test_optional_chain_all_or_nothing(tiny):
    """The semantic differentiator (verdict r12 #4): hop 1 of the chain
    matches (b->S->c1) but hop 2 does not (no T edge into a :B), so the
    WHOLE chain is null — a per-hop left-outer would have kept the
    partial c binding Cypher discards."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C)-[:T]->(d:B) "
        "RETURN b.name AS bn, c.name AS cn, d.name AS dn ORDER BY bn"))
    assert got == [("b1", None, None), ("b2", None, None)]
    # the matching variant binds the full chain (c1-T->a1, an :A)
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C)-[:T]->(d:A) "
        "RETURN b.name AS bn, c.name AS cn, d.name AS dn ORDER BY bn"))
    assert got2 == [("b1", "c1", "a1"), ("b2", "c1", "a1")]


def test_optional_chain_multiplicity_and_edge_var(tiny):
    """A chain with several complete matches multiplies rows (Cypher:
    OPTIONAL MATCH returns every match, NULL only when none), and an
    edge variable inside the chain carries its rel_type."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (c:C)-[:T]->(a:A) "
        "OPTIONAL MATCH (c)<-[r:S]-(b:B)<-[:R]-(e:A) "
        "RETURN a.name AS an, r, b.name AS bn, e.name AS en"))
    # both S edges into c1 complete the chain back to an :A
    assert got == [("a1", "S", "b1", "a1"), ("a1", "S", "b2", "a2")]


def test_optional_chain_render_roundtrip():
    p = parse_match(
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C)<-[:T]-(d:A) RETURN a.name")
    from graph_database_project_spark.graph.pattern import render_match
    txt = render_match(p.node_pats, p.edge_pats)
    assert "OPTIONAL MATCH (b)-[:S]->(c:C)<-[:T]-(d:A)" in txt
    p2 = parse_match(txt + " RETURN a.name")
    assert p2.edge_pats == p.edge_pats
    assert sorted(p2.node_pats, key=lambda n: n.var) == \
        sorted(p.node_pats, key=lambda n: n.var)


def test_optional_chain_in_with_stage(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WITH b, count(a) AS na "
        "MATCH (b)-[:S]->(c:C) "
        "OPTIONAL MATCH (c)-[:T]->(d:A)-[:R]->(e:B) "
        "RETURN b.name AS bn, c.name AS cn, d.name AS dn, e.name AS en "
        "ORDER BY bn"))
    assert got == [("b1", "c1", "a1", "b1"), ("b2", "c1", "a1", "b1")]


# --- r13: UNION [ALL] between MATCH queries ------------------------------

def test_parse_union_shapes():
    p = parse_match(
        "MATCH (a:A)-[:R]->(b:B) RETURN a.name AS n "
        "UNION MATCH (c:C)-[:T]->(d:A) RETURN c.name AS n")
    assert len(p.unions) == 1
    all_flag, br = p.unions[0]
    assert all_flag is False
    assert br.node_pats[0].label == "C" and br.returns[0][2] == "n"
    # three-branch UNION ALL
    p2 = parse_match(
        "MATCH (a:A)-[:R]->(b) RETURN a.name AS n "
        "UNION ALL MATCH (a:B)-[:S]->(b) RETURN a.name AS n "
        "UNION ALL MATCH (a:C)-[:T]->(b) RETURN a.name AS n")
    assert [f for f, _ in p2.unions] == [True, True]


@pytest.mark.parametrize("bad,hint", [
    ("MATCH (a:A)-[:R]->(b) RETURN a.name AS n "
     "UNION MATCH (c:B)-[:S]->(d) RETURN d.name AS m",
     "same columns"),
    ("MATCH (a:A)-[:R]->(b) RETURN a.name AS n "
     "UNION ALL MATCH (c:B)-[:S]->(d) RETURN d.name AS n "
     "UNION MATCH (e:C)-[:T]->(f) RETURN f.name AS n",
     "cannot mix"),
    ("MATCH (a:A)-[:R]->(b) "
     "UNION MATCH (c:B)-[:S]->(d) RETURN d.name AS n",
     "explicit RETURN"),
    ("MATCH (a:A)-[:R]->(b) RETURN a.name AS n LIMIT 1 "
     "UNION MATCH (c:B)-[:S]->(d) RETURN d.name AS n",
     "not allowed inside UNION"),
], ids=["col-mismatch", "mixed-all", "no-return", "branch-limit"])
def test_union_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError, match=hint):
        parse_match(bad)


def test_union_semantics(tiny):
    nodes, edges = tiny
    # bare UNION de-duplicates across the WHOLE result
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) RETURN b.name AS n "
        "UNION MATCH (x:B)-[:S]->(c:C) RETURN x.name AS n"))
    assert got == [("b1",), ("b2",)]
    # UNION ALL keeps both branches' duplicates
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) RETURN b.name AS n "
        "UNION ALL MATCH (x:B)-[:S]->(c:C) RETURN x.name AS n"))
    assert got2 == [("b1",), ("b1",), ("b2",), ("b2",)]
    # branch variable namespaces are independent (same names re-used
    # with different labels), and columns align by NAME
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (v:A)-[:R]->(w:B) RETURN v.name AS n "
        "UNION MATCH (v:C)-[:T]->(w:A) RETURN v.name AS n"))
    assert got3 == [("a1",), ("a2",), ("c1",)]


def test_union_with_stages_per_branch(tiny):
    """Each branch carries its own full pipeline (WITH, aggregates)."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WITH b, count(a) AS c "
        "MATCH (b)-[:S]->(x:C) RETURN b.name AS n "
        "UNION MATCH (y:C)-[:T]->(z:A) RETURN y.name AS n"))
    assert got == [("b1",), ("b2",), ("c1",)]


def test_nl_graph_rules_collect_and_union(spark, store):
    """r13: the NL layer emits collect() and UNION pattern text for
    grouped-list and disjunctive questions (verdict #7) — the emitted
    strings parse, compile and answer correctly."""
    from graph_database_project_spark.plans.nl2query import answer_graph
    df = answer_graph(
        spark, store, "list the step nodes under each description")
    rows = [(r.docnbr, r.parent, r.children) for r in df.collect()]
    # only planning descriptions have steps; names are tag names, so the
    # collect cell is 'step;step;...' with the per-doc step counts (2/3/2)
    assert rows == [("737-00-1028", "description", "step;step"),
                    ("737-00-1029", "description", "step;step;step"),
                    ("737-00-1030", "description", "step;step")]
    df2 = answer_graph(
        spark, store, "which bulletins mention 'Fuel' or include line "
        "'6630'?")
    got = sorted(r.docnbr for r in df2.collect())
    # fuel subject = 1029; line 6630 shared by 1028+1029; dedup'd union
    assert got == ["737-00-1028", "737-00-1029"]


# --- r13: match-time WHERE on OPTIONAL MATCH (Cypher clause binding) -----

def test_parse_optional_where_shapes():
    p = parse_match(
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C) WHERE c.docnbr = 'd9' "
        "RETURN a.name")
    assert list(p.optional_wheres) == [1]  # keyed by first edge index
    # WHERE after a positive clause mid-query ANDs into the filter
    p2 = parse_match(
        "MATCH (a:A)-[:R]->(b:B) WHERE a.name = 'x' "
        "MATCH (b)-[:S]->(c) RETURN a.name")
    assert len(p2.where_fn) == 1 and not p2.optional_wheres


@pytest.mark.parametrize("bad,hint", [
    ("MATCH (a:A)-[:R]->(b) OPTIONAL MATCH (b)-[:S]->(c) "
     "WHERE NOT (b)-[:T]->(z) RETURN a.name",
     "match-time predicate"),
    ("MATCH (a:A)-[:R]->(b) OPTIONAL MATCH (b)-[:S]->(c), (b)-[:T]->(d) "
     "WHERE c.name = 'x' RETURN a.name",
     "multiple comma paths"),
], ids=["not-in-optional-where", "comma-paths"])
def test_optional_where_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError, match=hint):
        parse_match(bad)


def test_optional_where_match_time_semantics(tiny):
    """The Cypher differentiator: a failing match-time predicate
    PRESERVES the anchor row NULL-filled — the old global post-filter
    reading would have dropped it."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C) WHERE c.docnbr = 'nope' "
        "RETURN b.name AS bn, c.name AS cn"))
    assert got == [("b1", None), ("b2", None)]
    # predicate over the ANCHOR side: true only for b1's row
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C) WHERE b.name = 'b1' "
        "RETURN b.name AS bn, c.name AS cn"))
    assert got2 == [("b1", "c1"), ("b2", None)]


def test_optional_where_on_chain(tiny):
    """Match-time WHERE over a multi-hop optional chain applies to the
    WHOLE all-or-nothing unit (conjunction at the final anchor join)."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C)-[:T]->(d:A) WHERE d.name = 'a1' "
        "RETURN b.name AS bn, d.name AS dn"))
    assert got == [("b1", "a1"), ("b2", "a1")]
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:S]->(c:C)-[:T]->(d:A) WHERE d.name = 'a2' "
        "RETURN b.name AS bn, d.name AS dn"))
    assert got2 == [("b1", None), ("b2", None)]


def test_optional_where_in_with_stage(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WITH b, count(a) AS na "
        "MATCH (b)-[:S]->(x:C) "
        "OPTIONAL MATCH (x)-[:T]->(d:A) WHERE d.docnbr = 'nope' "
        "RETURN b.name AS bn, x.name AS xn, d.name AS dn ORDER BY bn"))
    assert got == [("b1", "c1", None), ("b2", "c1", None)]


# --- r13: id()/type() accessors and =~ regex ------------------------------

def test_accessor_functions_and_regex(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[r]->(b) WHERE id(a) >= 2 AND type(r) = 'R' "
        "RETURN id(a), type(r) AS t, b.name AS bn"))
    assert got == [(2, "R", "b2")]
    # =~ is FULL-string (Neo4j semantics): 'a.' matches a1/a2 wholly,
    # a partial-match reading would also pass 2-char prefixes of longer
    # names — and a non-anchored pattern must not match substrings
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b) WHERE a.name =~ 'a.' "
        "RETURN a.name AS an"))
    assert got2 == [("a1",), ("a2",)]
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b) WHERE a.name =~ '1' RETURN a.name AS an"))
    assert got3 == []  # '1' alone matches no WHOLE name
    # accessors inside aggregates, incl. collect(id(n))
    got4 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[r]->(b:B) "
        "RETURN count(DISTINCT type(r)) AS nt, collect(id(b)) AS ids"))
    assert got4 == [(1, "3;4")]


@pytest.mark.parametrize("bad,hint", [
    ("MATCH (a:A)-[:R]->(b) WHERE type(a) = 'R' RETURN a.name",
     "in-scope edge variable"),
    ("MATCH (a:A)-[r]->(b) WHERE id(r) > 1 RETURN a.name",
     "in-scope node variable"),
    ("MATCH (a:A)-[r]->(b) RETURN sum(type(r))", "not numeric"),
    ("MATCH (a:A)-[:R]->(b) WHERE a.name =~ b.name RETURN a.name",
     "quoted regex"),
], ids=["type-on-node", "id-on-edge", "sum-type", "regex-col"])
def test_accessor_rejects(bad, hint):
    with pytest.raises(PatternSyntaxError, match=hint):
        parse_match(bad)


def test_regex_in_with_post_where(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) WITH a.name AS an, count(*) AS n "
        "WHERE an =~ '[ab].' RETURN an, n ORDER BY an"))
    assert got == [("a1", 1), ("a2", 1), ("b1", 1), ("b2", 1)]


def test_labels_accessor(tiny):
    """labels(n) (r13): the node's label set as one sorted ';'-joined
    cell, attached by an id-keyed join at the projection boundary —
    including through OPTIONAL NULL rows and WITH boundaries."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b) RETURN a.name AS an, labels(b) AS bl"))
    assert got == [("a1", "B"), ("a2", "B")]
    # NULL-preserved optional rows keep NULL labels
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "OPTIONAL MATCH (b)-[:T]->(c) "
        "RETURN b.name AS bn, labels(c) AS cl"))
    assert got2 == [("b1", None), ("b2", None)]
    # through a WITH boundary + aggregate argument
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a)-[:R|S|T]->(b) "
        "WITH b, count(a) AS n RETURN labels(b) AS lb, count(*) AS c "
        "ORDER BY lb"))
    assert got3 == [("A", 1), ("B", 2), ("C", 1)]


def test_union_branches_isolate_optional_wheres(tiny):
    """Each UNION branch keeps its own match-time optional WHERE (the
    per-branch parser reset) — branch 2's predicate must not leak into
    branch 1's left join."""
    nodes, edges = tiny
    p = parse_match(
        "MATCH (a:A)-[:R]->(b:B) OPTIONAL MATCH (b)-[:S]->(c:C) "
        "WHERE c.docnbr = 'nope' RETURN b.name AS n, c.name AS cn "
        "UNION MATCH (x:B)-[:S]->(y:C) OPTIONAL MATCH (y)-[:T]->(z:A) "
        "WHERE z.name = 'a1' RETURN x.name AS n, z.name AS cn")
    assert list(p.optional_wheres) == [1]
    assert list(p.unions[0][1].optional_wheres) == [1]
    got = sorted((tuple(r) for r in match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) OPTIONAL MATCH (b)-[:S]->(c:C) "
        "WHERE c.docnbr = 'nope' RETURN b.name AS n, c.name AS cn "
        "UNION MATCH (x:B)-[:S]->(y:C) OPTIONAL MATCH (y)-[:T]->(z:A) "
        "WHERE z.name = 'a1' RETURN x.name AS n, z.name AS cn").collect()),
        key=lambda t: (t[0], t[1] or ""))
    # branch 1: both b rows NULL-preserved; branch 2: both x rows bind
    # z=a1 — the union dedups nothing across branches (disjoint cells)
    assert got == [("b1", None), ("b1", "a1"), ("b2", None),
                   ("b2", "a1")]


# --- r14: numeric expressions, existential predicates, whole-node
# collect, CASE ---------------------------------------------------------------

@pytest.fixture(scope="module")
def tinynum(spark):
    """Nodes whose content column carries NUMERIC STRINGS (the corpus
    stores every property as text — task_hours etc.), plus one
    malformed value to pin try_cast's NULL-not-crash contract."""
    nodes = spark.createDataFrame(
        [(1, ["Task"], "t1", None, "d1", {}),
         (2, ["Task"], "t2", None, "d1", {}),
         (3, ["Hours"], "h1", "40", "d1", {}),
         (4, ["Hours"], "h2", "2.5", "d1", {}),
         (5, ["Persons"], "p1", "5", "d1", {}),
         (6, ["Persons"], "p2", "oops", "d1", {})],
        "id long, labels array<string>, name string, content string, "
        "docnbr string, props map<string,string>")
    edges = spark.createDataFrame(
        [(1, 3, "HAS_HOURS"), (2, 4, "HAS_HOURS"),
         (1, 5, "HAS_PERSONS"), (2, 6, "HAS_PERSONS")],
        "src long, dst long, rel_type string")
    return nodes, edges


def test_numeric_parse_shapes():
    p = parse_match(
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WHERE toFloat(h.content) / 2 > 8.5 AND toInteger(h.content) > 25 "
        "RETURN t.name AS tn")
    assert len(p.where_fn) == 1
    # precedence: * binds tighter than +
    p2 = parse_match(
        "MATCH (a:A)-[:R]->(b) WHERE a.id > 1 + 2 * 3 RETURN b.name")
    assert len(p2.where_fn) == 1
    # unary minus literal
    parse_match("MATCH (a:A)-[:R]->(b) WHERE a.id > -5 RETURN b.name")


def test_numeric_where_filters(tinynum):
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WHERE toFloat(h.content) > 2.6 RETURN t.name AS tn"))
    assert got == [("t1",)]          # 40 > 2.6; 2.5 is not
    # arithmetic across two bound variables (hours per person)
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours), "
        "(t)-[:HAS_PERSONS]->(p:Persons) "
        "WHERE toFloat(h.content) / toInteger(p.content) > 7.5 "
        "RETURN t.name AS tn"))
    assert got2 == [("t1",)]         # 40/5 = 8 > 7.5
    # malformed numeric -> try_cast NULL -> row silently fails the
    # predicate (Cypher's toInteger('oops') IS NULL), never an ANSI error
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_PERSONS]->(p:Persons) "
        "WHERE toInteger(p.content) >= 0 RETURN t.name AS tn"))
    assert got3 == [("t1",)]


def test_numeric_int_only_positions_reject():
    for bad, hint in [
        ("MATCH (a)-[:T]->(b) RETURN a.id LIMIT 2.5", "integer"),
        ("MATCH (a)-[:T]->(b) RETURN a.id SKIP 0.5", "integer"),
        ("MATCH (a)-[:T*1.5..3]->(b) RETURN a.id", "integer"),
    ]:
        with pytest.raises(PatternSyntaxError, match=hint):
            parse_match(bad)
    # float literals in hop ranges never confuse '..' tokenization
    p = parse_match("MATCH (a)-[:T*1..3]->(b) RETURN a.id")
    assert (p.edge_pats[0].min_hops, p.edge_pats[0].max_hops) == (1, 3)


def test_exists_bare_and_wrapped_and_not(tiny):
    nodes, edges = tiny
    # bare Cypher pattern predicate
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WHERE (b)-[:S]->(:C) "
        "RETURN b.name AS bn"))
    assert got == [("b1",), ("b2",)]
    # exists() wrapper, same compile
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WHERE exists((b)-[:S]->(c)) "
        "RETURN b.name AS bn"))
    assert got2 == got
    # NOT exists(...) == the r11 NOT (pattern) anti-join
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WHERE NOT exists((b)-[:S]->(c)) "
        "RETURN b.name AS bn"))
    assert got3 == []
    # exists/not-exists PARTITION the bindings (set algebra)
    base = _bindings(match_pattern(
        nodes, edges, "MATCH (x:B)-[:S]->(y:C) RETURN x.name AS xn"))
    pos = _bindings(match_pattern(
        nodes, edges,
        "MATCH (x:B)-[:S]->(y:C) WHERE (x)<-[:R]-(:A) "
        "RETURN x.name AS xn"))
    neg = _bindings(match_pattern(
        nodes, edges,
        "MATCH (x:B)-[:S]->(y:C) WHERE NOT (x)<-[:R]-(:A) "
        "RETURN x.name AS xn"))
    assert sorted(pos + neg) == base


def test_exists_does_not_multiply_rows(spark):
    """The semi join filters; a positive MATCH edge would multiply.
    Two parallel edge types between the same pair: exists keeps ONE
    row, the positive form binds two."""
    nodes = spark.createDataFrame(
        [(1, ["A"], "a1", None, "d1", {}), (3, ["B"], "b1", None, "d1", {}),
         (5, ["C"], "c1", None, "d1", {})],
        "id long, labels array<string>, name string, content string, "
        "docnbr string, props map<string,string>")
    edges = spark.createDataFrame(
        [(1, 3, "R"), (3, 5, "S"), (3, 5, "S2")],
        "src long, dst long, rel_type string")
    semi = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WHERE (b)-[]->(:C) RETURN b.name AS bn"))
    assert semi == [("b1",)]
    pos = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B)-[r]->(c:C) RETURN b.name AS bn"))
    assert pos == [("b1",), ("b1",)]


def test_exists_aux_node_predicates(tiny):
    """EXISTS-a-node-matching-P: the auxiliary node pattern's label and
    property predicates restrict the semi join."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (b:B)-[:S]->(c:C) WHERE (b)<-[:R]-(:A {k: 'v'}) "
        "RETURN b.name AS bn"))
    assert got == [("b1",)]          # only a1 carries {k: v}


def test_exists_rejects():
    for bad, hint in [
        # unbound anchor
        ("MATCH (a:A)-[:R]->(b) WHERE (x)-[:S]->(y) RETURN b.name",
         "already-bound"),
        # under OR
        ("MATCH (a:A)-[:R]->(b) WHERE (b)-[:S]->(c) OR a.id = 1 "
         "RETURN b.name", "AND-ed at the top level"),
        # edge variable binds nothing
        ("MATCH (a:A)-[:R]->(b) WHERE exists((b)-[r:S]->(c)) "
         "RETURN b.name", "binds nothing"),
        # chain existence
        ("MATCH (a:A)-[:R]->(b) WHERE exists((b)-[:S]->(c)-[:T]->(d)) "
         "RETURN b.name", "single edge"),
        # var-length existence
        ("MATCH (a:A)-[:R]->(b) WHERE (b)-[:S*1..2]->(c) RETURN b.name",
         "single-hop"),
        # RETURN of an exists-only variable
        ("MATCH (a:A)-[:R]->(b) WHERE (b)-[:S]->(c) RETURN c.name",
         "binds no output"),
    ]:
        with pytest.raises(PatternSyntaxError, match=hint):
            parse_match(bad)


def test_boolean_group_not_mistaken_for_pattern(tiny):
    """The '(' lookahead: parenthesized boolean groups still parse."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) "
        "WHERE (a.docnbr = 'd1' OR a.docnbr = 'd2') AND (b)-[:S]->(:C) "
        "RETURN a.name AS an"))
    assert got == [("a1",), ("a2",)]


def test_collect_whole_node_renders_id_name(tiny):
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (b:B)-[:S]->(c:C) RETURN c.name AS cn, collect(b) AS members"))
    assert got == [("c1", "3:b1;4:b2")]
    # optional misses are skipped (NULL id nulls the whole cell)
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (b:B) OPTIONAL MATCH (b)-[:T]->(z) "
        "RETURN b.name AS bn, collect(z) AS zs"))
    assert got2 == [("b1", ""), ("b2", "")]


def test_case_expression(tinynum):
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, CASE WHEN toFloat(h.content) > 10 "
        "THEN 'big' WHEN toFloat(h.content) > 1 THEN 'small' "
        "ELSE 'tiny' END AS bucket"))
    assert got == [("t1", "big"), ("t2", "small")]
    # without ELSE -> NULL; CASE as implicit-grouping KEY
    got2 = sorted(
        (tuple(r) for r in match_pattern(
            nodes, edges,
            "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
            "RETURN CASE WHEN toFloat(h.content) > 10 THEN 'big' END "
            "AS bucket, count(*) AS n").collect()),
        key=lambda t: (t[0] or "",))
    assert got2 == [(None, 1), ("big", 1)]


def test_case_rejects():
    for bad, hint in [
        ("MATCH (a)-[:T]->(b) RETURN CASE WHEN a.id = 1 THEN 'x' END",
         "alias"),
        ("MATCH (a)-[:T]->(b) RETURN CASE WHEN a.id = 1 'x' END AS c",
         "THEN"),
        ("MATCH (a)-[:T]->(b) RETURN CASE WHEN (a)-[:U]->(z) "
         "THEN 'x' END AS c", "inside a CASE"),
    ]:
        with pytest.raises(PatternSyntaxError, match=hint):
            parse_match(bad)


def test_return_value_expressions(tinynum):
    """r14b: value expressions as RETURN items (alias required) and as
    aggregate arguments — the 'total hours per bulletin' GPT shape."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, toFloat(h.content) * 2 AS dbl"))
    assert got == [("t1", 80.0), ("t2", 5.0)]
    # sum/avg over a cast expression, implicit grouping. r15 (ADVICE
    # r14): toInteger follows Neo4j's rule for numeric strings —
    # '2.5' TRUNCATES to 2 (double hop, try_cast both legs), so the
    # sum is 40 + 2 = 42; a genuinely malformed string still yields
    # NULL (skipped by sum)
    got2 = sorted(
        (tuple(r) for r in match_pattern(
            nodes, edges,
            "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
            "RETURN t.docnbr AS docnbr, sum(toInteger(h.content)) AS tot, "
            "avg(toFloat(h.content)) AS avg_h").collect()))
    assert got2 == [("d1", 42, 21.25)]
    # collect over an expression renders the computed values
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.docnbr AS docnbr, collect(toFloat(h.content)) AS vals"))
    assert got3 == [("d1", "2.5;40.0")]
    # missing alias is a positioned reject
    with pytest.raises(PatternSyntaxError, match="alias"):
        parse_match(
            "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
            "RETURN toFloat(h.content)")


@pytest.mark.parametrize("seed", range(30))
def test_arithmetic_precedence_matches_python(spark, seed):
    """Property test: random single-line arithmetic over integer
    literals parses at Python's operator precedence — the compiled
    Column and Python's eval agree (floats avoided: / uses exact
    dyadic operands)."""
    import random

    rng = random.Random(seed)
    n_terms = rng.randint(2, 5)
    terms = [str(rng.randint(1, 9))]
    for _ in range(n_terms - 1):
        terms.append(rng.choice(["+", "-", "*"]))
        terms.append(str(rng.randint(1, 9)))
    expr = " ".join(terms)
    expected = eval(expr)  # noqa: S307 — integer-literal arithmetic
    p = parse_match(
        f"MATCH (a:A)-[:R]->(b) WHERE a.id + 0 = {expr} RETURN b.name")
    # evaluate against a literal a_id equal to the expected value
    from pyspark.sql import functions as F
    got = (spark.range(1)
           .withColumn("a_id", F.lit(expected))
           .select(p.where_fn[0]().alias("ok")).first()["ok"])
    assert got is True, (expr, expected)


def test_tolower_and_coalesce_in_return(tiny):
    """r14b: toLower/toUpper as RETURN items; coalesce() over an
    OPTIONAL MATCH column (the GPT NULL-default idiom) in items and
    WHERE."""
    nodes, edges = tiny
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) RETURN toUpper(b.name) AS bn"))
    assert got == [("B1",), ("B2",)]
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (b:B) OPTIONAL MATCH (b)-[:T]->(z) "
        "RETURN b.name AS bn, coalesce(z.name, 'none') AS zn"))
    assert got2 == [("b1", "none"), ("b2", "none")]
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (b:B) OPTIONAL MATCH (b)-[:T]->(z) "
        "WHERE coalesce(z.name, 'none') = 'none' "
        "RETURN b.name AS bn, count(z) AS n"))
    assert got3 == [("b1", 0), ("b2", 0)]


def test_exists_render_roundtrip():
    """r14 review finding: render_match must render existential edges
    as WHERE exists(…) — a plain MATCH rendering would re-parse to a
    row-multiplying positive edge."""
    from graph_database_project_spark.graph.pattern import render_match

    p = parse_match(
        "MATCH (a:A)-[:R]->(b) WHERE (b)-[:S]->(c) RETURN b.name")
    txt = render_match(p.node_pats, p.edge_pats)
    assert "exists(" in txt and "WHERE" in txt
    p2 = parse_match(txt + " RETURN b.name")
    assert [ep.existential for ep in p2.edge_pats] == \
        [ep.existential for ep in p.edge_pats]
    assert [ep.negated for ep in p2.edge_pats] == \
        [ep.negated for ep in p.edge_pats]


def test_chained_pattern_predicates_positioned_rejects():
    """r14 review finding: anchoring a NOT/exists on a variable that
    itself exists only inside another NOT/exists must be a POSITIONED
    parse reject, not an unpositioned compile ValueError."""
    for bad in [
        "MATCH (a:A)-[:R]->(b) WHERE (b)-[:S]->(c) AND (c)-[:T]->(d) "
        "RETURN b.name",
        "MATCH (a:A)-[:R]->(b) WHERE NOT (b)-[:S]->(c) AND "
        "NOT (c)-[:T]->(d) RETURN b.name",
        # dst re-mention of another predicate's aux variable
        "MATCH (a:A)-[:R]->(b) WHERE (b)-[:S]->(c) AND (b)-[:T]->(c) "
        "RETURN b.name",
    ]:
        with pytest.raises(PatternSyntaxError, match="binds nothing"):
            parse_match(bad)


def test_case_and_exprs_in_with_items(tinynum):
    """r14: CASE and value expressions compose with WITH stages — the
    boundary projects them as plain columns, the trailing WHERE
    (HAVING shape) filters on the alias, and RETURN re-references it."""
    nodes, edges = tinynum
    got = sorted(tuple(r) for r in match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WITH t, CASE WHEN toFloat(h.content) > 10 THEN 'big' "
        "ELSE 'small' END AS band "
        "WHERE band = 'big' "
        "MATCH (t)-[:HAS_PERSONS]->(p:Persons) "
        "RETURN t.name AS tn, band, p.content AS persons").collect())
    assert got == [("t1", "big", "5")]


# --- r15: grouped expressions, CASE anywhere, size(), concat, ORDER BY
# expressions, allShortestPaths ------------------------------------------------

def test_paren_grouping(tinynum):
    """r15 verdict #2: parenthesized grouping in value expressions —
    WHERE, RETURN items, nested, and inside aggregate arguments."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WHERE (toInteger(h.content) + 10) * 2 > 60 RETURN t.name AS tn"))
    assert got == [("t1",)]          # (40+10)*2=100; (2+10)*2=24
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, ((toFloat(h.content) + 1) * 2) AS x"))
    assert got2 == [("t1", 82.0), ("t2", 7.0)]
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.docnbr AS d, sum((toInteger(h.content) + 1) * 2) AS s"))
    assert got3 == [("d1", 88)]      # (40+1)*2 + (2+1)*2
    # grouping actually changes the value vs precedence
    flat = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, toFloat(h.content) + 1 * 2 AS x"))
    assert flat == [("t1", 42.0), ("t2", 4.5)]


def test_boolean_vs_value_paren_disambiguation(tinynum):
    """The matching-paren lookahead: boolean groups, value groups, and
    pattern predicates coexist in one WHERE."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WHERE (t.name = 't1' OR t.name = 't2') "
        "AND (toInteger(h.content) + 10) * 2 > 60 "
        "RETURN t.name AS tn"))
    assert got == [("t1",)]


def test_tointeger_truncates_like_neo4j(tinynum):
    """ADVICE r14: toInteger('2.5') is 2 (Neo4j truncation), not NULL;
    malformed strings still NULL."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, toInteger(h.content) AS i"))
    assert got == [("t1", 40), ("t2", 2)]
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_PERSONS]->(p:Persons) "
        "RETURN t.name AS tn, toInteger(p.content) AS i"))
    assert got2 == [("t1", 5), ("t2", None)]


def test_case_in_where_and_aggregate(tinynum):
    """r15 verdict #3: CASE as a WHERE value and the conditional-
    aggregate staple sum(CASE WHEN ... THEN 1 ELSE 0 END)."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WHERE CASE WHEN toFloat(h.content) > 10 THEN 1 ELSE 0 END = 1 "
        "RETURN t.name AS tn"))
    assert got == [("t1",)]
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.docnbr AS d, "
        "sum(CASE WHEN toFloat(h.content) > 10 THEN 1 ELSE 0 END) AS big, "
        "count(*) AS n"))
    assert got2 == [("d1", 1, 2)]
    # CASE composes in arithmetic
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, "
        "CASE WHEN toFloat(h.content) > 10 THEN 100 ELSE 0 END + 1 AS s"))
    assert got3 == [("t1", 101), ("t2", 1)]


def test_size_string_and_collect(tinynum):
    """r15 verdict #4: size(string) = length; size(collect(...)) is the
    count rewrite (DISTINCT carries through)."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WHERE size(h.content) > 2 RETURN t.name AS tn"))
    assert got == [("t2",)]          # len('2.5')=3 > 2; len('40')=2
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, size(h.content) AS n"))
    assert got2 == [("t1", 2), ("t2", 3)]
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.docnbr AS d, size(collect(h.content)) AS n"))
    assert got3 == [("d1", 2)]
    got4 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.docnbr AS d, size(collect(DISTINCT t.docnbr)) AS n"))
    assert got4 == [("d1", 1)]
    # collect skips NULLs and so does the rewrite (optional misses)
    got5 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task) OPTIONAL MATCH (t)-[:NOPE]->(z) "
        "RETURN t.docnbr AS d, size(collect(z)) AS n"))
    assert got5 == [("d1", 0)]


def test_string_concat(tinynum):
    """r15 verdict #5: '+' concatenates when either operand is a string
    (Cypher's rule); 'any'-kinded carried columns cast to string."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name + ':' + h.content AS label"))
    assert got == [("t1:40",), ("t2:2.5",)]
    # concat in WHERE
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WHERE t.name + ':' + h.content = 't1:40' RETURN t.name AS tn"))
    assert got2 == [("t1",)]
    # carried (any-kind) column + string literal -> concat w/ cast
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WITH t.name AS tn, toInteger(h.content) AS hrs "
        "RETURN tn + '#' AS tag, hrs + 0 AS hrs"))
    assert got3 == [("t1#", 40), ("t2#", 2)]


def test_orderby_expression(tinynum):
    """r15 verdict #7: ORDER BY on a value expression over output
    columns — var.field maps through its alias; unprojected refs are
    positioned rejects."""
    nodes, edges = tinynum
    got = [tuple(r) for r in match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, h.content AS hrs "
        "ORDER BY toFloat(h.content) DESC").collect()]
    assert got == [("t1", "40"), ("t2", "2.5")]
    got2 = [tuple(r) for r in match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WITH t.name AS tn, toFloat(h.content) AS hrs "
        "ORDER BY hrs * -1 "
        "RETURN tn, hrs").collect()]
    assert got2 == [("t1", 40.0), ("t2", 2.5)]


def test_allshortestpaths_alias(tiny):
    """r15 verdict #8: allShortestPaths parses as the distance-semantics
    alias of shortestPath (same binding; per-path multiplicity is
    documented as collapsed)."""
    nodes, edges = tiny
    a = _bindings(match_pattern(
        nodes, edges,
        "MATCH p = allShortestPaths((a:A)-[:R|S*1..3]->(c:C)) "
        "RETURN a.name AS an, length(p) AS d"))
    b = _bindings(match_pattern(
        nodes, edges,
        "MATCH p = shortestPath((a:A)-[:R|S*1..3]->(c:C)) "
        "RETURN a.name AS an, length(p) AS d"))
    assert a == b and len(a) > 0


def test_r15_rejects():
    """Positioned rejects: kind mismatches (ADVICE r14 sum/toLower
    guard included), size() over numerics, ORDER BY expr over
    unprojected refs."""
    for bad, hint in [
        ("MATCH (a)-[:T]->(b) RETURN sum(toLower(b.name)) AS s",
         "numeric argument"),
        ("MATCH (a)-[:T]->(b) RETURN avg(b.name + '-') AS s",
         "numeric argument"),
        ("MATCH (a)-[:T]->(b) RETURN sum(b.name + 0) AS s", "mixes"),
        ("MATCH (a)-[:T]->(b) WHERE b.name - 1 > 0 RETURN a.id",
         "string operand"),
        ("MATCH (a)-[:T]->(b) RETURN CASE WHEN a.id = 1 THEN 1 "
         "ELSE 'x' END AS c", "mixes"),
        ("MATCH (a)-[:T]->(b) RETURN coalesce(b.name, 1) AS c", "mixes"),
        ("MATCH (a)-[:T]->(b) WHERE size(toInteger(b.content)) > 1 "
         "RETURN a.id", "string value"),
        ("MATCH (a)-[:T]->(b) RETURN a.id AS i ORDER BY "
         "toFloat(b.content)", "not an output"),
        ("MATCH (a)-[:T]->(b) RETURN (toFloat(b.content) + 1 AS x",
         "expected"),
    ]:
        with pytest.raises(PatternSyntaxError, match=hint):
            parse_match(bad)


# --- r15 second wave: boolean NOT, ORDER BY aggregates, toString,
# simple CASE, modulo ----------------------------------------------------------

def test_boolean_not(tinynum):
    """r15: NOT as general boolean negation (Cypher's rule) — routed
    apart from the pattern-negation anti-join by lookahead; NOT now
    composes under OR and doubles up."""
    nodes, edges = tinynum
    base = "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
    got = _bindings(match_pattern(
        nodes, edges, base + "WHERE NOT t.name = 't1' RETURN t.name AS tn"))
    assert got == [("t2",)]
    got2 = _bindings(match_pattern(
        nodes, edges,
        base + "WHERE NOT (t.name = 't1' OR t.name = 'zz') "
        "RETURN t.name AS tn"))
    assert got2 == [("t2",)]
    got3 = _bindings(match_pattern(
        nodes, edges,
        base + "WHERE NOT h.content CONTAINS '.' RETURN t.name AS tn"))
    assert got3 == [("t1",)]
    # boolean NOT under OR is legal (pattern NOT is not)
    got4 = _bindings(match_pattern(
        nodes, edges,
        base + "WHERE NOT t.name = 't1' OR h.content = '40' "
        "RETURN t.name AS tn"))
    assert got4 == [("t1",), ("t2",)]
    got5 = _bindings(match_pattern(
        nodes, edges,
        base + "WHERE NOT NOT t.name = 't1' RETURN t.name AS tn"))
    assert got5 == [("t1",)]
    # three-valued logic: NOT NULL-predicate stays NULL -> row drops
    got6 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_PERSONS]->(pp:Persons) "
        "WHERE NOT toInteger(pp.content) > 99 RETURN t.name AS tn"))
    assert got6 == [("t1",)]       # 'oops' casts NULL; ~NULL drops
    # the anti-join forms still route to patterns
    got7 = _bindings(match_pattern(
        nodes, edges,
        base + "WHERE NOT (t)-[:NOPE]->(:Hours) RETURN t.name AS tn"))
    assert got7 == [("t1",), ("t2",)]
    with pytest.raises(PatternSyntaxError, match="AND-ed at the top"):
        parse_match(base + "WHERE NOT (t)-[:NOPE]->(z) OR t.name = 'x' "
                    "RETURN t.name")


def test_orderby_bare_aggregate(tinynum):
    """r15: ORDER BY count(*) resolves structurally to the projected
    aggregate's alias; aggregates absent from the projection are
    positioned rejects."""
    nodes, edges = tinynum
    got = [tuple(r) for r in match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, count(h) AS n "
        "ORDER BY count(h) DESC, tn").collect()]
    assert got == [("t1", 1), ("t2", 1)]
    with pytest.raises(PatternSyntaxError, match="does not appear"):
        parse_match(
            "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
            "RETURN t.name AS tn, count(*) AS n ORDER BY min(h.content)")


def test_tostring_and_modulo(tinynum):
    """r15: toString() makes number+string concat legal under the kind
    rules; % is mul-precedence arithmetic on both engines' dividend-
    sign convention."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name + '#' + toString(t.id) AS tag"))
    assert got == [("t1#1",), ("t2#2",)]
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WHERE t.id % 2 = 0 RETURN t.name AS tn"))
    assert got2 == [("t2",)]
    # % binds at * / precedence: 5 + id % 2, not (5 + id) % 2
    got4 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, 5 + t.id % 2 AS v"))
    assert got4 == [("t1", 6), ("t2", 5)]


def test_simple_case(tinynum):
    """r15: the simple CASE form compiles to searched CASE with
    subject-equality conditions; subject/WHEN-value kind mixes are
    positioned rejects."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, CASE h.content WHEN '40' THEN 'forty' "
        "WHEN '2.5' THEN 'frac' ELSE 'other' END AS w"))
    assert got == [("t1", "forty"), ("t2", "frac")]
    # numeric subject
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "RETURN t.name AS tn, CASE toInteger(h.content) % 2 "
        "WHEN 0 THEN 'even' ELSE 'odd' END AS par"))
    assert got2 == [("t1", "even"), ("t2", "even")]
    with pytest.raises(PatternSyntaxError, match="other type"):
        parse_match("MATCH (a)-[:T]->(b) RETURN CASE a.name WHEN 1 "
                    "THEN 'x' END AS c")


# --- r15 review fixes ---------------------------------------------------------

def test_carried_kind_tracking(tinynum):
    """r15 review: WITH boundaries record each carried column's static
    kind — two carried strings CONCATENATE under '+' (was an
    unpositioned AnalysisException on numeric addition), carried
    numerics still add, and sum() over a string-kinded carried column
    is a positioned reject."""
    nodes, edges = tinynum
    got = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WITH t.name AS a, h.content AS b RETURN a + b AS ab"))
    assert got == [("t140",), ("t22.5",)]
    got2 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WITH t.docnbr AS d, toInteger(h.content) AS hrs "
        "RETURN d, sum(hrs) AS tot"))
    assert got2 == [("d1", 42)]
    with pytest.raises(PatternSyntaxError, match="numeric"):
        parse_match("MATCH (a)-[:T]->(b) WITH a.name AS nm, b.id AS i "
                    "RETURN sum(nm) AS s")
    # kinds survive CHAINED boundaries (second WITH reads the first's)
    got3 = _bindings(match_pattern(
        nodes, edges,
        "MATCH (t:Task)-[:HAS_HOURS]->(h:Hours) "
        "WITH t.name AS a, h.content AS b "
        "WITH a + b AS ab "
        "RETURN ab + '!' AS bang"))
    assert got3 == [("t140!",), ("t22.5!",)]


def test_tointeger_exact_integer_path(tinynum):
    """r15 review: integer-formatted inputs take the exact BIGINT cast
    (no double round-trip past 2^53); decimal forms still truncate."""
    nodes, edges = tinynum
    big = 9007199254740993          # 2^53 + 1 — not double-representable
    extra = nodes.sparkSession.createDataFrame(
        [(big, ["Big"], "b1", str(big), "d1", {})], nodes.schema)
    got = _bindings(match_pattern(
        nodes.union(extra),
        edges.union(edges.sparkSession.createDataFrame(
            [(1, big, "B")], edges.schema)),
        "MATCH (t:Task)-[:B]->(g:Big) "
        "RETURN toInteger(g.content) AS i"))
    assert got == [(big,)]


def test_comparison_kind_guard():
    """r15 review: statically-known string-vs-number comparisons are
    positioned rejects (were runtime ANSI cast errors)."""
    for bad in [
        "MATCH (a)-[:T]->(b) WHERE a.name + '-' + b.name > 5 "
        "RETURN a.id AS i",
        "MATCH (a)-[:T]->(b) WHERE toInteger(a.content) = 'x' "
        "RETURN a.id AS i",
        "MATCH (a)-[:T]->(b) WHERE size(a.name) = 'long' "
        "RETURN a.id AS i",
    ]:
        with pytest.raises(PatternSyntaxError, match="mixes"):
            parse_match(bad)


def test_not_pattern_with_redundant_paren(tiny):
    """r15 review: NOT ((a)-[:T]->(b)) / WHERE ((a)-[:T]->(b)) keep
    their anti-/semi-join compile through one wrapper paren."""
    nodes, edges = tiny
    neg = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WHERE NOT ((b)-[:S]->(:C)) "
        "RETURN b.name AS bn"))
    assert neg == []
    pos = _bindings(match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WHERE ((b)-[:S]->(:C)) "
        "RETURN b.name AS bn"))
    assert pos == [("b1",), ("b2",)]


def test_return_star(tiny):
    """r15b: RETURN * projects every named in-scope variable in
    declaration order (nodes -> carried columns, edge vars ->
    rel_type); anonymous/negation-only vars excluded; WITH-staged and
    path-var queries are positioned rejects."""
    nodes, edges = tiny
    df = match_pattern(nodes, edges, "MATCH (a:A)-[r:R]->(b:B) RETURN *")
    assert df.columns == [
        "a_id", "a_name", "a_content", "a_docnbr",
        "b_id", "b_name", "b_content", "b_docnbr", "r_rel_type"]
    got = sorted((r.a_name, r.b_name, r.r_rel_type) for r in df.collect())
    assert got == [("a1", "b1", "R"), ("a2", "b2", "R")]
    # anonymous node excluded from *
    df2 = match_pattern(nodes, edges, "MATCH (a:A)-[:R]->(:B) RETURN *")
    assert df2.columns == ["a_id", "a_name", "a_content", "a_docnbr"]
    # negation-only variable excluded
    df3 = match_pattern(
        nodes, edges,
        "MATCH (a:A)-[:R]->(b:B) WHERE NOT (b)-[:T]->(z) RETURN *")
    assert not any(c.startswith("z_") for c in df3.columns)
    for bad, hint in [
        ("MATCH (a:A)-[:R]->(b) WITH a RETURN *", "after a WITH"),
        ("MATCH p = shortestPath((a:A)-[:R*1..2]->(b)) RETURN *",
         "path variable"),
        ("MATCH (:A)-[:R]->(:B) RETURN *", "no named"),
    ]:
        with pytest.raises(PatternSyntaxError, match=hint):
            parse_match(bad)
