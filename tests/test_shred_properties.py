"""Property-based shred invariants (SURVEY.md §5.4): random document trees →
shred → graph, checking the structural laws that must hold for ANY input,
not just the three bundled bulletins.

Invariants:
* one shred row per XML element (nothing dropped — the reference's
  line-oriented parser silently lost multi-line elements, SURVEY §7.4);
* node ids are unique after build (position-disambiguated paths keep
  repeated same-tag siblings distinct);
* every non-root node has exactly one IS_PART_OF out-edge (single parent);
* HAS_* down-edges mirror IS_PART_OF up-edges 1:1;
* MERGE idempotence: merging a graph into itself changes nothing.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from graph_database_project_spark.graph.shred import SHRED_SCHEMA, _shred_doc, build_graph
from graph_database_project_spark.graph.store import GraphStore

# Tag alphabet avoids the <airplanes>/<effectivity> special-case so the
# element↔node bijection is exact (the fan-out path has its own goldens in
# test_graph_xml.py).
TAGS = ["alpha", "beta", "gamma", "delta", "note", "step", "title"]

trees = st.recursive(
    st.tuples(st.sampled_from(TAGS), st.text(alphabet="abc xyz", max_size=12)),
    lambda kids: st.tuples(
        st.sampled_from(TAGS),
        st.lists(kids, min_size=1, max_size=3),
    ),
    max_leaves=12,
)


def to_element(node, tag_override=None):
    tag, payload = node
    el = ET.Element(tag_override or tag)
    if isinstance(payload, str):
        el.text = payload
    else:
        for child in payload:
            el.append(to_element(child))
    return el


def count_elements(el):
    return 1 + sum(count_elements(c) for c in el)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=trees)
def test_shred_and_build_invariants(spark, tree):
    root = to_element(tree, tag_override="doc")
    xml_text = ET.tostring(root, encoding="unicode")
    rows = _shred_doc("mem://doc.xml", xml_text)

    # one row per element, nothing dropped
    assert len(rows) == count_elements(root)

    shred = spark.createDataFrame(rows, SHRED_SCHEMA)
    nodes, edges = build_graph(shred)
    n_nodes, n_rows = nodes.count(), len(rows)
    # ids unique and bijective with elements
    assert n_nodes == n_rows
    assert nodes.select("id").distinct().count() == n_nodes

    up = edges.filter(F.col("rel_type") == "IS_PART_OF")
    down = edges.filter(F.col("rel_type").startswith("HAS_"))
    # single-parent law: every non-root node has exactly one up-edge
    assert up.count() == n_nodes - 1
    assert up.groupBy("src").count().filter("count > 1").count() == 0
    # bidirectional convention: up and down mirror exactly
    assert down.count() == up.count()
    mirrored = down.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert mirrored.exceptAll(up.select("src", "dst")).count() == 0

    # MERGE idempotence
    store = GraphStore(nodes, edges).merge(nodes, edges)
    assert store.nodes.count() == n_nodes
    assert store.edges.count() == edges.count()
