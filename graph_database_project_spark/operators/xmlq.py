"""Graph queries over the reference's own XML corpus (its only test data —
`boeing_service_bulletin_{1,2,3}.xml`), exercising the full M0 spine:
wholetext scan → mapInPandas shred → relational node/edge derivation →
k-hop traversal → grouped result shaping.

The corpus is static, so every query here is value-checked against a
golden-constant oracle (xml_golden.py); the same goldens are asserted in
tests/test_graph_xml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph.shred import ingest_xml
from ..graph.store import GraphStore

REFERENCE_XML_GLOB = "/root/reference/boeing_service_bulletin_*.xml"
FLAGSHIP_BULLETIN = "737-00-1028"


def _store(spark: SparkSession) -> GraphStore:
    """Per-session memoized ingest, keyed on the glob: the 7 ``xml_*``
    queries all read the same 3-file corpus, and re-shredding per query is
    pure waste. Safe because GraphStore is immutable (every mutation verb
    returns a new store). ``localCheckpoint`` materializes the shredded
    tables once and truncates the mapInPandas lineage so downstream
    traversals replan from a flat scan."""
    from ..io import session_memo

    def build():
        nodes, edges = ingest_xml(spark, REFERENCE_XML_GLOB)
        return GraphStore(nodes.localCheckpoint(eager=True),
                          edges.localCheckpoint(eager=True))

    return session_memo(spark, "_sg_xml_store_cache", REFERENCE_XML_GLOB, build)


def q_xml_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node count per label — the catalog surface (first-graph.py:65-100
    hardcodes this; here it is derived)."""
    return _store(spark).catalog_labels().orderBy("label")


def q_xml_rel_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_label)-[:rel]->(dst_label) signatures (first-graph.py:102-136)."""
    return _store(spark).catalog_relationships().orderBy("src_label", "rel_type", "dst_label")


def q_xml_khop_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference flagship: 3-hop downward expansion from ServiceBulletin
    737-00-1028 (first-graph.py:141 traversal contract), grouped per seed
    (first-graph.py:168-176 result shaping)."""
    st = _store(spark)
    return st.khop_grouped(
        F.array_contains("labels", "ServiceBulletin") & (F.col("name") == FLAGSHIP_BULLETIN),
        depth=3,
    )


def q_xml_shared_linenumbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LineNumber nodes shared across bulletins — proves match-or-create
    entity resolution (xml2neo.py:32-41): one node per line number, reached
    from Airplane nodes of multiple documents."""
    st = _store(spark)
    lines = st.nodes.filter(F.array_contains("labels", "LineNumber")) \
        .select(F.col("id").alias("ln_id"), F.col("name").alias("line_number"))
    airplanes = st.nodes.filter(F.array_contains("labels", "Airplane")) \
        .select(F.col("id").alias("ap_id"), F.col("docnbr"))
    via = st.edges.filter(F.col("rel_type") == "included_in") \
        .select(F.col("src").alias("ln_id"), F.col("dst").alias("ap_id"))
    return (
        lines.join(via, "ln_id").join(airplanes, "ap_id")
        .groupBy("line_number")
        .agg(F.countDistinct("docnbr").alias("n_bulletins"))
        .filter(F.col("n_bulletins") > 1)
        .orderBy("line_number")
    )


def xml_subtree_gathered(spark: SparkSession) -> DataFrame:
    """Content aggregation over subtrees (2.A#21, new-converter.js:57-85
    gatherContent): for every top-level section of each bulletin,
    concatenate all descendant text in document order.

    The reference recurses per node issuing one query per child; here the
    shred's path column turns the recursion into one prefix match +
    groupBy: descendants of a section are exactly the rows whose path
    starts with the section's path. collect_list is order-nondeterministic
    → pairs are sorted by path before concatenation (SURVEY §7.3e).

    Full-prose form, used by tests/test_graph_xml.py; the registered query
    below hashes the multi-KB cells so its golden-constant oracle stays
    reviewable.
    """
    from ..graph.shred import shred_xml
    sh = shred_xml(spark, REFERENCE_XML_GLOB).cache()
    sections = sh.filter(F.col("depth") == 1).select(
        F.col("docnbr").alias("s_doc"), F.col("tag").alias("section"),
        F.col("path").alias("s_path"),
    )
    content = sh.filter(F.col("content").isNotNull()).select(
        F.col("docnbr").alias("c_doc"), "path", "content")
    # descendant test: exact match or prefix + '/' — a bare startswith
    # would false-match sibling indexes sharing a digit prefix ([1] v [10])
    is_descendant = (F.col("path") == F.col("s_path")) | \
        F.col("path").startswith(F.concat(F.col("s_path"), F.lit("/")))
    joined = sections.join(content, is_descendant & (F.col("c_doc") == F.col("s_doc")))
    return (
        joined.groupBy(F.col("s_doc").alias("docnbr"), "section")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("path", "content"))),
                    lambda s: s.content,
                ),
            ).alias("gathered_content"),
            F.count(F.lit(1)).alias("n_fragments"),
        )
        .orderBy("docnbr", "section")
    )


def q_xml_subtree_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing form of xml_subtree_gathered: the concatenated
    descendant prose is multi-KB with embedded quotes/newlines, so the
    registered output carries ``md5(prose)`` + its length instead — every
    character still participates in the value check (any drift in shred,
    descendant matching, or document-order sorting flips the digest), but
    the golden-constant oracle remains a short reviewable table."""
    g = xml_subtree_gathered(spark)
    return (
        g.select(
            "docnbr", "section",
            F.md5("gathered_content").alias("content_md5"),
            F.length("gathered_content").cast("bigint").alias("content_len"),
            "n_fragments",
        )
        .orderBy("docnbr", "section")
    )


def q_xml_title_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TITLE-driven hierarchy (2.A#20, new-converter.js:87-152): only
    title-bearing elements become nodes; the node label derives from the
    *title text* via the sanitize/format functions (2.A#22/#23), and each
    title nests under the nearest ancestor title (path-prefix resolution)
    else the ServiceBulletin root."""
    from ..functions.strings import format_node_label
    from ..graph.shred import shred_xml

    sh = shred_xml(spark, REFERENCE_XML_GLOB).cache()
    titles = sh.filter((F.col("tag") == "title") & F.col("content").isNotNull()).select(
        "docnbr",
        F.col("parent_path").alias("holder_path"),  # the element the title names
        format_node_label(F.col("content")).alias("title_label"),
    )
    parents = titles.select(
        F.col("docnbr").alias("p_doc"),
        F.col("holder_path").alias("p_path"),
        F.col("title_label").alias("parent_label"),
    )
    nested = titles.join(
        parents,
        (titles.docnbr == parents.p_doc)
        # strict-descendant: prefix + '/' (see q_xml_subtree_content note)
        & titles.holder_path.startswith(F.concat(F.col("p_path"), F.lit("/"))),
        "left",
    )
    # nearest ancestor = the longest matching prefix
    from pyspark.sql import Window as W
    w = W.partitionBy("docnbr", "holder_path").orderBy(F.length("p_path").desc())
    return (
        nested.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "docnbr", "title_label",
            F.coalesce("parent_label", F.lit("ServiceBulletin")).alias("parent_label"),
        )
        .orderBy("docnbr", "title_label")
    )


def q_xml_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the full bulletin graph: shared LineNumber
    nodes (match-or-create entity resolution, xml2neo.py:32-41) are what can
    fuse separate documents into one component — the cross-document linkage
    the reference's entity-upsert design exists to create. Emits component
    sizes + the ServiceBulletin roots each component contains."""
    from ..graph.traverse import connected_components

    st = _store(spark)
    vertices = st.nodes.select(F.col("id").alias("node"))
    comp = connected_components(vertices, st.edges.select("src", "dst"))
    roots = st.nodes.filter(F.array_contains("labels", "ServiceBulletin")) \
        .select(F.col("id").alias("node"), F.col("name").alias("bulletin"))
    return (
        comp.join(roots, "node", "left")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sort_array(F.collect_list("bulletin")).alias("bulletins"),
        )
        .select("n_nodes", F.concat_ws(",", "bulletins").alias("bulletins"))
        .orderBy(F.desc("n_nodes"))
    )


QUERIES = {
    "xml_label_counts": q_xml_label_counts,
    "xml_rel_signatures": q_xml_rel_signatures,
    "xml_khop_flagship": q_xml_khop_flagship,
    "xml_shared_linenumbers": q_xml_shared_linenumbers,
    "xml_subtree_content": q_xml_subtree_content,
    "xml_title_hierarchy": q_xml_title_hierarchy,
    "xml_connected_components": q_xml_connected_components,
}

# The graph tables come from XML ingest, not the pre-registered relational
# views — but the corpus is STATIC, so the outputs are fixed and the oracle
# is a golden-constant VALUES table per query (see xml_golden.py for the
# rationale and regeneration protocol).
from .xml_golden import ORACLE as _GOLDEN  # noqa: E402

# xml_golden.py also holds the motif keys' goldens (operators/motifq.py
# re-exports those) — each module exposes only its own keys
ORACLE = {k: v for k, v in _GOLDEN.items() if k in QUERIES}
