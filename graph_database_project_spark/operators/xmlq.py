"""Graph queries over the reference's own XML corpus (its only test data —
`boeing_service_bulletin_{1,2,3}.xml`), exercising the full M0 spine:
wholetext scan → mapInPandas shred → relational node/edge derivation →
k-hop traversal → grouped result shaping.

These are rows-only for the driver (the DuckDB oracle has no XML/graph
views); exact golden counts are asserted in tests/test_graph_xml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph.shred import ingest_xml
from ..graph.store import GraphStore

REFERENCE_XML_GLOB = "/root/reference/boeing_service_bulletin_*.xml"
FLAGSHIP_BULLETIN = "737-00-1028"


def _store(spark: SparkSession) -> GraphStore:
    nodes, edges = ingest_xml(spark, REFERENCE_XML_GLOB)
    return GraphStore(nodes, edges)


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


QUERIES = {
    "xml_label_counts": q_xml_label_counts,
    "xml_rel_signatures": q_xml_rel_signatures,
    "xml_khop_flagship": q_xml_khop_flagship,
    "xml_shared_linenumbers": q_xml_shared_linenumbers,
}

# No DuckDB oracle: the graph tables come from XML ingest, not the
# pre-registered relational views → rows-only checks by design.
ORACLE: dict[str, str] = {}
