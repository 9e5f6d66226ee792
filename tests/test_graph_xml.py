"""Golden-fixture tests for XML ingestion (SURVEY.md §5.2): the reference's
3 bundled bulletins are its only test data; these assert exact structural
invariants of the shredded graph plus MERGE idempotence and delete-cascade
integrity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_project_spark.graph.shred import ingest_xml, shred_xml
from graph_database_project_spark.graph.store import GraphStore

XML_GLOB = "/root/reference/boeing_service_bulletin_*.xml"


@pytest.fixture(scope="module")
def store(spark):
    nodes, edges = ingest_xml(spark, XML_GLOB)
    return GraphStore(nodes.cache(), edges.cache())


def test_three_roots(store):
    roots = store.nodes.filter(F.array_contains("labels", "ServiceBulletin"))
    names = sorted(r.name for r in roots.collect())
    assert names == ["737-00-1028", "737-00-1029", "737-00-1030"]


def test_shred_full_tree_no_multiline_drop(spark):
    """The reference's line-oriented parser drops multi-line elements
    (xml2neo.py:69,99 — e.g. <background>); we shred the full tree, so
    every bulletin must carry a background node WITH content."""
    sh = shred_xml(spark, XML_GLOB)
    bg = sh.filter((F.col("tag") == "background") & F.col("content").isNotNull())
    assert bg.count() == 3


def test_repeated_siblings_survive(store):
    """MERGE-on-{name} in the reference collapses the two <task> elements
    of one bulletin (latest.js:28-37 vs data); our path-keyed identity must
    keep them distinct (SURVEY.md §7.4)."""
    tasks = store.nodes.filter(F.array_contains("labels", "task"))
    per_doc = {r.docnbr: r["count"] for r in tasks.groupBy("docnbr").count().collect()}
    # corpus ground truth: bulletin 1 has TWO <task> siblings (identical
    # label/name, different path) — MERGE-on-{name} would collapse them to 1
    assert per_doc == {"737-00-1028": 2, "737-00-1029": 1, "737-00-1030": 1}


def test_every_nonroot_has_one_parent(store):
    """Property invariant: exactly one IS_PART_OF edge per non-root
    document node (SURVEY.md §5.4)."""
    doc_nodes = store.nodes.filter(
        ~F.array_contains("labels", "ServiceBulletin")
        & ~F.array_contains("labels", "Airplane")
        & ~F.array_contains("labels", "LineNumber")
    )
    parents = store.edges.filter(F.col("rel_type") == "IS_PART_OF") \
        .groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    joined = doc_nodes.join(parents, doc_nodes.id == parents.src, "left")
    bad = joined.filter(F.coalesce("n", F.lit(0)) != 1)
    assert bad.count() == 0


def test_linenumbers_shared_across_bulletins(store):
    """Cross-document entity resolution: every line number string maps to
    ONE node regardless of how many bulletins reference it."""
    lines = store.nodes.filter(F.array_contains("labels", "LineNumber"))
    assert lines.count() == lines.select("name").distinct().count()
    # and the corpus genuinely shares line numbers between bulletins:
    incl = store.edges.filter(F.col("rel_type") == "includes") \
        .groupBy("dst").agg(F.count(F.lit(1)).alias("n_airplanes"))
    assert incl.filter(F.col("n_airplanes") > 1).count() > 0


def test_bidirectional_edges_balanced(store):
    down = store.edges.filter(F.col("rel_type").startswith("HAS_")).count()
    up = store.edges.filter(F.col("rel_type") == "IS_PART_OF").count()
    assert down == up and down > 0


def test_flagship_khop_reaches_subtree(store):
    got = store.khop_from(
        F.array_contains("labels", "ServiceBulletin") & (F.col("name") == "737-00-1028"),
        depth=3,
    )
    by_depth = {r.depth: r["n"] for r in
                got.groupBy("depth").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_depth[0] == 1
    # golden counts for bulletin 737-00-1028 (hand-verified against the XML):
    # depth 1 = 6 top-level sections; depth 2 = 19 elements; depth 3 = 15
    # (leaf details + the Airplane effectivity node via `effects`)
    assert by_depth[1] == 6
    assert by_depth[2] == 19
    assert by_depth[3] == 15
    # LineNumber nodes are 4 hops away → absent at depth ≤ 3
    ln = got.join(
        store.nodes.filter(F.array_contains("labels", "LineNumber")).select("id"),
        got.node == F.col("id"),
    )
    assert ln.count() == 0


def test_merge_idempotent(spark, store):
    """Re-ingesting the same documents must be a no-op (MERGE, 2.A#3/#4)."""
    nodes2, edges2 = ingest_xml(spark, XML_GLOB)
    merged = store.merge(nodes2, edges2)
    assert merged.nodes.count() == store.nodes.count()
    assert merged.edges.count() == store.edges.count()


def test_delete_tagged_cascades(store):
    """deleteneo.py semantics: tag-predicate delete removes nodes AND all
    incident edges (no dangling endpoints)."""
    after = store.delete_tagged("added_for_bulletin")
    assert after.nodes.count() == 0
    assert after.edges.count() == 0


def test_delete_where_leaves_no_dangling_edges(store):
    after = store.delete_where(F.array_contains("labels", "Airplane"))
    ids = after.nodes.select("id")
    dangling = (
        after.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
        .union(after.edges.join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti"))
    )
    assert dangling.count() == 0


def test_set_content_point_update(store):
    updated = store.set_content(
        F.array_contains("labels", "compliance"), "UPDATED"
    )
    vals = [r.content for r in
            updated.nodes.filter(F.array_contains("labels", "compliance")).collect()]
    assert vals and all(v == "UPDATED" for v in vals)
    untouched = updated.nodes.filter(F.array_contains("labels", "background"))
    assert all(r.content != "UPDATED" for r in untouched.collect())


def test_catalog_derivation(store):
    labels = {r.label for r in store.catalog_labels().collect()}
    assert {"ServiceBulletin", "Airplane", "LineNumber", "header", "task"} <= labels
    sigs = store.catalog_relationships().collect()
    sig_set = {(r.src_label, r.rel_type, r.dst_label) for r in sigs}
    assert ("ServiceBulletin", "HAS_HEADER", "header") in sig_set
    assert ("Airplane", "includes", "LineNumber") in sig_set


def test_batch_partition_roundtrip(spark, store, tmp_path):
    path = str(tmp_path / "graph")
    store.write(path)
    back = GraphStore.read(spark, path)
    assert back.nodes.count() == store.nodes.count()
    assert back.edges.count() == store.edges.count()
    assert "batch" in back.nodes.columns


def test_batch_epoch_diff_and_rollback(spark):
    """Ingestion-epoch semantics (new-converter.js:12 Batch_ labels): two
    epochs coexist under distinct batch values; delete_batch rolls one back
    without touching the other (partition-drop shape at scale)."""
    import glob as _g
    files = sorted(_g.glob("/root/reference/boeing_service_bulletin_*.xml"))
    n1, e1 = ingest_xml(spark, files[:1], batch="Batch_A")
    n2, e2 = ingest_xml(spark, files[1:2], batch="Batch_B")
    store = GraphStore(n1, e1).merge(n2, e2)
    assert set(r.batch for r in store.nodes.select("batch").distinct().collect()) \
        == {"Batch_A", "Batch_B"}

    # epoch diff: nodes added by B = everything not in A (set-op row of §2.B)
    added_by_b = store.nodes.filter(F.col("batch") == "Batch_B")
    assert added_by_b.count() == n2.count()

    rolled = store.delete_batch("Batch_B")
    assert rolled.nodes.count() == n1.count()
    assert rolled.edges.count() == e1.count()
    assert rolled.nodes.filter(F.col("batch") == "Batch_B").count() == 0


def test_delete_batch_keeps_null_batch_rows(spark):
    """NULL-batch rows (pre-epoch data) must survive a batch rollback —
    a plain != predicate would silently drop them."""
    import glob as _g
    files = sorted(_g.glob("/root/reference/boeing_service_bulletin_*.xml"))
    n1, e1 = ingest_xml(spark, files[:1], batch="Batch_A")
    n_null = n1.withColumn("batch", F.lit(None).cast("string"))
    e_null = e1.withColumn("batch", F.lit(None).cast("string"))
    store = GraphStore(n_null, e_null)
    rolled = store.delete_batch("Batch_A")
    assert rolled.nodes.count() == n1.count()
    assert rolled.edges.count() == e1.count()


def test_write_atomic_rejects_object_store_paths(store):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="POSIX"):
        store.write_atomic("s3://bucket/graph")


def test_write_atomic_read_modify_write(spark, store, tmp_path):
    """write-temp-then-swap: a store read from disk, mutated, and written
    back to the SAME path must not corrupt itself (the in-place overwrite
    failure mode this method exists to prevent)."""
    path = str(tmp_path / "graph")
    store.write(path)
    on_disk = GraphStore.read(spark, path)
    n_before = on_disk.nodes.count()

    mutated = on_disk.delete_where(F.array_contains("labels", "Airplane"))
    n_expected = mutated.nodes.count()
    mutated.write_atomic(path)

    back = GraphStore.read(spark, path)
    assert back.nodes.count() == n_expected < n_before
    assert back.nodes.filter(F.array_contains("labels", "Airplane")).count() == 0


def test_subtree_content_aggregation(spark):
    """2.A#21 gatherContent parity: per-section descendant text in document
    order; bulletin 1's summary subtree must start with its background."""
    from graph_database_project_spark.operators.xmlq import xml_subtree_gathered
    rows = {(r.docnbr, r.section): r for r in xml_subtree_gathered(spark).collect()}
    summary = rows[("737-00-1028", "summary")]
    assert summary.gathered_content.startswith("In March 2019")
    assert summary.n_fragments == 2
    # every bulletin contributes its six top-level sections
    assert len({k for k in rows if k[0] == "737-00-1028"}) == 6


def test_title_hierarchy(spark):
    """2.A#20 TITLE-driven hierarchy: numbered sub-titles nest under their
    parent title; each document's root title hangs off ServiceBulletin."""
    from graph_database_project_spark.operators.xmlq import q_xml_title_hierarchy
    rows = q_xml_title_hierarchy(spark, "").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.docnbr, []).append((r.title_label, r.parent_label))
    for doc, pairs in by_doc.items():
        roots = [t for t, p in pairs if p == "ServiceBulletin"]
        assert len(roots) == 1, (doc, pairs)
        for t, p in pairs:
            if p != "ServiceBulletin":
                assert p == roots[0], (doc, t, p)


def test_compact_reduces_files_preserves_rows(spark, store, tmp_path):
    """Small-files compaction: a store written with an artificially
    fragmented layout (one file per shuffle partition per batch dir) must
    compact to ~one file per batch dir with identical contents."""
    path = str(tmp_path / "graph")
    fragmented = GraphStore(store.nodes.repartition(16),
                            store.edges.repartition(16))
    fragmented.write(path)
    rows_before = (GraphStore.read(spark, path).nodes.count(),
                   GraphStore.read(spark, path).edges.count())

    stats = GraphStore.compact(spark, path)

    assert stats["nodes"]["files_before"] > stats["nodes"]["files_after"]
    assert stats["edges"]["files_before"] > stats["edges"]["files_after"]
    back = GraphStore.read(spark, path)
    assert (back.nodes.count(), back.edges.count()) == rows_before
    assert "batch" in back.nodes.columns
    # batch-dir alignment survives: one partition dir per batch value
    n_batches = back.nodes.select("batch").distinct().count()
    assert stats["nodes"]["files_after"] <= max(n_batches, 1) * 2

    # target_bytes must actually govern sizing: recompacting with a tiny
    # target splits the just-merged files back up (maxRecordsPerFile path)
    small = GraphStore.compact(spark, path, target_bytes=8 * 1024)
    assert small["nodes"]["files_after"] > stats["nodes"]["files_after"]
    back2 = GraphStore.read(spark, path)
    assert (back2.nodes.count(), back2.edges.count()) == rows_before


def test_compact_rejects_object_store_paths(spark):
    with pytest.raises(ValueError):
        GraphStore.compact(spark, "s3://bucket/graph")


def test_khop_grouped_caps_supernode_listing(spark):
    """A supernode seed must not blow a single aggregation buffer at
    scale: khop_grouped collects at most `cap` names (NULLed past the
    row_number cap BEFORE collect_list, so the buffer itself is bounded)
    while n_connected stays the exact reach count, and the kept names are
    the sorted prefix (deterministic truncation)."""
    n = 50
    nodes = spark.createDataFrame(
        [(0, "hub", "c0")] + [(i, f"n{i:03d}", f"c{i}") for i in range(1, n + 1)],
        "id long, name string, content string")
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, n + 1)], "src long, dst long")
    store = GraphStore(nodes, edges)
    row = store.khop_grouped(F.col("name") == "hub", depth=1, cap=10).first()
    assert row.n_connected == n
    names = row.connected_names.split(",")
    assert names == [f"n{i:03d}" for i in range(1, 11)]


def _independent_elementtree_shred():
    """Plain ElementTree re-implementation of the shred contract — no
    Spark, no shred/store code, no shared helpers (semantics re-derived
    from the documented contract: shred.py module docstring /
    FIXTURES.md §A.2). Returns (nodes: key→label, edges: {(src_key,
    dst_key, rel_type)}). Shared by the golden-independence tests below;
    node identity keys carry ``name`` at position 1."""
    import glob as _glob
    import re as _re
    import xml.etree.ElementTree as _ET

    BATCH = "Batch_2024_08_26"
    MARKER = " Airplane(s), line number(s) "

    def sanitize(tag: str) -> str:
        return _re.sub(r"[^a-zA-Z0-9]", "_", tag).upper()

    nodes: dict[tuple, str] = {}   # identity key -> label
    edges: set[tuple] = set()      # (src_key, dst_key, rel_type)

    for path in sorted(_glob.glob("/root/reference/boeing_service_bulletin_*.xml")):
        root = _ET.parse(path).getroot()
        docnbr = root.findtext("./header/number")
        if docnbr is None:
            docnbr = root.attrib.get("docnbr", path.rsplit("/", 1)[-1])
        docnbr = docnbr.strip()

        def key(label, name, content, elpath, dn):
            return (label, name, content or "", elpath or "", dn or "", BATCH)

        root_key = key("ServiceBulletin", docnbr, None, None, docnbr)
        nodes[root_key] = "ServiceBulletin"

        def walk(el, elpath, parent_key):
            for i, child in enumerate(el):
                cpath = f"{elpath}/{child.tag}[{i}]"
                ctext = (child.text or "").strip() or None
                ckey = key(child.tag, child.tag, ctext, cpath, docnbr)
                nodes[ckey] = child.tag
                edges.add((parent_key, ckey, "HAS_" + sanitize(child.tag)))
                edges.add((ckey, parent_key, "IS_PART_OF"))
                # effectivity fan-out: <airplanes> under an <effectivity>
                if (child.tag == "airplanes" and ctext is not None
                        and el.tag == "effectivity"):
                    parts = ctext.split(MARKER)
                    types = [t for t in _re.split(r"\s+", parts[0].strip())
                             if t not in ("", "and")]
                    lns = ([s.strip() for s in parts[1].split(",")
                            if s.strip() != ""] if len(parts) > 1 else [])
                    for ty in types:
                        ap_key = key("Airplane", ty, None, None, docnbr)
                        nodes[ap_key] = "Airplane"
                        edges.add((parent_key, ap_key, "effects"))
                        edges.add((ap_key, parent_key, "affected_by"))
                        for ln in lns:
                            ln_key = key("LineNumber", ln, None, None, None)
                            nodes[ln_key] = "LineNumber"
                            edges.add((ap_key, ln_key, "includes"))
                            edges.add((ln_key, ap_key, "included_in"))
                walk(child, cpath, ckey)

        walk(root, f"/{root.tag}[0]", root_key)

    return nodes, edges


def test_goldens_match_independent_elementtree_recomputation():
    """Break the golden self-reference (r07 verdict #2): the xml_* oracles
    are generated FROM the engine (scripts/gen_xml_golden.py collects the
    queries), so by themselves they freeze behavior rather than verify it.
    This test recomputes ``xml_label_counts`` and ``xml_rel_signatures``
    from the raw bulletins with the plain ElementTree walk above and
    asserts equality with the pinned goldens. A shred-semantics drift
    that slipped into a regenerated golden now fails HERE, against an
    implementation that shares nothing with the engine."""
    from collections import Counter

    from graph_database_project_spark.operators.xml_golden import (
        GOLDEN_XML_LABEL_COUNTS_ROWS, GOLDEN_XML_REL_SIGNATURES_ROWS)

    nodes, edges = _independent_elementtree_shred()

    label_counts = sorted(Counter(nodes.values()).items())
    assert label_counts == sorted(GOLDEN_XML_LABEL_COUNTS_ROWS)

    sig = Counter((nodes[s], r, nodes[d]) for s, d, r in edges)
    signatures = sorted((sl, r, dl, n) for (sl, r, dl), n in sig.items())
    assert signatures == sorted(GOLDEN_XML_REL_SIGNATURES_ROWS)


def test_flagship_golden_matches_independent_bfs():
    """Extend the golden independence to the FLAGSHIP: 3-hop outgoing BFS
    from ServiceBulletin 737-00-1028 over the independently-shredded edge
    set, names sorted and comma-joined. The joined string is invariant to
    khop_grouped's (name, internal-id) tie-break — equal names produce
    identical segments — so the recomputation needs no engine ids. A
    traversal- or shred-semantics drift regenerated into the golden fails
    here against pure ElementTree + BFS."""
    from graph_database_project_spark.operators.xml_golden import (
        GOLDEN_XML_KHOP_FLAGSHIP_ROWS)

    nodes, edges = _independent_elementtree_shred()
    seed = next(k for k, lbl in nodes.items()
                if lbl == "ServiceBulletin" and k[1] == "737-00-1028")
    out = {}
    for s, d, _r in edges:
        out.setdefault(s, set()).add(d)
    reached, frontier = set(), {seed}
    for _hop in range(3):
        frontier = {d for s in frontier for d in out.get(s, ())} \
            - reached - {seed}
        reached |= frontier
    names = ",".join(sorted(k[1] for k in reached))
    assert GOLDEN_XML_KHOP_FLAGSHIP_ROWS == [
        ("737-00-1028", names, len(reached))]
