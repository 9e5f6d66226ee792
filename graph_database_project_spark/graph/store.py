"""GraphStore: the property graph as two Parquet-backed DataFrames
(SURVEY.md §1.5), with the reference's mutation surface re-expressed as
bulk set operations:

* MERGE/upsert        → left-anti + union            (2.A#3/#4)
* predicate delete    → filter + two anti-joins      (2.A#8, deleteneo.py)
* property SET        → conditional column overwrite (2.A#7)
* schema catalog      → aggregation over the tables  (§1.4 → §1.5)

Writes are partitioned by the ``batch`` ingestion-epoch column, so the
reference's batch rollback (delete all `Batch_X` nodes) is a partition drop
— metadata-only at scale. Plain Parquet has no ACID merge: mutations return
new DataFrames; ``write`` materializes under a single-writer assumption
(documented; Delta/Iceberg slots in here when the environment provides it).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .traverse import k_hop


def _require_posix(path: str, what: str) -> str:
    """Strip a ``file://`` scheme and refuse any other scheme: the rename-
    swap and compaction paths need local POSIX semantics (atomic
    os.rename); object stores have no atomic directory rename — there a
    transactional table format's metadata commit is the only correct
    option, so refusing beats a silently non-atomic copy."""
    if path.startswith("file://"):
        path = path[len("file://"):]
    if "://" in path:
        raise ValueError(
            f"{what} needs a local POSIX path, got {path!r}; "
            "use a transactional table format on object stores")
    return path


@dataclass
class GraphStore:
    nodes: DataFrame
    edges: DataFrame

    # -- IO ----------------------------------------------------------------
    def write(self, path: str, mode: str = "overwrite") -> None:
        self.nodes.write.mode(mode).partitionBy("batch").parquet(f"{path}/nodes")
        self.edges.write.mode(mode).partitionBy("batch").parquet(f"{path}/edges")

    def write_atomic(self, path: str) -> None:
        """Write-temp-then-swap (SURVEY §7.3b): materialize the new graph
        beside the old one, then switch with two directory renames, so a
        concurrent reader sees either the old store or the new one — never
        a half-written mix. Single-writer assumption documented; on a real
        deployment a transactional table format (Delta/Iceberg) replaces
        this with a metadata commit.

        NOTE: when self derives FROM the store at ``path`` (read-modify-
        write), the plan must not scan the old files mid-overwrite — the
        temp-dir write materializes everything before any rename, which is
        exactly why this exists instead of mode('overwrite') in place.

        The rename swap requires a POSIX filesystem local to the driver
        (os.rename atomicity); object stores (S3/GCS) have no atomic
        directory rename — there the Delta/Iceberg metadata-commit path
        above is the only correct option, so this guard refuses non-local
        schemes rather than doing a silently non-atomic copy.
        """
        import os
        import shutil
        import uuid

        path = _require_posix(path, "write_atomic")

        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        self.write(tmp)
        bak = f"{path}.bak-{uuid.uuid4().hex[:8]}"
        if os.path.exists(path):
            os.rename(path, bak)
        try:
            os.rename(tmp, path)
        except Exception:
            if os.path.exists(bak):  # roll back
                os.rename(bak, path)
            raise
        shutil.rmtree(bak, ignore_errors=True)

    @staticmethod
    def compact(spark: SparkSession, path: str,
                target_bytes: int = 128 * 1024 * 1024) -> dict:
        """Rewrite the store with right-sized files — the small-files
        compaction every long-lived ingest accumulates toward (each
        streaming microbatch / MERGE epoch appends its own files; a 100 TB
        table fed by minutely batches grows millions of KB-sized files,
        and scan task-scheduling overhead comes to dominate the read path).

        Sizing: rows-per-file is derived from the measured on-disk
        bytes/row (rows × target_bytes / bytes) and enforced through
        ``spark.sql.files.maxRecordsPerFile``, so an oversized batch splits
        into ~target_bytes files and a directory of tiny epoch files
        collapses toward one file per batch dir. Rows are repartitioned BY
        the batch column (ceil(bytes/target) partitions for write
        parallelism), so a row never crosses its batch dir. The rewrite
        goes through the same write-temp-then-swap as write_atomic, so
        readers never see a half-compacted store. Local-POSIX only, same
        guard and for the same reason (object stores want Delta/Iceberg
        OPTIMIZE).

        Returns {table: {files_before, files_after, bytes, rows}} for the
        audit log a compaction daemon would emit.
        """
        import math
        import os

        path = _require_posix(path, "compact")

        def _scan(d: str) -> tuple[int, int]:
            n_files = n_bytes = 0
            for root, _dirs, files in os.walk(d):
                for f in files:
                    if f.endswith(".parquet"):
                        n_files += 1
                        n_bytes += os.path.getsize(os.path.join(root, f))
            return n_files, n_bytes

        stats = {}
        store = GraphStore.read(spark, path)
        compacted = {}
        rows_per_file = []
        for table, df in [("nodes", store.nodes), ("edges", store.edges)]:
            before, nbytes = _scan(os.path.join(path, table))
            n_rows = df.count()
            n_out = max(1, math.ceil(nbytes / target_bytes))
            if nbytes > 0 and n_rows > 0:
                rows_per_file.append(
                    max(1, math.floor(n_rows * target_bytes / nbytes)))
            compacted[table] = df.repartition(n_out, F.col("batch"))
            stats[table] = {"files_before": before, "bytes": nbytes,
                            "rows": n_rows}
        # maxRecordsPerFile is session-wide: apply the tighter of the two
        # tables' budgets for the swap write, restore the caller's value
        # after (small-file overshoot on the other table is bounded by the
        # ratio of their bytes/row, fine for a maintenance job).
        conf_key = "spark.sql.files.maxRecordsPerFile"
        prev = spark.conf.get(conf_key, None)
        try:
            if rows_per_file:
                spark.conf.set(conf_key, str(min(rows_per_file)))
            GraphStore(compacted["nodes"], compacted["edges"]).write_atomic(path)
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        for table in stats:
            stats[table]["files_after"] = _scan(os.path.join(path, table))[0]
        return stats

    @classmethod
    def read(cls, spark: SparkSession, path: str) -> "GraphStore":
        return cls(
            nodes=spark.read.parquet(f"{path}/nodes"),
            edges=spark.read.parquet(f"{path}/edges"),
        )

    # -- MERGE / upsert ----------------------------------------------------
    def merge(self, new_nodes: DataFrame, new_edges: DataFrame) -> "GraphStore":
        """Idempotent MERGE keyed on deterministic ids: only-if-absent via
        left-anti join (the set-based form of the reference's per-row
        existence probe, xml2neo.py:32-41)."""
        add_n = new_nodes.join(self.nodes.select("id"), "id", "left_anti")
        add_e = new_edges.join(
            self.edges.select("src", "dst", "rel_type"),
            ["src", "dst", "rel_type"], "left_anti",
        )
        return GraphStore(self.nodes.unionByName(add_n),
                          self.edges.unionByName(add_e))

    # -- delete ------------------------------------------------------------
    def delete_where(self, pred: Column) -> "GraphStore":
        """DETACH DELETE: drop matching nodes and every incident edge
        (two anti-joins — deleteneo.py:10-12 set-based)."""
        doomed = self.nodes.filter(pred).select("id")
        nodes = self.nodes.join(doomed, "id", "left_anti")
        edges = (
            self.edges
            .join(doomed.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(doomed.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select(self.edges.columns)
        )
        return GraphStore(nodes, edges)

    def delete_tagged(self, tag: str = "added_for_bulletin") -> "GraphStore":
        """The reference's boolean-tag cascade delete (deleteneo.py:11:
        ``MATCH (n) WHERE n.{tag} = true DETACH DELETE n``)."""
        return self.delete_where(F.col("props").getItem(tag) == "true")

    def delete_batch(self, batch: str) -> "GraphStore":
        """Batch rollback — with batch partitioning this is a partition
        drop, no scan of surviving data. Null-safe: a plain ``!=`` would
        evaluate NULL for rows with no batch label and silently drop them."""
        keep = ~F.col("batch").eqNullSafe(batch)
        return GraphStore(
            self.nodes.filter(keep),
            self.edges.filter(keep),
        )

    # -- property SET ------------------------------------------------------
    def set_content(self, pred: Column, new_content: Column | str) -> "GraphStore":
        """Point property update (new-converter.js:136-140 SET n.content)."""
        val = F.lit(new_content) if isinstance(new_content, str) else new_content
        return GraphStore(
            self.nodes.withColumn(
                "content", F.when(pred, val).otherwise(F.col("content"))
            ),
            self.edges,
        )

    # -- catalog (§1.4: the hardcoded 35-label/34-reltype prompt catalog,
    #    derived instead of maintained) -----------------------------------
    def catalog_labels(self) -> DataFrame:
        return (
            self.nodes.select(F.explode("labels").alias("label"))
            .filter(~F.col("label").startswith("Batch_"))
            .groupBy("label").agg(F.count(F.lit(1)).alias("n_nodes"))
        )

    def catalog_relationships(self) -> DataFrame:
        """(src_label)-[:rel_type]->(dst_label) signatures with counts —
        the derived equivalent of first-graph.py:102-136."""
        lab = self.nodes.select(
            "id", F.filter("labels", lambda l: ~l.startswith("Batch_")).getItem(0).alias("label")
        )
        return (
            self.edges
            .join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "src_label"), "src")
            .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "dst_label"), "dst")
            .groupBy("src_label", "rel_type", "dst_label")
            .agg(F.count(F.lit(1)).alias("n_edges"))
        )

    # -- flagship read: seeded k-hop + grouped result ----------------------
    def khop_from(self, seed_pred: Column, depth: int = 3,
                  direction: str = "out") -> DataFrame:
        """The reference's chat-query contract (first-graph.py:141): matched
        node + connected nodes ≤ `depth` levels downward; result grouped
        per seed (first-graph.py:168-176)."""
        seeds = self.nodes.filter(seed_pred).select(
            F.col("id").alias("seed"), F.col("id").alias("node")
        )
        reached = k_hop(seeds, self.edges.select("src", "dst"), depth, direction)
        seed_names = self.nodes.select(F.col("id").alias("seed"),
                                       F.col("name").alias("seed_name"))
        detail = self.nodes.select(F.col("id").alias("node"),
                                   F.col("name").alias("node_name"),
                                   F.col("content").alias("node_content"))
        return (
            reached.join(seed_names, "seed").join(detail, "node")
            .select("seed", "seed_name", "node", "node_name", "node_content", "depth")
        )

    # Per-seed neighbor-list cap for khop_grouped: a supernode seed at
    # 100× scale would otherwise put its whole k-hop closure into ONE
    # aggregation buffer (the same single-buffer failure class as the r04
    # IVF M-step collect_list). The exact count survives in n_connected;
    # only the name listing truncates. Far above the reference corpus's
    # closure sizes, so the golden xml_khop oracle is unaffected.
    KHOP_GROUPED_CAP = 10_000

    def khop_grouped(self, seed_pred: Column, depth: int = 3,
                     cap: int | None = None) -> DataFrame:
        """Grouped shape: per-seed sorted list of reached node names
        (collect_list is order-nondeterministic → sort_array for stable
        output, SURVEY.md §7.3e). The list is flattened to a comma-joined
        string: registered query outputs must stay scalar (the driver's
        canonicalizer hashes cell values — array cells are unhashable, the
        r02/r03 `xml_khop_flagship` ERR). ``n_connected`` is the exact
        reach count; ``connected_names`` lists the first ``cap`` names in
        sorted order. The cap is applied BEFORE collection (row_number
        over the group key, then collect only rn ≤ cap — collect_list
        skips the NULLed tail), so the aggregation buffer itself is
        bounded; a slice() after collect_list would cap only the output
        while the buffer still held the full closure. The window sort and
        the groupBy hash on the same key, so this adds no extra
        exchange."""
        from pyspark.sql import Window

        cap = self.KHOP_GROUPED_CAP if cap is None else cap
        det = self.khop_from(seed_pred, depth)
        w = Window.partitionBy("seed_name").orderBy("node_name", "node")
        return (
            det.filter(F.col("depth") > 0)
            .withColumn("rn", F.row_number().over(w))
            .groupBy("seed_name")
            .agg(
                F.sort_array(F.collect_list(
                    F.when(F.col("rn") <= cap,
                           F.struct("node_name", "node")))).alias("connected"),
                F.count(F.lit(1)).alias("n_connected"),
            )
            .select("seed_name",
                    F.concat_ws(",", F.col("connected.node_name")).alias("connected_names"),
                    "n_connected")
        )
