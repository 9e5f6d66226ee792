"""Graph operators exercised over a *derived* graph built from the driver's
relational testdata, so the DuckDB oracle can verify them with recursive
CTEs (SURVEY.md §2.B "Multi-hop self-join … SQL (recursive CTE)").

The graph: the region → nation → customer → orders containment hierarchy,
encoded exactly like the engine's property-graph tables (surrogate long
ids, disjoint id ranges per label — the same trick the XML shredder uses).
This mirrors the reference's flagship query shape — a depth-3 downward
expansion from a seed node (`first-graph.py:141`) — on data the oracle can
see.

PageRank is iterative-with-aggregation, which a *recursive* CTE can't
express (no aggregates in the recursive term) — but the iteration count is
FIXED (10), so the oracle unrolls it as 10 chained plain CTEs
(``_pagerank_oracle_sql``). Float determinism holds because the referral
ring has in-degree ≤ 1 (gcd(7, n_cust) = 1 makes ``(7c+1) mod n``
injective), so no sum depends on accumulation order; 6-decimal rounding
then matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..graph.traverse import (connected_components, k_core, k_hop,
                              label_propagation, pagerank)
from ..io import load_table

# Disjoint surrogate-id ranges per node label.
_NATION_BASE = 10
_CUST_BASE = 1_000
_ORDER_BASE = 10_000_000


def _hierarchy_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    e1 = nation.select(
        F.col("n_regionkey").cast("long").alias("src"),
        (F.col("n_nationkey") + _NATION_BASE).cast("long").alias("dst"),
    )
    e2 = cust.select(
        (F.col("c_nationkey") + _NATION_BASE).cast("long").alias("src"),
        (F.col("c_custkey") + _CUST_BASE).cast("long").alias("dst"),
    )
    e3 = orders.select(
        (F.col("o_custkey") + _CUST_BASE).cast("long").alias("src"),
        (F.col("o_orderkey") + _ORDER_BASE).cast("long").alias("dst"),
    )
    return e1.union(e2).union(e3)


def q_khop_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop downward expansion from every region seed (reference flagship
    shape: seed match → bounded directed traversal → per-seed rollup).

    Oracle: recursive CTE over the same derived edges.
    """
    region = load_table(spark, sf_dir, "region")
    seeds = region.select(
        F.col("r_regionkey").cast("long").alias("seed"),
        F.col("r_regionkey").cast("long").alias("node"),
    )
    reached = k_hop(seeds, _hierarchy_edges(spark, sf_dir), depth=3, direction="out")
    return reached.groupBy("seed", "depth").agg(F.count(F.lit(1)).alias("n_nodes"))


Q_KHOP_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(n_nationkey + {_NATION_BASE} AS BIGINT) AS dst FROM nation
  UNION ALL
  SELECT CAST(c_nationkey + {_NATION_BASE} AS BIGINT), CAST(c_custkey + {_CUST_BASE} AS BIGINT) FROM customer
  UNION ALL
  SELECT CAST(o_custkey + {_CUST_BASE} AS BIGINT), CAST(o_orderkey + {_ORDER_BASE} AS BIGINT) FROM orders
), walk AS (
  SELECT CAST(r_regionkey AS BIGINT) AS seed, CAST(r_regionkey AS BIGINT) AS node, 0 AS depth
  FROM region
  UNION ALL
  SELECT w.seed, e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < 3
), dists AS (
  SELECT seed, node, min(depth) AS depth FROM walk GROUP BY seed, node
)
SELECT seed, depth, count(*) AS n_nodes FROM dists GROUP BY seed, depth
"""


def q_khop_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-seed variant returning the actual frontier rows (node ids +
    min depth) — the exact result shape the reference's chat query consumes
    (`first-graph.py:168-176` groups connected nodes per seed)."""
    seeds = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select(
            F.col("r_regionkey").cast("long").alias("seed"),
            F.col("r_regionkey").cast("long").alias("node"),
        )
    )
    return k_hop(seeds, _hierarchy_edges(spark, sf_dir), depth=2, direction="out") \
        .select("seed", "node", "depth")


Q_KHOP_SEEDED_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(n_nationkey + {_NATION_BASE} AS BIGINT) AS dst FROM nation
  UNION ALL
  SELECT CAST(c_nationkey + {_NATION_BASE} AS BIGINT), CAST(c_custkey + {_CUST_BASE} AS BIGINT) FROM customer
  UNION ALL
  SELECT CAST(o_custkey + {_CUST_BASE} AS BIGINT), CAST(o_orderkey + {_ORDER_BASE} AS BIGINT) FROM orders
), walk AS (
  SELECT CAST(r_regionkey AS BIGINT) AS seed, CAST(r_regionkey AS BIGINT) AS node, 0 AS depth
  FROM region WHERE r_name = 'EUROPE'
  UNION ALL
  SELECT w.seed, e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < 2
)
SELECT seed, node, min(depth) AS depth FROM walk GROUP BY seed, node
"""


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a chain graph: customers are linked to the
    next custkey when they share a nation — components are maximal runs.
    Verified against a DuckDB transitive-closure recursive CTE (UNION
    dedup terminates the cycle).
    """
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("u"), "c_nationkey")
    b = cust.select(F.col("c_custkey").alias("v"), F.col("c_nationkey").alias("vn"))
    edges = (
        a.join(b, (b.v == a.u + 1) & (a.c_nationkey == b.vn))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    vertices = cust.select(F.col("c_custkey").cast("long").alias("node"))
    return connected_components(vertices, edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")))


Q_CC_SQL = """
WITH RECURSIVE e0 AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b
    ON b.c_custkey = a.c_custkey + 1 AND a.c_nationkey = b.c_nationkey
), und AS (
  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
), reach AS (
  SELECT CAST(c_custkey AS BIGINT) AS node, CAST(c_custkey AS BIGINT) AS r FROM customer
  UNION
  SELECT reach.node, CAST(und.v AS BIGINT) FROM reach JOIN und ON und.u = reach.r
)
SELECT node, min(r) AS component FROM reach GROUP BY node
"""


def q_graph_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL connected components — the IVM (incremental view
    maintenance) form a 100 TB graph store actually runs: stored per-node
    labels from the base edge set, then a DELTA batch of new edges merges
    components WITHOUT recomputing over |V|. The delta pass contracts
    each new edge to its endpoints' stored labels, runs CC on that
    COMPONENT-LEVEL graph (|affected components| nodes — orders of
    magnitude below |V|), and relabels by a single left join; untouched
    components never re-enter the loop.

    Correctness is a merge-equivalence contract, machine-checked two
    ways: the oracle is the full-recompute recursive CTE over base∪delta
    (the driver hash forces incremental ≡ recompute), and
    tests/test_traverse.py asserts the same equality in-engine plus the
    contraction-size pin. Min-label canonicality is what makes the
    contraction sound: the merged component's label is the min over its
    members' labels, and each stored label is already the min of its own
    component, so min over component-level labels equals min over nodes.

    Graph: the same nation-chain edges as ``graph_connected_components``,
    deterministically split — edges at src % 7 == 0 arrive as the delta.
    """
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("u"), "c_nationkey")
    b = cust.select(F.col("c_custkey").alias("v"),
                    F.col("c_nationkey").alias("vn"))
    edges = (a.join(b, (b.v == a.u + 1) & (a.c_nationkey == b.vn))
             .select(F.col("u").cast("long").alias("src"),
                     F.col("v").cast("long").alias("dst")))
    base_e = edges.filter(F.col("src") % 7 != 0)
    delta_e = edges.filter(F.col("src") % 7 == 0).localCheckpoint(eager=True)
    verts = cust.select(F.col("c_custkey").cast("long").alias("node"))
    # the "stored" state a deployment would read back from parquet
    labels0 = connected_components(verts, base_e).localCheckpoint(eager=True)
    la = labels0.select(F.col("node").alias("src"),
                        F.col("component").alias("ca"))
    lb = labels0.select(F.col("node").alias("dst"),
                        F.col("component").alias("cb"))
    comp_e = (delta_e.join(la, "src").join(lb, "dst")
              .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
              .filter(F.col("src") != F.col("dst")).distinct())
    comp_v = (comp_e.select(F.col("src").alias("node"))
              .union(comp_e.select(F.col("dst").alias("node"))).distinct())
    remap = (connected_components(comp_v, comp_e)
             .withColumnRenamed("node", "old")
             .withColumnRenamed("component", "new"))
    return (labels0.join(remap, labels0["component"] == remap["old"], "left")
            .select("node",
                    F.coalesce("new", "component").alias("component")))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 iterations, d=0.85) over the customer→customer referral
    ring derived from orders: edge custkey → (custkey*7+1) mod n_cust.
    Deterministic synthetic digraph with cycles and varying in-degree.
    Value-checked against ``_pagerank_oracle_sql`` (the fixed 10 iterations
    unrolled as chained CTEs in DuckDB); closed-form exactness additionally
    covered in tests/test_traverse.py.
    """
    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    vertices = cust.select(F.col("c_custkey").cast("long").alias("node"))
    edges = cust.select(
        F.col("c_custkey").cast("long").alias("src"),
        ((F.col("c_custkey") * 7 + 1) % n).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    ranks = pagerank(vertices, edges, n_iter=10, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def _pagerank_oracle_sql(n_iter: int = 10, damping: float = 0.85) -> str:
    """DuckDB twin of ``q_pagerank``: the fixed iteration count unrolled as
    chained CTEs, mirroring graph/traverse.py:pagerank term by term —
    contribution join, dangling-mass redistribution, (1-d) teleport. All
    literals are CAST AS DOUBLE so both engines do identical IEEE
    arithmetic ((1-d) is computed Python-side in both, same bits)."""
    one_minus_d = repr(1.0 - damping)
    d = repr(damping)
    parts = [f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
verts AS (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer),
e AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS src,
         CAST((c_custkey * 7 + 1) % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM customer
  WHERE CAST(c_custkey AS BIGINT)
        != CAST((c_custkey * 7 + 1) % (SELECT n FROM nn) AS BIGINT)
),
od AS MATERIALIZED (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM verts)"""]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f""",
d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) / (SELECT n FROM nn) AS dm
  FROM r{p} r LEFT JOIN od ON od.src = r.node
  WHERE od.src IS NULL
),
r{i} AS MATERIALIZED (
  SELECT v.node,
         CAST({one_minus_d} AS DOUBLE)
         + CAST({d} AS DOUBLE)
           * (COALESCE(m.in_mass, CAST(0 AS DOUBLE)) + (SELECT dm FROM d{i})) AS rank
  FROM verts v
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / od.out_deg) AS in_mass
    FROM e JOIN r{p} r ON r.node = e.src JOIN od ON od.src = e.src
    GROUP BY e.dst
  ) m ON m.node = v.node
)""")
    parts.append(f"\nSELECT node, round(rank, 6) AS rank FROM r{n_iter}")
    return "".join(parts)


Q_PAGERANK_SQL = _pagerank_oracle_sql()


# Personalized-PageRank seed set: custkey % PPR_SEED_MOD == PPR_SEED_REM —
# sparse (≈1% of nodes) so teleport locality is visible, sf-scaling (2
# seeds at sf0.001, ~15 at sf0.01), and co-prime with the ring stride 7 so
# seeds spread over the referral cycle instead of clustering.
PPR_SEED_MOD, PPR_SEED_REM = 101, 7


def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank (seeded teleport) over the same referral ring
    as ``graph_pagerank`` — the seeded-relevance generalization of the
    reference's flagship "n-hop from seed" query (first-graph.py:141):
    instead of asking *which nodes are ≤ k hops from the seeds*, it asks
    *how much of a surfing-from-the-seeds process's time each node gets*,
    the standard recommendation/RAG relevance score.

    Semantics: rank₀ = p, rank_{i+1}(v) = (1−d)·p(v) + d·(in_mass(v) +
    dangling·p(v)) with p uniform over the seed set (Σp = 1) — mass
    conservation makes ranks a probability distribution concentrated near
    the seeds (asserted in tests/test_traverse.py). Per-round cost is
    IDENTICAL to global PageRank: same contribution join, same dangling
    aggregate, one extra narrow column (p) in the rank update.

    Float determinism: same accepted class as graph_pagerank — chained
    identical IEEE expression trees both engines ((1−d), d, and 1/|S| are
    single double divisions computed identically), in-mass sums are
    per-node singletons on this in-degree-≤1 ring. Oracle: the fixed 10
    iterations unrolled as MATERIALIZED CTEs.
    """
    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    vertices = cust.select(F.col("c_custkey").cast("long").alias("node"))
    edges = cust.select(
        F.col("c_custkey").cast("long").alias("src"),
        ((F.col("c_custkey") * 7 + 1) % n).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    seeds = vertices.filter(
        F.col("node") % PPR_SEED_MOD == PPR_SEED_REM)
    m = seeds.count()
    personalize = seeds.select("node", F.lit(1.0 / m).alias("p"))
    ranks = pagerank(vertices, edges, n_iter=10, damping=0.85,
                     personalize=personalize)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def _ppr_oracle_sql(n_iter: int = 10, damping: float = 0.85) -> str:
    """DuckDB twin of ``q_pagerank_personalized``: unrolled CTE chain
    mirroring traverse.py's personalized branch term by term — seeded
    teleport (1−d)·p, dangling mass redistributed onto p (no /n), rank₀
    = p. 1/|S| is one double division in both engines (identical IEEE
    bits to the Python-side ``1.0 / m`` Spark embeds)."""
    one_minus_d = repr(1.0 - damping)
    d = repr(damping)
    parts = [f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
verts AS (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer),
e AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS src,
         CAST((c_custkey * 7 + 1) % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM customer
  WHERE CAST(c_custkey AS BIGINT)
        != CAST((c_custkey * 7 + 1) % (SELECT n FROM nn) AS BIGINT)
),
od AS MATERIALIZED (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
ns AS (SELECT count(*) AS m FROM verts
       WHERE node % {PPR_SEED_MOD} = {PPR_SEED_REM}),
pv AS MATERIALIZED (
  SELECT node,
         CASE WHEN node % {PPR_SEED_MOD} = {PPR_SEED_REM}
              THEN CAST(1.0 AS DOUBLE) / (SELECT m FROM ns)
              ELSE CAST(0.0 AS DOUBLE) END AS p
  FROM verts),
r0 AS MATERIALIZED (SELECT node, p AS rank FROM pv)"""]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f""",
d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dm
  FROM r{p} r LEFT JOIN od ON od.src = r.node
  WHERE od.src IS NULL
),
r{i} AS MATERIALIZED (
  SELECT v.node,
         CAST({one_minus_d} AS DOUBLE) * v.p
         + CAST({d} AS DOUBLE)
           * (COALESCE(m.in_mass, CAST(0 AS DOUBLE))
              + (SELECT dm FROM d{i}) * v.p) AS rank
  FROM pv v
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / od.out_deg) AS in_mass
    FROM e JOIN r{p} r ON r.node = e.src JOIN od ON od.src = e.src
    GROUP BY e.dst
  ) m ON m.node = v.node
)""")
    parts.append(f"\nSELECT node, round(rank, 6) AS rank FROM r{n_iter}")
    return "".join(parts)


Q_PPR_SQL = _ppr_oracle_sql()


# Incremental-PageRank delta: the base graph is the INTACT funnel; the
# delta batch ADDS one shortcut edge per node with src % PR_DELTA_MOD == 0
# (every 11th node, sampling every tree level), targeting the childless
# leaf half (dst = N − src div 4 ≥ 3N/4). Additive — so neither phase has
# any dangling node and no float fold ever exceeds two terms (see
# q_graph_pagerank_incremental's docstring). Base / correction rounds below.
PR_DELTA_MOD = 11
PR_BASE_ROUNDS = 10
PR_CORR_ROUNDS = 4


def _pr_incr_graphs(spark: SparkSession, sf_dir: str):
    """The incremental-PageRank substrate — ONE builder shared with
    tests/test_traverse.py (the _lpa_graph discipline): returns
    ``(verts, base_e, full_e)`` where base_e is the intact binary
    in-tree funnel (src → src div 2) and full_e additionally carries
    the delta batch of shortcut edges src → N − src div 4 for leaf-half
    sources (src % 11 == 0 AND 2·src > N).

    Both shape choices are load-bearing: (a) bit-exact parity — the
    target N − src div 4 lands in the childless leaf half (2·dst > N,
    so no funnel mass arrives there) and at most one src per div-4
    bucket is ≡ 0 (mod 11), so every shortcut target receives EXACTLY
    one in-edge and every funnel target keeps its ≤ 2 children; and
    custkeys run 0..N with node 0's funnel edge 0→0 self-looping away
    and node 0 excluded from shortcut sources (0·2 > N fails), so the
    dangling set is exactly {node 0} in BOTH phases — a ONE-term,
    order-free sum (the r11 advice fix: the old removal-based delta
    made ~N/11 nodes dangling in the base phase, a heterogeneous
    engine-order-dependent fold outside the ≤2-term safe class);
    (b) the warm-start story — leaf-half sources carry little rank
    (≈(1−d)), so the delta perturbs the fixed point mildly and the
    stored vector stays close to it (measured at sf0.001: warm/cold
    max-norm ratio 0.26, L1 ratio 0.12), whereas mid-tree sources
    divert half their up-flowing mass and compound the shift along the
    root path (ratio degraded to ~0.7 — the warm start stopped clearly
    winning)."""
    cust = load_table(spark, sf_dir, "customer")
    verts = cust.select(F.col("c_custkey").cast("long").alias("node"))
    base_e = (cust.select(
        F.col("c_custkey").cast("long").alias("src"),
        F.expr("CAST(c_custkey div 2 AS BIGINT)").alias("dst"))
        .filter(F.col("src") != F.col("dst")))
    nmx = cust.agg(F.max(F.col("c_custkey").cast("long")).alias("nmax"))
    delta_e = (cust.crossJoin(F.broadcast(nmx))
               .filter((F.col("c_custkey") % PR_DELTA_MOD == 0)
                       & (F.col("c_custkey").cast("long") * 2
                          > F.col("nmax")))
               .select(F.col("c_custkey").cast("long").alias("src"),
                       (F.col("nmax")
                        - F.expr("CAST(c_custkey div 4 AS BIGINT)"))
                       .alias("dst"))
               .filter(F.col("src") != F.col("dst")))
    return verts, base_e, base_e.unionByName(delta_e)


def q_graph_pagerank_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL PageRank — the IVM form a 100 TB graph store actually
    runs (the rank sibling of ``graph_cc_incremental``): stored ranks
    from the base edge set WARM-START the power iteration on base∪delta,
    so a delta batch pays only PR_CORR_ROUNDS correction rounds instead
    of a cold restart. Power iteration contracts the error by the
    damping factor per round from ANY starting vector, and the stored
    vector is already near the new fixed point when the delta is small —
    at cluster scale this is the difference between ~4 and ~50
    edge-shuffle rounds per ingest batch (the first cost a production
    graph pipeline eliminates; tests/test_traverse.py machine-checks the
    warm start beats a cold start of the same budget).

    Graph: the base state is a binary in-tree FUNNEL — every node links
    to its parent src → src div 2 — and the delta batch ADDS shortcut
    edges src → N − src div 4 for every 11th node (see _pr_incr_graphs).
    The substrate choice matters twice over (r10 dead-variation lesson +
    the r11 float-fold advice fix): (a) the referral RING is a
    permutation whose fixed point equals the uniform cold-start vector —
    on it a warm start cannot win and the IVM story is vacuous, while
    the funnel's fixed point concentrates geometrically toward the root
    (rank(v) = (1−d) + d·Σchildren — low ids reach many× the cold
    value), so the cold-start error is LARGE while the stored vector
    sits near the new fixed point (the shortcut perturbation is small);
    (b) the delta must be ADDITIVE — the earlier removal-based split
    left ~N/11 nodes dangling in the base phase, making each round's
    dangling-mass SUM a multi-term double fold whose grouping differs
    between Spark partial aggregation and DuckDB scan order. Here every
    node except 0 keeps its funnel out-edge in both phases, so the
    dangling set is {node 0} in both phases — a 1-term, order-free sum.

    Float determinism: strictly inside the ≤2-term safe class. In-mass
    sums have ≤2 terms per node — funnel children 2v and 2v+1; shortcut
    targets sit in the childless leaf half (dst ≥ 3N/4 ⇒ 2·dst > N) and
    each receives exactly one shortcut — and two-term IEEE addition is
    commutative, so summation order cannot diverge; the dangling sum
    has at most ONE term in every round of both phases. Oracle:
    base rounds then correction rounds unrolled as MATERIALIZED CTEs
    over the two edge sets (the warm start is PART of the checked
    computation).
    """
    from ..graph.traverse import pagerank as _pr

    verts, base_e, full_e = _pr_incr_graphs(spark, sf_dir)
    # the "stored" state a deployment would read back from parquet
    stored = _pr(verts, base_e, n_iter=PR_BASE_ROUNDS)
    incr = _pr(verts, full_e, n_iter=PR_CORR_ROUNDS, init_ranks=stored)
    return incr.select("node", F.round("rank", 6).alias("rank"))


def _pagerank_incr_oracle_sql(damping: float = 0.85) -> str:
    """DuckDB twin of ``q_graph_pagerank_incremental``: PR_BASE_ROUNDS
    over the base edge set, then PR_CORR_ROUNDS over the full set seeded
    from the base result — each phase mirroring _pagerank_oracle_sql's
    round template term by term (same IEEE op order both engines)."""
    one_minus_d = repr(1.0 - damping)
    d = repr(damping)
    # `//` vs Spark's `div`: both operands are non-negative everywhere
    # below (custkeys ≥ 1), where truncation and floor agree (CLAUDE.md
    # signed-div trap does not bite).
    parts = [f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
nmx AS (SELECT max(CAST(c_custkey AS BIGINT)) AS nmax FROM customer),
verts AS (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer),
eb AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS src,
         CAST(c_custkey // 2 AS BIGINT) AS dst
  FROM customer
  WHERE CAST(c_custkey AS BIGINT) != CAST(c_custkey // 2 AS BIGINT)
),
ed AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS src,
         (SELECT nmax FROM nmx) - CAST(c_custkey // 4 AS BIGINT) AS dst
  FROM customer
  WHERE c_custkey % {PR_DELTA_MOD} = 0
    AND CAST(c_custkey AS BIGINT) * 2 > (SELECT nmax FROM nmx)
    AND CAST(c_custkey AS BIGINT)
        != (SELECT nmax FROM nmx) - CAST(c_custkey // 4 AS BIGINT)
),
ef AS MATERIALIZED (
  SELECT src, dst FROM eb UNION ALL SELECT src, dst FROM ed
),
odf AS MATERIALIZED (SELECT src, count(*) AS out_deg FROM ef GROUP BY src),
odb AS MATERIALIZED (SELECT src, count(*) AS out_deg FROM eb GROUP BY src),
r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM verts)"""]

    def round_sql(i: int, e: str, od: str) -> str:
        p = i - 1
        return f""",
d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) / (SELECT n FROM nn) AS dm
  FROM r{p} r LEFT JOIN {od} ON {od}.src = r.node
  WHERE {od}.src IS NULL
),
r{i} AS MATERIALIZED (
  SELECT v.node,
         CAST({one_minus_d} AS DOUBLE)
         + CAST({d} AS DOUBLE)
           * (COALESCE(m.in_mass, CAST(0 AS DOUBLE)) + (SELECT dm FROM d{i})) AS rank
  FROM verts v
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / od.out_deg) AS in_mass
    FROM {e} e JOIN r{p} r ON r.node = e.src JOIN {od} od ON od.src = e.src
    GROUP BY e.dst
  ) m ON m.node = v.node
)"""

    for i in range(1, PR_BASE_ROUNDS + 1):
        parts.append(round_sql(i, "eb", "odb"))
    for i in range(PR_BASE_ROUNDS + 1, PR_BASE_ROUNDS + PR_CORR_ROUNDS + 1):
        parts.append(round_sql(i, "ef", "odf"))
    parts.append(
        f"\nSELECT node, round(rank, 6) AS rank "
        f"FROM r{PR_BASE_ROUNDS + PR_CORR_ROUNDS}")
    return "".join(parts)


Q_PAGERANK_INCR_SQL = _pagerank_incr_oracle_sql()


LPA_ROUNDS = 10  # clique blocks converge by ~round 3; extra rounds are no-ops


def _lpa_graph(spark: SparkSession, sf_dir: str):
    """The planted-community graph q_label_propagation runs on — ONE
    builder shared with tests/test_traverse.py, so the structural
    invariants there always test the graph the registered query actually
    uses (a copy-pasted edge construction would silently drift).

    Blocks are 10-CLIQUES (all pairs sharing ``c_custkey // 10``), not
    chains: LPA is a MAJORITY process, and on sparse chains it has no
    majority signal to defend a block — r06 measured the chain version
    degenerating to parity classes without the self-vote (modularity
    −0.004, zero intra-community edges) and flooding to connected
    components with it (smallest-label ties propagate the component min
    unopposed). On cliques the 9-vote internal majority resists the
    1-vote bridge invasion, which is the regime the algorithm is for."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("u"))
    b = cust.select(F.col("c_custkey").alias("v"))
    clique = (a.join(b, (b.v > a.u) & (b.v - b.v % 10 == a.u - a.u % 10))
              .select(F.col("u").cast("long").alias("src"),
                      F.col("v").cast("long").alias("dst")))
    bridge = (a.filter(F.col("u") % 70 == 0)
              .join(b, b.v == a.u + 10)
              .select(F.col("u").cast("long").alias("src"),
                      F.col("v").cast("long").alias("dst")))
    vertices = cust.select(F.col("c_custkey").cast("long").alias("node"))
    return vertices, clique.union(bridge)


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous label propagation over a
    planted-community customer graph: 10-cliques (all pairs of custkeys
    sharing ``c_custkey // 10``) plus sparse bridges every 70th customer to
    the next cluster. Connected components would dissolve the planted
    structure along the bridges into merged blobs; LPA's majority vote
    (9 internal votes vs 1 bridge vote) keeps the dense clusters
    separate — which is the point of the operator and what the test
    asserts. q_graph_modularity scores the resulting partition.

    Tie-breaks are pinned (most votes, then smallest label; one
    self-vote per node — the synchronous-LPA anti-oscillation term,
    see traverse.label_propagation), so the fixed
    10 rounds unroll into a chained-CTE DuckDB oracle exactly like
    PageRank's — the driver value-checks every node's community id.
    """
    vertices, edges = _lpa_graph(spark, sf_dir)
    return label_propagation(vertices, edges, n_iter=LPA_ROUNDS)


def _lpa_oracle_sql(n_iter: int = LPA_ROUNDS) -> str:
    """DuckDB twin of ``q_label_propagation``: the fixed round count
    unrolled as chained CTEs mirroring graph/traverse.py:label_propagation
    term by term — neighbor votes + the self-vote, (cnt DESC, label ASC)
    row_number winner, left-join keep-own-label as a belt-and-braces for
    nodes outside the vote relation."""
    parts = ["""
WITH e0 AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b
    ON b.c_custkey > a.c_custkey
   AND b.c_custkey - b.c_custkey % 10 = a.c_custkey - a.c_custkey % 10
  UNION ALL
  SELECT a.c_custkey, b.c_custkey
  FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 10
  WHERE a.c_custkey % 70 = 0
), und AS MATERIALIZED (
  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
), l0 AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS node,
         CAST(c_custkey AS BIGINT) AS label
  FROM customer
)"""]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f""",
c{i} AS (
  SELECT node, label, count(*) AS cnt FROM (
    SELECT und.v AS node, l.label
    FROM und JOIN l{p} l ON l.node = und.u
    UNION ALL
    SELECT node, label FROM l{p}  -- self-vote (anti-oscillation)
  ) GROUP BY 1, 2
), w{i} AS (
  SELECT node, label,
         row_number() OVER (PARTITION BY node
                            ORDER BY cnt DESC, label ASC) AS rn
  FROM c{i}
), l{i} AS MATERIALIZED (
  SELECT l.node, COALESCE(w.label, l.label) AS label
  FROM l{p} l
  LEFT JOIN (SELECT node, label FROM w{i} WHERE rn = 1) w USING (node)
)""")
    parts.append(f"\nSELECT node, label AS community FROM l{n_iter}")
    return "".join(parts)


def _lpa_cte_chain(n_iter: int = LPA_ROUNDS) -> str:
    """The LPA unroll WITHOUT the final SELECT — shared by the LPA oracle
    and the modularity oracle so the label semantics can never drift."""
    full = _lpa_oracle_sql(n_iter)
    return full[:full.rindex("\nSELECT node")]


Q_LPA_SQL = _lpa_oracle_sql()


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA partition — the quality metric that
    closes the community-detection loop (reference surfaces communities
    via its graph visualization; this scores how community-like they are).

    Exact-arithmetic form: for the undirected graph with directed-pair
    relation U (both directions, |U| = 2m),

        Q = (|U|·intra_pairs − Σ_c deg_c²) / |U|²

    — every operand is an exact BIGINT aggregate, and the single final
    IEEE division of two exactly-representable integers is bit-identical
    on Spark and DuckDB (the same discipline as the bloom ppm outputs; no
    order-dependent float summation anywhere). Exactness bound: |U|² must
    stay under 2^53 (m < ~4.7e7 edges) — past that, emit ppm via integer
    division instead.

    Scale: labels come from the checkpointed LPA loop; the scoring pass
    is two broadcast-joins of the (node, community) relation onto the
    checkpointed edge relation plus three 1-row aggregates — one keyed
    shuffle each, all map-side combined.
    """
    vertices, edges = _lpa_graph(spark, sf_dir)
    labels = label_propagation(vertices, edges, n_iter=LPA_ROUNDS) \
        .localCheckpoint(eager=True)
    return modularity_score(labels, edges)


LOUVAIN_SWEEPS = 3


def q_graph_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-level Louvain-style greedy modularity sweeps: from singleton
    communities, each sweep moves nodes to the neighboring community with
    the best modularity gain — the objective-driven community detector
    that complements LPA's majority vote (LPA has no objective; Louvain
    climbs Q directly, and q_graph_modularity's scorer audits the result
    in the same output row).

    EXACT-INTEGER gain argmax: with U = Σdeg = 2m, comparing ΔQ across
    candidate communities c for node i reduces to comparing

        score(i, c) = U·k_{i,c} − deg_i·(Σtot_c − [c = c_i]·deg_i)

    — every operand a BIGINT (the 1/U² normalization is monotone-
    irrelevant), so the per-node argmax (score DESC, community ASC) is
    bit-identical in both engines with no float anywhere. Overflow bound:
    |score| ≤ 2·U·deg_max — safe past 10^14 directed pairs at deg ≤ 10^4.

    Synchronous-move trap (same family as LPA's oscillation): two
    adjacent nodes moving simultaneously can each target the other's OLD
    community and lower Q. Standard fix applied: each sweep activates
    ALTERNATING HALVES ((node + sweep) % 2), so no two adjacent movers
    in the planted graph's odd/even-mixed cliques race each other blind.
    Fixed LOUVAIN_SWEEPS sweeps, no convergence probe (CLAUDE.md
    fixed-round discipline); the quality claim — final Q beats both the
    singleton start and a positive floor — is a test assertion.

    Scale: und/deg checkpoint once (loop invariants); each sweep is two
    keyed shuffles (k_{i,c} neighbor rollup, Σtot per community) + one
    per-node argmax over candidate rows (groups bounded by degree, never
    corpus-wide); labels checkpoint per sweep (loop state). Σtot joins by
    key with NO broadcast hint — community count starts at |V| and is
    sf-growing (the r05 hint-audit rule).

    r16 sweep fusion (VERDICT r15 #4): the loop STATE carries deg —
    ``labels`` checkpoints as (node, community, deg) — so Σtot is one
    map-side-combined aggregate over the state (the old labels⋈deg join
    per sweep is gone) and the argmax join reads c_cur and deg in ONE
    state join (the old separate deg + cur joins are gone). Checkpointed
    relations carry no stats, so each removed join was a full SMJ (two
    exchanges); plan evidence in plans/r16/. The per-node winner is a
    single ``min_by(cand, struct(-score, cand))`` aggregate — identical
    to the old ``row_number() over (score DESC, cand ASC) = 1`` pick
    (score is BIGINT, negation exact), but map-side combinable and
    sort-free (the bpe_learn_merges r08 idiom).

    Output: the modularity_score audit row + an exact labels checksum
    (Σ node·community) so the oracle must reproduce the identical
    partition, not merely an equally-good one.
    """
    vertices, edges = _lpa_graph(spark, sf_dir)
    und = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    deg = (und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
           .select(F.col("src").alias("node"), "deg")
           .localCheckpoint(eager=True))
    upairs = deg.agg(F.sum("deg").cast("long").alias("u")) \
        .localCheckpoint(eager=True)
    # loop state carries deg (r16): isolated nodes (absent from und/deg)
    # take deg 0 — their only candidate is their own community with
    # k = 0 and score 0, so they keep their label exactly as the old
    # inner-join-on-deg form did by never reaching the argmax at all
    labels = (vertices.join(deg, "node", "left")
              .select("node", F.col("node").alias("community"),
                      F.coalesce(F.col("deg"), F.lit(0).cast("long"))
                      .alias("deg"))
              .localCheckpoint(eager=True))
    for s in range(1, LOUVAIN_SWEEPS + 1):
        ldst = labels.select(F.col("node").alias("dst"),
                             F.col("community").alias("cn"))
        k_ic = (und.join(ldst, "dst")
                .groupBy(F.col("src").alias("node"),
                         F.col("cn").alias("cand"))
                .agg(F.count(F.lit(1)).alias("k")))
        sigma = (labels.groupBy(F.col("community").alias("cand"))
                 .agg(F.sum("deg").cast("long").alias("tot")))
        stay = labels.select("node", F.col("community").alias("cand"),
                             F.lit(0).cast("long").alias("k"))
        cand = (k_ic.unionByName(stay)
                .groupBy("node", "cand").agg(F.max("k").alias("k")))
        state = labels.select("node", F.col("community").alias("c_cur"),
                              "deg")
        adj_tot = (F.col("tot")
                   - F.when(F.col("cand") == F.col("c_cur"),
                            F.col("deg")).otherwise(F.lit(0)))
        pick = (cand.join(sigma, "cand")
                .join(state, "node")
                .crossJoin(F.broadcast(upairs))
                .withColumn("score",
                            F.col("u") * F.col("k") - F.col("deg") * adj_tot)
                .groupBy("node")
                .agg(F.min_by("cand",
                              F.struct((-F.col("score")).alias("ns"),
                                       F.col("cand"))).alias("new_c")))
        active = ((F.col("node") + F.lit(s)) % 2 == 0)
        labels = (labels.join(pick, "node", "left")
                  .select("node",
                          F.when(active & F.col("new_c").isNotNull(),
                                 F.col("new_c"))
                          .otherwise(F.col("community")).alias("community"),
                          "deg")
                  .localCheckpoint(eager=True))
    # per-row mod before the sum: a raw Σ node·community wraps silently in
    # Spark and errors in DuckDB past ~sf30 (r09 review finding); with the
    # mod each addend is < 10^6, so the BIGINT sum is exact past 10^12
    # rows, and the fingerprint stays engine-identical (operands
    # non-negative, so %-semantics agree)
    checksum = labels.agg(
        F.sum((F.col("node") * F.col("community")) % F.lit(1000003))
        .cast("long").alias("labels_checksum"))
    return (modularity_score(labels, edges, und=und)
            .crossJoin(F.broadcast(checksum)))


def _louvain_oracle_sql(n_sweeps: int = LOUVAIN_SWEEPS) -> str:
    """DuckDB twin of ``q_graph_louvain``: sweeps unrolled as chained
    MATERIALIZED CTEs mirroring the Spark loop term by term (candidate
    rollup, Σtot, stay-row union, integer score, (score DESC, cand ASC)
    winner, alternating-half move)."""
    parts = ["""
WITH e0 AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b
    ON b.c_custkey > a.c_custkey
   AND b.c_custkey - b.c_custkey % 10 = a.c_custkey - a.c_custkey % 10
  UNION ALL
  SELECT a.c_custkey, b.c_custkey
  FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 10
  WHERE a.c_custkey % 70 = 0
), und AS MATERIALIZED (
  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
), deg AS MATERIALIZED (
  SELECT CAST(u AS BIGINT) AS node, count(*) AS deg FROM und GROUP BY 1
), up AS MATERIALIZED (
  SELECT CAST(sum(deg) AS BIGINT) AS u FROM deg
), l0 AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS node,
         CAST(c_custkey AS BIGINT) AS community
  FROM customer
)"""]
    for s in range(1, n_sweeps + 1):
        p = s - 1
        parts.append(f""",
k{s} AS (
  SELECT CAST(und.u AS BIGINT) AS node, l.community AS cand,
         CAST(count(*) AS BIGINT) AS k
  FROM und JOIN l{p} l ON l.node = und.v GROUP BY 1, 2
), sg{s} AS MATERIALIZED (
  SELECT l.community AS cand, CAST(sum(d.deg) AS BIGINT) AS tot
  FROM l{p} l JOIN deg d USING (node) GROUP BY 1
), cd{s} AS (
  SELECT node, cand, max(k) AS k FROM (
    SELECT node, cand, k FROM k{s}
    UNION ALL SELECT node, community, CAST(0 AS BIGINT) FROM l{p}
  ) GROUP BY 1, 2
), w{s} AS (
  SELECT c.node, c.cand,
         row_number() OVER (PARTITION BY c.node ORDER BY
           (SELECT u FROM up) * c.k
             - d.deg * (s.tot - CASE WHEN c.cand = l.community
                                     THEN d.deg ELSE 0 END) DESC,
           c.cand ASC) AS rn
  FROM cd{s} c
  JOIN sg{s} s ON s.cand = c.cand
  JOIN deg d ON d.node = c.node
  JOIN l{p} l ON l.node = c.node
), l{s} AS MATERIALIZED (
  SELECT l.node,
         CASE WHEN (l.node + {s}) % 2 = 0 AND w.cand IS NOT NULL
              THEN w.cand ELSE l.community END AS community
  FROM l{p} l LEFT JOIN (SELECT node, cand FROM w{s} WHERE rn = 1) w
    USING (node)
)""")
    parts.append(f""",
labels AS MATERIALIZED (SELECT node, community FROM l{n_sweeps}),
pair_stats AS (
  SELECT count(*) AS u_pairs,
         CAST(sum(CASE WHEN ls.community = ld.community THEN 1 ELSE 0 END)
              AS BIGINT) AS intra_pairs
  FROM und
  JOIN labels ls ON ls.node = und.u
  JOIN labels ld ON ld.node = und.v
), deg_stats AS (
  SELECT CAST(sum(d_c * d_c) AS BIGINT) AS sum_deg_sq FROM (
    SELECT CAST(sum(d.deg) AS BIGINT) AS d_c
    FROM deg d JOIN labels l USING (node) GROUP BY l.community)
), lab_stats AS (
  SELECT count(*) AS n_nodes, count(DISTINCT community) AS n_communities
  FROM labels
), largest AS (
  SELECT max(sz) AS largest_community FROM (
    SELECT count(*) AS sz FROM labels GROUP BY community)
), cksum AS (
  SELECT CAST(sum((node * community) % 1000003) AS BIGINT)
    AS labels_checksum
  FROM labels
)
SELECT n_nodes, n_communities, CAST(largest_community AS BIGINT)
         AS largest_community,
       CAST(u_pairs / 2 AS BIGINT) AS m_edges,
       intra_pairs, sum_deg_sq,
       CAST(u_pairs * intra_pairs - sum_deg_sq AS DOUBLE)
         / CAST(u_pairs * u_pairs AS DOUBLE) AS modularity,
       labels_checksum
FROM pair_stats CROSS JOIN deg_stats CROSS JOIN lab_stats
CROSS JOIN largest CROSS JOIN cksum""")
    return "".join(parts)


Q_LOUVAIN_SQL = _louvain_oracle_sql()


def modularity_score(labels: DataFrame, edges: DataFrame,
                     und: DataFrame | None = None) -> DataFrame:
    """Score ANY (node, community) labeling against (src, dst) edges
    (treated undirected, deduped) — see q_graph_modularity for the exact
    integer-arithmetic derivation. Unit-tested on a closed-form hand
    graph in tests/test_traverse.py.

    ``und``: a caller that already holds the checkpointed
    union+distinct relation (the Louvain loop does) passes it to skip
    re-deriving it — one corpus-sized shuffle saved (r09 review)."""
    if und is None:
        und = (edges.select("src", "dst")
               .union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
               .distinct().localCheckpoint(eager=True))
    lsrc = labels.select(F.col("node").alias("src"), F.col("community").alias("c_src"))
    ldst = labels.select(F.col("node").alias("dst"), F.col("community").alias("c_dst"))
    pair_stats = (und.join(lsrc, "src").join(ldst, "dst")
                  .agg(F.count(F.lit(1)).alias("u_pairs"),
                       F.sum((F.col("c_src") == F.col("c_dst")).cast("long"))
                       .alias("intra_pairs")))
    deg_stats = (und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
                 .join(lsrc, "src")
                 .groupBy("c_src").agg(F.sum("deg").alias("d_c"))
                 .agg(F.sum(F.col("d_c") * F.col("d_c")).alias("sum_deg_sq")))
    lab_stats = labels.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("community").alias("n_communities"),
    )
    largest = (labels.groupBy("community").agg(F.count(F.lit(1)).alias("sz"))
               .agg(F.max("sz").alias("largest_community")))
    return (pair_stats.crossJoin(F.broadcast(deg_stats))
            .crossJoin(F.broadcast(lab_stats))
            .crossJoin(F.broadcast(largest))
            .select(
                "n_nodes", "n_communities", "largest_community",
                (F.col("u_pairs") / F.lit(2)).cast("long").alias("m_edges"),
                "intra_pairs", "sum_deg_sq",
                ((F.col("u_pairs") * F.col("intra_pairs") - F.col("sum_deg_sq"))
                 .cast("double")
                 / (F.col("u_pairs") * F.col("u_pairs")).cast("double"))
                .alias("modularity"),
            ))


Q_MODULARITY_SQL = _lpa_cte_chain() + f""",
labels AS MATERIALIZED (
  SELECT node, label AS community FROM l{LPA_ROUNDS}
), pair_stats AS (
  SELECT count(*) AS u_pairs,
         CAST(sum(CASE WHEN ls.community = ld.community THEN 1 ELSE 0 END)
              AS BIGINT) AS intra_pairs
  FROM und
  JOIN labels ls ON ls.node = und.u
  JOIN labels ld ON ld.node = und.v
), deg AS (
  SELECT u, count(*) AS deg FROM und GROUP BY u
), deg_stats AS (
  SELECT CAST(sum(d_c * d_c) AS BIGINT) AS sum_deg_sq FROM (
    SELECT l.community, CAST(sum(d.deg) AS BIGINT) AS d_c
    FROM deg d JOIN labels l ON l.node = d.u GROUP BY 1
  )
), lab_stats AS (
  SELECT count(*) AS n_nodes, count(DISTINCT community) AS n_communities
  FROM labels
), largest AS (
  SELECT CAST(max(sz) AS BIGINT) AS largest_community FROM (
    SELECT community, count(*) AS sz FROM labels GROUP BY 1
  )
)
SELECT n_nodes, n_communities, largest_community,
       u_pairs // 2 AS m_edges, intra_pairs, sum_deg_sq,
       CAST(u_pairs * intra_pairs - sum_deg_sq AS DOUBLE)
         / CAST(u_pairs * u_pairs AS DOUBLE) AS modularity
FROM pair_stats, deg_stats, lab_stats, largest
"""


KCORE_K = 3
KCORE_ROUNDS = 10  # converged by round 8 on the synthetic graph at both SFs


def _kcore_edges(spark: SparkSession, sf_dir: str):
    """Planted core-plus-appendage graph over customers: each block of 20
    custkeys carries a 12-node ring with +2 chords (every ring node degree
    ≥ 4 → survives the 3-core) plus +3 chords on the first 6 (varying the
    in-core degrees 4–6), and an 8-node chain tail hung off the ring —
    tails peel one node per round (the cascade the operator exists to
    compute), rings stay. All five edge families are equi-joins against
    customer so targets exist at every sf."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("u"))
    b = cust.select(F.col("c_custkey").alias("v"))
    blk = F.expr("u div 20") * 20   # integer division — no float rounding
    i = F.col("u") % 20

    def fam(target, cond):
        return (a.filter(cond).join(b, b.v == target)
                .select(F.col("u").cast("long").alias("src"),
                        F.col("v").cast("long").alias("dst")))

    ring = fam(blk + (i + 1) % 12, i < 12)
    chord2 = fam(blk + (i + 2) % 12, i < 12)
    chord3 = fam(blk + (i + 3) % 12, i < 6)
    tail = fam(F.col("u") + 1, (i >= 12) & (i <= 18))
    attach = fam(blk, i == 12)
    return ring.union(chord2).union(chord3).union(tail).union(attach)


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core decomposition over the planted ring/tail customer graph:
    iterative peeling keeps exactly the ring nodes (tails cascade off one
    node per round) and reports each survivor's degree within the core.
    Fixed 10 rounds unroll into the chained-CTE DuckDB oracle — every
    (node, core_degree) row is value-checked."""
    verts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("node"))
    return k_core(verts, _kcore_edges(spark, sf_dir),
                  k=KCORE_K, n_iter=KCORE_ROUNDS)


_KCORE_EDGES_SQL = """
  SELECT a.c_custkey AS u, b.c_custkey AS v FROM customer a JOIN customer b
    ON b.c_custkey = (a.c_custkey // 20) * 20 + ((a.c_custkey % 20) + 1) % 12
  WHERE a.c_custkey % 20 < 12
  UNION ALL
  SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b
    ON b.c_custkey = (a.c_custkey // 20) * 20 + ((a.c_custkey % 20) + 2) % 12
  WHERE a.c_custkey % 20 < 12
  UNION ALL
  SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b
    ON b.c_custkey = (a.c_custkey // 20) * 20 + ((a.c_custkey % 20) + 3) % 12
  WHERE a.c_custkey % 20 < 6
  UNION ALL
  SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b
    ON b.c_custkey = a.c_custkey + 1
  WHERE a.c_custkey % 20 BETWEEN 12 AND 18
  UNION ALL
  SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b
    ON b.c_custkey = (a.c_custkey // 20) * 20
  WHERE a.c_custkey % 20 = 12
"""


def _kcore_oracle_sql(n_iter: int = KCORE_ROUNDS, k: int = KCORE_K) -> str:
    """DuckDB twin of ``q_graph_kcore``: the fixed peel rounds unrolled as
    chained CTEs mirroring graph/traverse.py:k_core term by term."""
    parts = [f"""
WITH e0 AS ({_KCORE_EDGES_SQL}), und AS MATERIALIZED (
  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
), a0 AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS node FROM customer
)"""]
    for r in range(1, n_iter + 1):
        p = r - 1
        parts.append(f""",
d{r} AS MATERIALIZED (
  SELECT s.node, count(*) AS deg
  FROM a{p} s JOIN und e ON e.u = s.node JOIN a{p} t ON t.node = e.v
  GROUP BY 1
), a{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k})""")
    parts.append(f"""
SELECT d.node, CAST(d.deg AS BIGINT) AS core_degree
FROM d{n_iter} d JOIN a{n_iter} a USING (node)""")
    return "".join(parts)


Q_KCORE_SQL = _kcore_oracle_sql()


# --- k-truss: triangle-support edge peeling (r09) ---------------------------
# Closes the cohesive-subgraph family: k-core peels NODES by degree,
# densest-subgraph peels by average degree, k-truss peels EDGES by
# triangle support — the strongest of the three (every k-truss edge sits
# in ≥ k-2 triangles among survivors), the community-core primitive
# fraud/cohesion pipelines run when degree alone over-admits hubs.
TRUSS_K = 4        # support threshold = k-2 = 2 triangles per edge
TRUSS_ROUNDS = 3   # cascade completes in 2 on the planted substrate;
#                    round 3 proves the fixpoint (test-asserted)


def _truss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v) edge list planting all three k=4 behaviors in
    every 20-key customer block (CLAUDE.md: synthetic substrates need the
    objective to actually exercise — uniform density never peels):

      * positions 0-5: a 6-clique — every edge in 4 triangles, survives;
      * positions 6-13: a TRIANGLE STRIP ((i, i+1) for 6≤i≤12 and
        (i, i+2) for 6≤i≤11) — interior (i, i+1) edges start at support
        2 (alive round 1) but their triangles ride support-1 edges, so
        the second peel round cascades the whole strip away: the
        multi-round behavior that distinguishes truss from one-shot
        triangle filtering;
      * positions 14-18: a support-0 chain, gone in round 1.

    The clique needs a per-block self-join: equi-join on the block key
    (bounded 6x6 pairs per block), never a cross product."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("u"))
    b = cust.select(F.col("c_custkey").alias("v"))
    blk_u = F.expr("u div 20")
    blk_v = F.expr("v div 20")
    iu = F.col("u") % 20
    iv = F.col("v") % 20
    clique = (a.filter(iu < 6)
              .join(b.filter(iv < 6), (blk_v == blk_u) & (F.col("v") > F.col("u"))))

    def step(delta: int, lo: int, hi: int):
        return (a.filter((iu >= lo) & (iu <= hi))
                .join(b, b.v == F.col("u") + delta)
                .filter(blk_v == blk_u))

    strip1 = step(1, 6, 12)
    strip2 = step(2, 6, 11)
    chain = step(1, 14, 18)
    return (clique.union(strip1).union(strip2).union(chain)
            .select(F.col("u").cast("long").alias("u"),
                    F.col("v").cast("long").alias("v"))
            .localCheckpoint(eager=True))


def _edge_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (u<v) edge list: one
    wedge join + one closing semi... inner join (the triangle-count
    shape), then each triangle credits its three edges."""
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    sides = tri.select(F.col("x").alias("u"), F.col("y").alias("v")) \
        .union(tri.select(F.col("y"), F.col("z"))) \
        .union(tri.select(F.col("x"), F.col("z")))
    return sides.groupBy("u", "v").agg(F.count(F.lit(1)).alias("sup"))


def q_graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss (k=4) by fixed-round edge peeling: each round keeps the
    edges with ≥ k-2 triangles among current survivors, and the audit row
    records the round's edge and triangle counts — the planted clique
    family survives, the triangle strip cascades away in two rounds, the
    chain dies immediately (tests pin all three against an independent
    clique-edge count).

    Scale: the triangle enumeration is the graph_triangle_count wedge
    join (two keyed shuffles on endpoints) over a MONOTONICALLY SHRINKING
    edge set; each round's survivor list checkpoints (loop state, same
    discipline as k-core/densest); counts are exact BIGINTs so both
    engines agree bit for bit. Fixed TRUSS_ROUNDS, no fixpoint probe
    (CLAUDE.md fixed-round discipline) — the fixpoint itself is a test
    assertion, not a runtime branch.
    """
    edges = _truss_edges(spark, sf_dir)
    audit = []
    cur = edges
    for r in range(TRUSS_ROUNDS + 1):
        # sup feeds BOTH the audit row and the peel — materialize so each
        # round's triangle enumeration (the dominant cost) runs once, not
        # once per consumer (r09 review; the multi-consumer rule)
        sup = _edge_support(cur).localCheckpoint(eager=True)
        # Σsup is exactly 3 triangles; integer div both engines (no float)
        n_tri = (sup.agg(F.coalesce(F.sum("sup"), F.lit(0)).alias("s"))
                 .select(F.expr("s div 3").cast("long").alias("n_tri")))
        audit.append(
            cur.agg(F.count(F.lit(1)).alias("n_edges"))
            .crossJoin(n_tri)
            .select(F.lit(r).alias("round"), "n_edges", "n_tri"))
        if r < TRUSS_ROUNDS:
            cur = (cur.join(sup.filter(F.col("sup") >= TRUSS_K - 2),
                            ["u", "v"])
                   .select("u", "v").localCheckpoint(eager=True))
    out = audit[0]
    for a_df in audit[1:]:
        out = out.unionByName(a_df)
    return out.orderBy("round")


_TRUSS_EDGES_SQL = """
  SELECT CAST(a.c_custkey AS BIGINT) AS u, CAST(b.c_custkey AS BIGINT) AS v
  FROM customer a JOIN customer b
    ON b.c_custkey // 20 = a.c_custkey // 20 AND b.c_custkey > a.c_custkey
  WHERE a.c_custkey % 20 < 6 AND b.c_custkey % 20 < 6
  UNION ALL
  SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b
    ON b.c_custkey = a.c_custkey + 1
  WHERE a.c_custkey % 20 BETWEEN 6 AND 12
    AND b.c_custkey // 20 = a.c_custkey // 20
  UNION ALL
  SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b
    ON b.c_custkey = a.c_custkey + 2
  WHERE a.c_custkey % 20 BETWEEN 6 AND 11
    AND b.c_custkey // 20 = a.c_custkey // 20
  UNION ALL
  SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b
    ON b.c_custkey = a.c_custkey + 1
  WHERE a.c_custkey % 20 BETWEEN 14 AND 18
    AND b.c_custkey // 20 = a.c_custkey // 20
"""


def _ktruss_oracle_sql(n_iter: int = TRUSS_ROUNDS, k: int = TRUSS_K) -> str:
    """DuckDB twin: the fixed peel rounds unrolled as chained MATERIALIZED
    CTEs mirroring q_graph_ktruss term by term (edge set e{r}, support
    s{r}, audit row per round)."""
    parts = [f"WITH e0 AS MATERIALIZED ({_TRUSS_EDGES_SQL})"]
    selects = []
    for r in range(n_iter + 1):
        parts.append(f""",
t{r} AS MATERIALIZED (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e{r} e1 JOIN e{r} e2 ON e2.u = e1.v
  JOIN e{r} e3 ON e3.u = e1.u AND e3.v = e2.v
), s{r} AS MATERIALIZED (
  SELECT u, v, count(*) AS sup FROM (
    SELECT x AS u, y AS v FROM t{r}
    UNION ALL SELECT y, z FROM t{r}
    UNION ALL SELECT x, z FROM t{r})
  GROUP BY 1, 2
)""")
        selects.append(
            f"SELECT {r} AS round,\n"
            f"  (SELECT count(*) FROM e{r}) AS n_edges,\n"
            f"  (SELECT CAST(coalesce(sum(sup), 0) // 3 AS BIGINT) FROM s{r})"
            f" AS n_tri")
        if r < n_iter:
            parts.append(f""",
e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e JOIN s{r} s USING (u, v)
  WHERE s.sup >= {k - 2}
)""")
    parts.append("\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY round")
    return "".join(parts)


Q_KTRUSS_SQL = _ktruss_oracle_sql()


def q_khop_undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected 2-hop neighborhood from one customer seed through the
    hierarchy edges (direction='both') — the reverse/undirected traversal
    mode the flagship's 'downward' contract doesn't exercise. From a
    customer, 1 hop reaches its nation and its orders; 2 hops the region
    and sibling customers."""
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 7)
        .select(
            (F.col("c_custkey") + _CUST_BASE).cast("long").alias("seed"),
            (F.col("c_custkey") + _CUST_BASE).cast("long").alias("node"),
        )
    )
    reached = k_hop(seeds, _hierarchy_edges(spark, sf_dir), depth=2, direction="both")
    return reached.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    ).orderBy("depth")


Q_KHOP_UNDIRECTED_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(n_nationkey + {_NATION_BASE} AS BIGINT) AS dst FROM nation
  UNION ALL
  SELECT CAST(c_nationkey + {_NATION_BASE} AS BIGINT), CAST(c_custkey + {_CUST_BASE} AS BIGINT) FROM customer
  UNION ALL
  SELECT CAST(o_custkey + {_CUST_BASE} AS BIGINT), CAST(o_orderkey + {_ORDER_BASE} AS BIGINT) FROM orders
), und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), walk AS (
  SELECT CAST(c_custkey + {_CUST_BASE} AS BIGINT) AS node, 0 AS depth
  FROM customer WHERE c_custkey = 7
  UNION ALL
  SELECT e.dst, w.depth + 1
  FROM walk w JOIN und e ON e.src = w.node
  WHERE w.depth < 2
), dists AS (
  SELECT node, min(depth) AS depth FROM walk GROUP BY node
)
SELECT depth, count(*) AS n_nodes, min(node) AS min_node, max(node) AS max_node
FROM dists GROUP BY depth ORDER BY depth
"""


def _chain_triangle_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v) edge list of the same-nation chain graph
    (u—u+1, u—u+2) — ONE builder shared by triangle count and the
    clustering-coefficient query so their graphs can never drift.

    Two pure equi-joins (key = (u+delta, nation)) instead of one OR-join:
    the OR form degrades to a nation-equi join + filter — a per-nation
    cross product, quadratic in the hottest nation at scale. The edge
    list feeds multiple wedge-closing references; each would re-expand
    the two customer⋈customer derivation joins (12 customer scans in one
    plan, r05 scan-multiplicity audit) — materialize once; at 100 TB the
    canonical edge list is a persisted table, never re-derived per
    reference."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("u"), F.col("c_nationkey").alias("un"))
    b = cust.select(F.col("c_custkey").alias("v"), F.col("c_nationkey").alias("vn"))

    def link(delta: int):
        return a.join(b, (b.v == a.u + delta) & (F.col("un") == F.col("vn"))) \
                .select("u", "v", F.col("un").alias("nationkey"))

    return link(1).union(link(2)).localCheckpoint(eager=True)


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count per nation over a derived undirected graph:
    same-nation customers link at distance 1 and 2 (u—u+1, u—u+2), so every
    same-nation run of 3 consecutive custkeys closes a triangle.

    Spark shape: canonical (u<v) edge list, two self-joins closing the
    wedge — the standard distributed triangle enumeration. Scale: both
    joins shuffle on a custkey endpoint; at 100 TB you'd pre-partition the
    edge list by src and degree-order endpoints (u<v already does the
    degree trick's dedup job here).
    """
    edges = _chain_triangle_edges(spark, sf_dir)
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"), "nationkey")
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    return (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("nationkey")
    )


Q_TRIANGLE_SQL = """
WITH edges AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v, a.c_nationkey AS nationkey
  FROM customer a JOIN customer b
    ON (b.c_custkey = a.c_custkey + 1 OR b.c_custkey = a.c_custkey + 2)
   AND a.c_nationkey = b.c_nationkey
)
SELECT e1.nationkey, count(*) AS n_triangles
FROM edges e1
JOIN edges e2 ON e2.u = e1.v
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
GROUP BY e1.nationkey ORDER BY e1.nationkey
"""


def _lcc_union_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u<v) edge list of the FULL-COVERAGE union graph: the LPA
    clique+bridge substrate (every custkey block of 10 a clique, bridges
    every 70) UNIONED with the same-nation chain edges, deduplicated.
    One builder shared by the clustering-coefficient and sampled-
    betweenness queries so their graphs can never drift (SQL twin: the
    ``edges`` CTE in ``Q_LCC_SQL`` / ``_betweenness_sql``)."""
    _, edges0 = _lpa_graph(spark, sf_dir)
    chain = _chain_triangle_edges(spark, sf_dir) \
        .select(F.col("u").cast("long").alias("u"),
                F.col("v").cast("long").alias("v"))
    return (edges0.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .union(chain).distinct().localCheckpoint(eager=True))


def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node LOCAL CLUSTERING COEFFICIENT — lcc(v) = 2·tri(v) /
    (deg(v)·(deg(v)−1)), how close each node's neighborhood is to a
    clique; the per-node refinement of ``graph_triangle_count``'s global
    tally and the standard per-vertex feature a graph-ML pipeline
    materializes.

    Graph: the LPA clique+bridge graph (``_lpa_graph`` — same builder,
    so the structure tests there cover this operator's substrate) UNIONED
    with the same-nation chain edges (``_chain_triangle_edges``),
    deduplicated — a chain edge inside a block coincides with a clique
    edge. Neither alone varies: the chain graph is so sparse every lcc
    is 0, and pure full cliques collapse to two classes (interior 1.0,
    bridge-end 0.8) — dead variation either way (CLAUDE.md
    synthetic-corpus discipline). Cross-block chain edges dilute
    individual nodes' neighborhoods by open wedges, spreading the
    (deg, lcc) distribution across many sf-scaling classes.

    Shape: ordered (x<y<z) triples via two wedge-closing equi-joins over
    the canonical u<v edge list (cost identical to the global triangle
    count), each triple exploded to its three members for the per-node
    tally; degrees are one keyed count over the undirected view. All
    integers, coefficient as floor-ppm → bit-exact oracle. Output rolls
    the per-node table up to its (deg, lcc_ppm) DISTRIBUTION —
    sf-scaling group counts instead of a top-k of ties.
    """
    edges = _lcc_union_edges(spark, sf_dir)
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = (e1.join(e2, "y").join(e3, ["x", "z"])
           .select(F.explode(F.array("x", "y", "z")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("n_tri")))
    und = edges.select(F.col("u").alias("node")).union(
        edges.select(F.col("v").alias("node")))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    per_node = (deg.filter(F.col("deg") >= 2)
                .join(tri, "node", "left")
                .select("node", "deg",
                        F.expr("coalesce(n_tri, 0) * 2000000"
                               " div (deg * (deg - 1))").alias("lcc_ppm")))
    return (per_node.groupBy("deg", "lcc_ppm")
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.min("node").alias("min_node"))
            .select(F.col("deg").cast("long").alias("deg"),
                    "lcc_ppm",
                    F.col("n_nodes").cast("long").alias("n_nodes"),
                    F.col("min_node").cast("long").alias("min_node"))
            .orderBy("deg", "lcc_ppm"))


Q_LCC_SQL = """
WITH edges AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT CAST(a.c_custkey AS BIGINT) AS u, CAST(b.c_custkey AS BIGINT) AS v
    FROM customer a JOIN customer b
      ON b.c_custkey > a.c_custkey
     AND b.c_custkey - b.c_custkey % 10 = a.c_custkey - a.c_custkey % 10
    UNION ALL
    SELECT CAST(a.c_custkey AS BIGINT), CAST(b.c_custkey AS BIGINT)
    FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 10
    WHERE a.c_custkey % 70 = 0
    UNION ALL
    SELECT CAST(a.c_custkey AS BIGINT), CAST(b.c_custkey AS BIGINT)
    FROM customer a JOIN customer b
      ON (b.c_custkey = a.c_custkey + 1 OR b.c_custkey = a.c_custkey + 2)
     AND a.c_nationkey = b.c_nationkey
  )
), tri AS (
  SELECT node, count(*) AS n_tri FROM (
    SELECT unnest([e1.x, e1.y, e2.z]) AS node FROM
      (SELECT u AS x, v AS y FROM edges) e1
      JOIN (SELECT u AS y, v AS z FROM edges) e2 USING (y)
      JOIN (SELECT u AS x, v AS z FROM edges) e3 USING (x, z)
  ) GROUP BY node
), deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY node
), per_node AS (
  SELECT d.node, d.deg,
         CAST(COALESCE(t.n_tri, 0) AS BIGINT) * 2000000
           // (d.deg * (d.deg - 1)) AS lcc_ppm
  FROM deg d LEFT JOIN tri t ON t.node = d.node
  WHERE d.deg >= 2
)
SELECT CAST(deg AS BIGINT) AS deg, lcc_ppm,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS min_node
FROM per_node
GROUP BY deg, lcc_ppm
ORDER BY deg, lcc_ppm
"""


# ---------------------------------------------------------------------------
# Densest subgraph — distributed (1+ε)-peel (Bahmani et al., 2-approx family)
# ---------------------------------------------------------------------------

DENSEST_ROUNDS = 8          # fixed peel rounds (no fixpoint probe)
DENSEST_EPS_NUM, DENSEST_EPS_DEN = 5, 4   # (1+ε) = 5/4


def _densest_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u<v) edge list with PLANTED DENSITY CONTRAST: 10-cliques
    on every THIRD custkey block ((custkey div 10) % 3 == 0) over the
    same-nation chain graph (u—u+1, u—u+2). The full-coverage clique
    substrate the other graph ops use is deliberately NOT reused here —
    with every node in a clique the whole graph is uniformly dense and
    round 0 is already the peak (dead variation, caught by
    test_densest_subgraph_*): the peel needs a chain-only sparse fringe
    (deg ≤ 4) to shed before the clique core's density emerges."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("u"))
    b = cust.select(F.col("c_custkey").alias("v"))
    clique = (a.join(b, (b.v > a.u)
                     & (b.v - b.v % 10 == a.u - a.u % 10)
                     & ((a.u - a.u % 10) % 30 == 0))
              .select(F.col("u").cast("long").alias("u"),
                      F.col("v").cast("long").alias("v")))
    chain = _chain_triangle_edges(spark, sf_dir) \
        .select(F.col("u").cast("long").alias("u"),
                F.col("v").cast("long").alias("v"))
    return clique.union(chain).distinct().localCheckpoint(eager=True)


def q_graph_densest_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest-subgraph extraction by distributed (1+ε)-greedy peeling
    (Bahmani–Kumar–Vassilvitskii): each round drops every node whose
    degree is ≤ (1+ε)·avg-degree of the current survivor graph; the
    densest round is a 2(1+ε)-approximation of the maximum-density
    subgraph. The community/fraud-core primitive k-core can't give — the
    objective is average degree, not a uniform threshold.

    Exact-integer peel test: keep node ⇔ deg > (1+ε)·2E/V; with deg an
    INTEGER, ``deg > x ⇔ deg > floor(x)``, so both engines compare
    against ``(5·ΣDeg) div (4·V)`` — no float, no cross-multiplied
    overflow (5·ΣDeg stays in BIGINT past 10^17 edges, where 4·deg·V
    cross-multiplication would have died at ~10^9 nodes). The ppm OUTPUT
    column has a tighter bound (ΣDeg·10^6 dies at ~4.6×10^12 edges), so
    it goes through the shared power-of-two downshift instead
    (profiling.py discipline — exact divisor 1 until 2^42).

    Output: per-round audit rows (survivor counts + avg-degree ppm) with
    the peak round flagged — rounds after the graph empties emit nothing
    (the ε-threshold eventually exceeds every degree, by design).

    Scale: edges checkpoint once at entry and once per peel (loop state);
    each round is ONE degree aggregation (map-side combined) + a 1-row
    broadcast threshold + two keyed semi-joins. O(log n) rounds suffice
    for the approximation bound at any graph size. No driver-side
    fixpoint probe: the round count is fixed and empty rounds cost two
    empty jobs (CLAUDE.md fixed-round discipline).
    """
    edges = _densest_edges(spark, sf_dir)
    # ppm downshift: two_e·10^6 overflows BIGINT at ΣDeg ≈ 9.2×10^12
    # (~4.6×10^12 edges) — far below the threshold test's own bound, so
    # the output column gets the profiling.py downshift treatment: a
    # common power-of-two divisor on num and den, identical floor
    # semantics both engines (r08 review finding)
    pd_ppm = (f"(CASE WHEN two_e < {1 << 42} THEN 1 "
              f"WHEN two_e < {1 << 50} THEN 256 "
              f"WHEN two_e < {1 << 58} THEN 65536 ELSE 16777216 END)")
    ppm = (f"(two_e div {pd_ppm}) * 1000000 "
           f"div greatest(nv div {pd_ppm}, 1L)")
    stats_rows = []
    for rnd in range(DENSEST_ROUNDS):
        # deg checkpoints so the degree shuffle runs exactly ONCE per
        # round — st, the stats row, and both semi-join references below
        # otherwise re-expand it 3x (r08 review finding; CLAUDE.md
        # multi-consumer discipline)
        deg = (edges.select(F.col("u").alias("node"))
               .unionAll(edges.select(F.col("v").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
               .localCheckpoint(eager=True))
        st = deg.agg(F.count(F.lit(1)).alias("nv"),
                     F.sum("deg").alias("two_e"))
        stats_rows.append(
            st.filter(F.col("nv") > 0)
            .select(F.lit(rnd).alias("round"),
                    F.col("nv").cast("long").alias("n_nodes"),
                    F.expr("two_e div 2").alias("n_edges"),
                    F.expr(ppm).alias("avg_deg_ppm")))
        surv = (deg.crossJoin(F.broadcast(st))
                .filter(F.col("deg") > F.expr(
                    f"({DENSEST_EPS_NUM} * two_e) div ({DENSEST_EPS_DEN} * nv)"))
                .select("node"))
        edges = (edges
                 .join(surv, edges.u == surv.node, "left_semi")
                 .join(surv, edges.v == surv.node, "left_semi")
                 .localCheckpoint(eager=True))
    out = stats_rows[0]
    for s in stats_rows[1:]:
        out = out.unionByName(s)
    out = out.localCheckpoint(eager=True)   # ≤ DENSEST_ROUNDS rows; 3 readers
    peak = out.agg(F.max("avg_deg_ppm").alias("pmax"))
    prnd = (out.crossJoin(F.broadcast(peak))
            .filter(F.col("avg_deg_ppm") == F.col("pmax"))
            .agg(F.min("round").alias("prnd")))
    return (out.crossJoin(F.broadcast(prnd))
            .select("round", "n_nodes", "n_edges", "avg_deg_ppm",
                    (F.col("round") == F.col("prnd")).alias("is_peak"))
            .orderBy("round"))


def _densest_sql() -> str:
    """Unrolled peel oracle: the same union substrate as Q_LCC_SQL, then
    DENSEST_ROUNDS × (degree agg → integer threshold → survivor filter)
    as MATERIALIZED CTEs."""
    head = """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT CAST(a.c_custkey AS BIGINT) AS u, CAST(b.c_custkey AS BIGINT) AS v
    FROM customer a JOIN customer b
      ON b.c_custkey > a.c_custkey
     AND b.c_custkey - b.c_custkey % 10 = a.c_custkey - a.c_custkey % 10
     AND (a.c_custkey - a.c_custkey % 10) % 30 = 0
    UNION ALL
    SELECT CAST(a.c_custkey AS BIGINT), CAST(b.c_custkey AS BIGINT)
    FROM customer a JOIN customer b
      ON (b.c_custkey = a.c_custkey + 1 OR b.c_custkey = a.c_custkey + 2)
     AND a.c_nationkey = b.c_nationkey
  )
)"""
    rounds = []
    for r in range(DENSEST_ROUNDS):
        rounds.append(f""", d{r} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM e{r} UNION ALL SELECT v AS node FROM e{r}
  ) GROUP BY node
), s{r} AS MATERIALIZED (
  SELECT count(*) AS nv, CAST(sum(deg) AS BIGINT) AS two_e FROM d{r}
), n{r} AS MATERIALIZED (
  SELECT node FROM d{r}, s{r}
  WHERE deg > ({DENSEST_EPS_NUM} * two_e) // ({DENSEST_EPS_DEN} * nv)
), e{r + 1} AS MATERIALIZED (
  SELECT u, v FROM e{r}
  WHERE u IN (SELECT node FROM n{r}) AND v IN (SELECT node FROM n{r})
)""")
    pd_ppm = (f"(CASE WHEN two_e < {1 << 42} THEN 1 "
              f"WHEN two_e < {1 << 50} THEN 256 "
              f"WHEN two_e < {1 << 58} THEN 65536 ELSE 16777216 END)")
    union = " UNION ALL ".join(
        f"SELECT {r} AS round, CAST(nv AS BIGINT) AS n_nodes, "
        f"two_e // 2 AS n_edges, (two_e // {pd_ppm}) * 1000000 "
        f"// greatest(nv // {pd_ppm}, 1) AS avg_deg_ppm "
        f"FROM s{r} WHERE nv > 0" for r in range(DENSEST_ROUNDS))
    tail = f""", rows AS MATERIALIZED ({union}),
pk AS (SELECT min(round) AS prnd FROM rows
       WHERE avg_deg_ppm = (SELECT max(avg_deg_ppm) FROM rows))
SELECT round, n_nodes, n_edges, avg_deg_ppm,
       (round = prnd) AS is_peak
FROM rows, pk ORDER BY round"""
    return head + "".join(rounds) + tail


# ---------------------------------------------------------------------------
# Sampled shortest-path betweenness (bounded-depth Brandes, stress variant)
# ---------------------------------------------------------------------------

BETW_DEPTH = 3              # bounded-distance truncation (fixed-round loops)
BETW_SRC_MOD, BETW_SRC_REM = 397, 1   # pinned part-side source sample
BETW_TOPK = 100


def stress_centrality(und: DataFrame, sources: DataFrame,
                      depth: int = BETW_DEPTH) -> DataFrame:
    """Sampled shortest-path betweenness, STRESS variant (exact-integer):
    stress(v) = Σ_{s∈sources} σ_s(v)·T_s(v), where σ_s(v) is the number
    of shortest s→v paths and T_s(v) the number of shortest-path
    continuations from v to targets within ``depth`` hops — i.e. the
    number of shortest paths from s THROUGH v (Shimbel's stress
    centrality, the integer-weighted member of Brandes' 2008 variant
    framework; true δ-betweenness divides by σ_st, which would put
    engine-ordered float sums in the output, so the driver-hashable form
    is the σ-count one).

    Brandes two-phase shape, both phases fixed-round (no fixpoint
    probes): forward BFS layers l₀..l_D carry (source, node, σ) with σ
    summed over predecessors and an anti-join against the visited set;
    backward accumulation T_k(v) = Σ_{w∈succ(v)} (T_{k+1}(w)+1) descends
    the layers. All joins are keyed equi-joins on (source, node); layers
    checkpoint per round (loop state). At 100 TB: rows ≤ |sample|·|D-hop
    ball|, the standard sampled-Brandes bound — exact betweenness is
    quadratic and nobody runs it; the sample IS the scale strategy.

    ``und`` must hold both directions of each undirected edge (src, dst);
    ``sources`` is a (node,) relation. Returns (node, stress) for
    stress > 0, all BIGINT.
    """
    und = und.localCheckpoint(eager=True)
    l0 = sources.select(F.col("node").alias("s"), "node",
                        F.lit(1).cast("long").alias("sigma")) \
        .localCheckpoint(eager=True)
    levels = [l0]
    visited = l0.select("s", "node")
    lvl = l0
    for _ in range(depth):
        nxt = (lvl.join(und, lvl["node"] == und["src"])
               .select("s", F.col("dst").alias("node"), "sigma")
               .join(visited, ["s", "node"], "left_anti")
               .groupBy("s", "node").agg(F.sum("sigma").alias("sigma"))
               .localCheckpoint(eager=True))
        levels.append(nxt)
        # visited is a union of ALREADY-checkpointed frontiers — keep it
        # lazy: a checkpoint here would only re-materialize rows the
        # per-level checkpoints already hold, one extra job per round
        # (r09 audit of the heaviest extended row)
        visited = visited.union(nxt.select("s", "node"))
        lvl = nxt
    # backward: T_depth ≡ 0 (truncated DAG frontier has no successors)
    tcur = levels[depth].select("s", "node", F.lit(0).cast("long").alias("t"))
    tk: dict[int, DataFrame] = {depth: tcur}
    for k in range(depth - 1, 0, -1):       # t₀ unused (v = s excluded)
        succ_t = tk[k + 1].select(F.col("s").alias("ts"),
                                  F.col("node").alias("w"), "t")
        x = (levels[k].select("s", "node")
             .join(und, F.col("node") == und["src"])
             .join(succ_t, (F.col("s") == F.col("ts"))
                   & (und["dst"] == F.col("w")))
             .groupBy("s", "node").agg(F.sum(F.col("t") + 1).alias("tt")))
        tk[k] = (levels[k].select("s", "node")
                 .join(x, ["s", "node"], "left")
                 .select("s", "node",
                         F.coalesce("tt", F.lit(0)).cast("long").alias("t"))
                 .localCheckpoint(eager=True))
    contribs = None
    for k in range(1, depth):               # layer `depth` has T = 0
        c = (levels[k].join(tk[k], ["s", "node"])
             .select("node", (F.col("sigma") * F.col("t")).alias("w")))
        contribs = c if contribs is None else contribs.unionAll(c)
    return (contribs.groupBy("node")
            .agg(F.sum("w").cast("long").alias("stress"))
            .filter(F.col("stress") > 0))


def q_graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled betweenness over the part↔supplier co-purchase bipartite
    graph (the ``graph_shortest_paths`` substrate — genuinely cyclic,
    ~25 edges/part at sf0.01): σ varies through the many parallel
    part–supplier–part paths, so both phases carry live variation (the
    clique-block substrates leave sampled sources in isolated cliques —
    ≤8 output rows, dead; caught in dev). Bridge-wins closed form:
    tests/test_traverse.py on a planted two-clique bridge.
    Sources: partkey % {mod} == {rem} (sf-scaling pinned sample).
    Output: top-{k} (node, stress), total-ordered (stress desc, node).
    """
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_partkey").cast("long").alias("u"),
        (F.col("l_suppkey") + _SUPP_BASE).cast("long").alias("v"),
    ).distinct()
    und = (e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
           .unionAll(e.select(F.col("v").alias("src"),
                              F.col("u").alias("dst"))))
    sources = (e.select(F.col("u").alias("node")).distinct()
               .filter(F.col("node") % BETW_SRC_MOD == BETW_SRC_REM))
    stress = stress_centrality(und, sources, depth=BETW_DEPTH)
    return (stress.orderBy(F.desc("stress"), F.asc("node"))
            .limit(BETW_TOPK))


q_graph_betweenness_sampled.__doc__ = q_graph_betweenness_sampled.__doc__.format(
    mod=BETW_SRC_MOD, rem=BETW_SRC_REM, k=BETW_TOPK)


def _betweenness_sql(depth: int = BETW_DEPTH) -> str:
    """Unrolled two-phase oracle: the same union substrate as
    ``_densest_sql``, forward layers with NOT-EXISTS visited checks and
    σ sums, backward T chain, σ·T contribution rollup."""
    head = f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS u,
         CAST(l_suppkey + {_SUPP_BASE} AS BIGINT) AS v
  FROM lineitem
), und AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0
), l0 AS MATERIALIZED (
  SELECT u AS s, u AS node, CAST(1 AS BIGINT) AS sigma
  FROM (SELECT DISTINCT u FROM e0)
  WHERE u % {BETW_SRC_MOD} = {BETW_SRC_REM}
)"""
    parts = [head]
    for k in range(1, depth + 1):
        seen = " AND ".join(
            f"NOT EXISTS (SELECT 1 FROM l{j} p WHERE p.s = f.s AND p.node = u.dst)"
            for j in range(k))
        parts.append(f""", l{k} AS MATERIALIZED (
  SELECT f.s, u.dst AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
  FROM l{k - 1} f JOIN und u ON u.src = f.node
  WHERE {seen}
  GROUP BY f.s, u.dst
)""")
    parts.append(f""", t{depth} AS MATERIALIZED (
  SELECT s, node, CAST(0 AS BIGINT) AS t FROM l{depth}
)""")
    for k in range(depth - 1, 0, -1):
        parts.append(f""", t{k} AS MATERIALIZED (
  SELECT a.s, a.node, CAST(COALESCE(x.tt, 0) AS BIGINT) AS t
  FROM l{k} a LEFT JOIN (
    SELECT b.s, b.node, SUM(w.t + 1) AS tt
    FROM l{k} b JOIN und u ON u.src = b.node
    JOIN t{k + 1} w ON w.s = b.s AND w.node = u.dst
    GROUP BY b.s, b.node) x ON x.s = a.s AND x.node = a.node
)""")
    union = "\n    UNION ALL\n    ".join(
        f"SELECT l.node, l.sigma * t.t AS w FROM l{k} l "
        f"JOIN t{k} t ON t.s = l.s AND t.node = l.node"
        for k in range(1, depth))
    parts.append(f"""
SELECT node, CAST(SUM(w) AS BIGINT) AS stress FROM (
    {union}
)
GROUP BY node HAVING SUM(w) > 0
ORDER BY stress DESC, node LIMIT {BETW_TOPK}""")
    return "".join(parts)


# Supplier nodes offset into their own id range for the bipartite graph.
# 2^40: TPC-H partkey = 200,000 × sf, so the old 1,000,000 base silently
# aliased part and supplier nodes from sf≥5 (r05 ADVICE); at 2^40 a
# collision needs sf ≈ 5.5e6 while shifted supplier ids (10,000 × sf +
# 2^40) stay far inside int64. Disjointness is asserted, not assumed, in
# tests/test_graphq.py::test_supp_base_disjoint_from_partkeys.
_SUPP_BASE = 1 << 40

Q_BETWEENNESS_SQL = _betweenness_sql()   # needs _SUPP_BASE at call time


def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths (unweighted BFS distances) over a
    genuinely CYCLIC graph: the part↔supplier co-purchase bipartite graph
    from lineitem (edge = supplier ships part). Distances from one seed
    part, capped at 3 hops; output is the distance histogram.

    The tree-shaped hierarchy queries above can't distinguish min-depth
    BFS from plain expansion (every node has one path); this graph has
    ~50k edges over 2.1k nodes, so the visited-set subtraction in
    traverse.k_hop is load-bearing — without it the depth-3 frontier
    would hold billions of walk rows.

    Scale: per-hop equi-join frontier→edges with the visited-set anti-join
    and localCheckpoint (see traverse.py); edges distinct-ed once up
    front. The DuckDB oracle's recursive CTE uses UNION (not UNION ALL)
    dedup for the same termination guarantee.
    """
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").cast("long").alias("src"),
        (F.col("l_suppkey") + _SUPP_BASE).cast("long").alias("dst"),
    ).distinct()
    seeds = spark.range(1).select(
        F.lit(1).cast("long").alias("seed"), F.lit(1).cast("long").alias("node"))
    reached = k_hop(seeds, edges, depth=3, direction="both")
    return (
        reached.groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("depth")
    )


Q_SHORTEST_PATHS_SQL = f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
         CAST(l_suppkey + {_SUPP_BASE} AS BIGINT) AS dst
  FROM lineitem
), und AS (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
), walk AS (
  SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
  UNION
  SELECT u.dst, w.depth + 1
  FROM walk w JOIN und u ON u.src = w.node
  WHERE w.depth < 3
), dists AS (
  SELECT node, min(depth) AS depth FROM walk GROUP BY node
)
SELECT depth, count(*) AS n_nodes, min(node) AS min_node, max(node) AS max_node
FROM dists GROUP BY depth ORDER BY depth
"""


# Link prediction over the part↔supplier bipartite graph (same edge set as
# q_shortest_paths). Hot-node cap: a part shipped by d suppliers contributes
# d*(d-1)/2 candidate pairs — quadratic in the hottest part — so parts with
# degree > LINKPRED_MAX_PART_DEG are excluded from pair generation (the
# stop-shingle trick from dedup_ngram_jaccard applied to graphs). At sf0.01
# part degrees span 13..41, so the 30-cap is a live filter, not dead config.
LINKPRED_MAX_PART_DEG = 30
LINKPRED_TOPK = 100


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction via neighborhood overlap: for every supplier pair,
    count common parts and score with Jaccard over their part sets — the
    classic common-neighbors/co-occurrence recommender (reference shape:
    'which nodes should be connected next').

    Spark shape: candidate pairs from ONE self-equi-join on partkey
    (never supplier×supplier), pair rollup, then full per-supplier degrees
    joined back onto the ~|S|² pair table. Scale: the part-degree cap
    bounds the per-key fan-out of the pair join, so the shuffle is
    O(edges·cap) worst case, not O(hottest-part²); degree tables are
    node-cardinality — SF-growing, so no forced broadcast hint: the
    stats/AQE decide (broadcast locally, keyed shuffle at 100 TB).
    Top-k under a total-order sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # the distinct edge relation feeds degrees (referenced twice as
    # d1/d2), the cap join, and both pair-join sides — 6 lineitem scans
    # in one plan without materialization (r05 scan-multiplicity audit)
    edges = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct().localCheckpoint(eager=True)
    part_deg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("pd"))
    supp_deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("sd"))
    capped = edges.join(
        part_deg.filter(F.col("pd") <= LINKPRED_MAX_PART_DEG), "p")
    a = capped.select("p", F.col("s").alias("s1"))
    b = capped.select("p", F.col("s").alias("s2"))
    pairs = (
        a.join(b, "p")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    d1 = supp_deg.select(F.col("s").alias("s1"), F.col("sd").alias("deg1"))
    d2 = supp_deg.select(F.col("s").alias("s2"), F.col("sd").alias("deg2"))
    scored = (
        pairs.join(d1, "s1")
        .join(d2, "s2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("deg1") + F.col("deg2") - F.col("n_common")),
                6,
            ),
        )
    )
    return (
        scored.select("s1", "s2", "n_common", "deg1", "deg2", "jaccard")
        .orderBy(F.desc("jaccard"), "s1", "s2")
        .limit(LINKPRED_TOPK)
    )


Q_LINK_PREDICTION_SQL = f"""
WITH e AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), pdeg AS (
  SELECT p, count(*) AS pd FROM e GROUP BY p
), sdeg AS (
  SELECT s, count(*) AS sd FROM e GROUP BY s
), capped AS (
  SELECT e.p, e.s FROM e JOIN pdeg ON pdeg.p = e.p
  WHERE pdeg.pd <= {LINKPRED_MAX_PART_DEG}
), pairs AS (
  SELECT a.s AS s1, b.s AS s2, count(*) AS n_common
  FROM capped a JOIN capped b ON a.p = b.p AND a.s < b.s
  GROUP BY a.s, b.s
)
SELECT s1, s2, n_common,
       d1.sd AS deg1, d2.sd AS deg2,
       round(n_common * 1.0 / (d1.sd + d2.sd - n_common), 6) AS jaccard
FROM pairs
JOIN sdeg d1 ON d1.s = s1
JOIN sdeg d2 ON d2.s = s2
ORDER BY jaccard DESC, s1, s2
LIMIT {LINKPRED_TOPK}
"""


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the bipartite graph, per node type — the
    first profiling query run on any new graph (skew detection: the
    histogram tail IS the hot-key list the link-prediction cap guards
    against).

    Scale: two keyed aggregations (node → degree, degree → count), both
    with map-side partial aggregation; output is tiny.
    """
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()

    def hist(keycol: str, label: str) -> DataFrame:
        return (
            edges.groupBy(keycol)
            .agg(F.count(F.lit(1)).alias("degree"))
            .groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .select(F.lit(label).alias("node_type"), "degree", "n_nodes")
        )

    return hist("p", "part").unionByName(hist("s", "supplier")) \
        .orderBy("node_type", "degree")


Q_DEGREE_HISTOGRAM_SQL = """
WITH e AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), pd AS (
  SELECT 'part' AS node_type, count(*) AS degree FROM e GROUP BY p
), sd AS (
  SELECT 'supplier' AS node_type, count(*) AS degree FROM e GROUP BY s
), u AS (
  SELECT * FROM pd UNION ALL SELECT * FROM sd
)
SELECT node_type, CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
FROM u GROUP BY node_type, degree ORDER BY node_type, degree
"""


# Engine-portable recursive SQL: this ONE string is both the Spark query
# (spark.sql — Spark 4 executes WITH RECURSIVE natively) and the DuckDB
# oracle, so the parity check asserts the two engines' recursive-CTE
# semantics agree on the flagship traversal. Same edge derivation and
# depth cap as q_khop_hierarchy's DataFrame form.
RECURSIVE_KHOP_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT CAST(n_regionkey AS BIGINT) AS src,
         CAST(n_nationkey + {_NATION_BASE} AS BIGINT) AS dst FROM nation
  UNION ALL
  SELECT CAST(c_nationkey + {_NATION_BASE} AS BIGINT),
         CAST(c_custkey + {_CUST_BASE} AS BIGINT) FROM customer
  UNION ALL
  SELECT CAST(o_custkey + {_CUST_BASE} AS BIGINT),
         CAST(o_orderkey + {_ORDER_BASE} AS BIGINT) FROM orders
), walk AS (
  SELECT CAST(r_regionkey AS BIGINT) AS seed,
         CAST(r_regionkey AS BIGINT) AS node, 0 AS depth
  FROM region
  UNION ALL
  SELECT w.seed, e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < 3
), dists AS (
  SELECT seed, node, min(depth) AS depth FROM walk GROUP BY seed, node
)
SELECT seed, depth, count(*) AS n_nodes
FROM dists GROUP BY seed, depth ORDER BY seed, depth
"""


def q_sql_recursive_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship 3-hop expansion as ONE portable ANSI recursive CTE,
    executed by Spark 4's native WITH RECURSIVE support (spark.sql) — the
    SQL-API twin of q_khop_hierarchy's DataFrame loop, and the exact text
    DuckDB runs as the oracle (engine-portability is the assertion).

    Scale: Spark executes the recursive term as iterated joins with a
    per-step union — the same per-hop shuffle budget as traverse.k_hop,
    scheduled by the engine instead of driver-side Python.

    Adjudicated at sf0.1 (r04, 5 runs, noop sink): this CTE runs the
    UNSEEDED full-hierarchy expansion ~15% faster than the DataFrame loop
    (median 3.58 s vs 4.20 s) — no driver round-trip per hop. The loop
    stays the default for the engine's traversal operator because every
    production entry point is SEEDED (flagship k-hop: 1.24 s median),
    where its visited-set anti-join pruning and empty-frontier early exit
    win structurally — a recursive CTE can do neither.
    """
    for t in ("region", "nation", "customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(RECURSIVE_KHOP_SQL)


WSSSP_ROUNDS = 4      # fixed Bellman-Ford relaxation rounds (no probe —
#                       fixed-round loop discipline, see label_propagation)
WSSSP_TOP_N = 15


def q_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source WEIGHTED shortest paths (Bellman-Ford, fixed
    ``WSSSP_ROUNDS`` relaxation rounds) over the cyclic part↔supplier
    bipartite graph, edge weight = cheapest shipment price for the pair —
    the weighted complement of ``graph_shortest_paths``' unweighted BFS.

    Every arithmetic step is engine-portable: weights are parquet doubles
    both engines read bit-identically, each path cost is the same
    left-fold of additions in both unrollings, and per-round mins compare
    identical doubles — so the oracle value-checks full-precision
    distances (displayed rounded; positives round half-up identically).

    Scale: the relaxation is one equi-join frontier⋈edges plus a min
    aggregation per round — the CC/LPA loop shape (und materialized once,
    ``localCheckpoint(eager=True)`` per round, no fixpoint probe). The
    dist relation only ever holds REACHED nodes; unreached = absent, not
    +inf rows. Output is TakeOrdered top-``WSSSP_TOP_N`` closest.
    """
    li = load_table(spark, sf_dir, "lineitem")
    fwd = (li.groupBy(F.col("l_partkey").cast("long").alias("src"),
                      (F.col("l_suppkey") + _SUPP_BASE).cast("long").alias("dst"))
           .agg(F.min("l_extendedprice").alias("w")))
    # part ids and shifted supplier ids are disjoint spaces (_SUPP_BASE =
    # 2^40 ≫ 200,000 × sf; tested) → the reversed union cannot collide
    # with a forward pair
    und = fwd.union(fwd.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"), "w")) \
        .localCheckpoint(eager=True)
    dist = spark.range(1).select(F.lit(1).cast("long").alias("node"),
                                 F.lit(0.0).alias("dist"))
    for _ in range(WSSSP_ROUNDS):
        relax = (dist.join(und, dist.node == und.src)
                 .select(F.col("dst").alias("node"),
                         (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.union(relax).groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True))
    return (dist.orderBy("dist", "node").limit(WSSSP_TOP_N)
            .select("node", F.round("dist", 2).alias("dist")))


def _wsssp_oracle_sql(n_rounds: int = WSSSP_ROUNDS) -> str:
    # dPrev is referenced twice per round (carry + relax) — AS MATERIALIZED
    # or DuckDB's default inlining doubles the expression tree per round
    parts = [f"""
e0 AS MATERIALIZED (
  SELECT CAST(l_partkey AS BIGINT) AS src,
         CAST(l_suppkey + {_SUPP_BASE} AS BIGINT) AS dst,
         min(l_extendedprice) AS w
  FROM lineitem GROUP BY 1, 2
), und AS MATERIALIZED (
  SELECT src, dst, w FROM e0
  UNION ALL
  SELECT dst, src, w FROM e0
), d0 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS node, CAST(0.0 AS DOUBLE) AS dist
)"""]
    for i in range(n_rounds):
        parts.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i}
    UNION ALL
    SELECT u.dst AS node, d.dist + u.w AS dist
    FROM d{i} d JOIN und u ON u.src = d.node
  ) GROUP BY node
)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT node, round(dist, 2) AS dist
FROM d{n_rounds}
ORDER BY d{n_rounds}.dist, node
LIMIT {WSSSP_TOP_N}
""")


# -- HyperBall neighborhood function + HITS over a synthetic digraph --------
# Shared deterministic multi-degree digraph: three affine edge families over
# the customer id space, family j live on the residue classes c_custkey%3 >=
# thr, so out-degree varies 1..3 and ball growth differs per node — grouped
# outputs actually VARY (CLAUDE.md synthetic-corpus discipline).
_SYNTH_FAMS = ((7, 1, 0), (13, 3, 1), (29, 7, 2))  # (mul, add, min src%3)


def _synth_digraph(spark: SparkSession, sf_dir: str):
    """(vertices, edges, n) for the hyperball/HITS digraph. Edges are
    DISTINCT (families can collide mod n) so HITS' integer sums count each
    arc once; HyperBall's max-merge wouldn't care, but one edge relation
    serves both."""
    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    key = F.col("c_custkey").cast("long")
    fams = [
        cust.filter(F.col("c_custkey") % 3 >= thr)
            .select(key.alias("src"),
                    # arithmetic on the LONG key, not the raw int32 column:
                    # key*29 overflows INT32 once c_custkey > ~74M (sf≈495)
                    ((key * mul + add) % n).cast("long").alias("dst"))
        for mul, add, thr in _SYNTH_FAMS
    ]
    edges = (fams[0].union(fams[1]).union(fams[2])
             .filter(F.col("src") != F.col("dst")).distinct())
    verts = cust.select(key.alias("node"))
    return verts, edges, n


def _synth_edges_sql() -> str:
    """DuckDB twin of ``_synth_digraph``'s edge relation (expects an ``nn``
    CTE with the customer count)."""
    unions = []
    for mul, add, thr in _SYNTH_FAMS:
        where = f" WHERE c_custkey % 3 >= {thr}" if thr else ""
        unions.append(
            f"SELECT CAST(c_custkey AS BIGINT) AS src, "
            f"(CAST(c_custkey AS BIGINT) * {mul} + {add}) % (SELECT n FROM nn)"
            f" AS dst FROM customer{where}")
    return ("SELECT DISTINCT src, dst FROM ("
            + " UNION ALL ".join(unions) + ") WHERE src != dst")


HB_ROUNDS = 3   # fixed ball radius (no fixpoint probe — fixed-round loop
#                 discipline, see label_propagation)
HB_TOP_N = 20


def q_graph_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): per-node HLL counters of the ball
    B(v, t) = {u : dist(v, u) ≤ t}, grown by merging each node's counter
    with its successors' counters every round — the neighborhood-function
    / centrality estimator actually run on 100 TB-scale graphs, where
    exact per-node ball sizes are a |V|·|ball| blowup no engine survives.

    Spark shape: state is the SPARSE register relation (node, bucket,
    reg) — ≤ |V|×m rows, every round is ONE equi-join edges⋈state plus a
    (node, bucket)-keyed max aggregation (map-side combined; HLL merge is
    max algebra, so replays/duplicate edges are absorbed). Edges and each
    round's state are ``localCheckpoint(eager=True)``'d per the iterative-
    loop discipline; no fixpoint probe (fixed radius). The per-round
    estimate Σ 1/2^reg is computed WITHOUT densifying: the m−nnz absent
    buckets contribute exactly 1.0 each, so s = (m − count) + Σ_sparse.

    Bit-exactness (same argument as ``cardinality_hll``): the register
    build is integer arithmetic, the harmonic sum is a sum of dyadic
    rationals (order-independent), α·m²/s is one IEEE divide and the
    milli-scaling one multiply — both engines agree to the last bit, so
    the oracle (same rounds unrolled as chained CTEs) value-checks
    floor-milli estimates with no float tolerance.

    Reference parity: the reference's Neo4j engine exposes no centrality
    op (first-graph.py delegates querying to Cypher k-hop); this is part
    of the beyond-reference large-graph analytics battery
    (SURVEY.md §2 extension rows).
    """
    from .profiling import HLL_ALPHA_MM, HLL_M, HLL_W, mix32

    verts, edges, _ = _synth_digraph(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)

    # singleton register per node: the HLL of {node} under the shared
    # avalanche mix (profiling.mix32 — same hash both engines)
    mixed = mix32(verts.withColumn("_kr", F.col("node") % 2147483648),
                  key="_kr").drop("_kr")
    rank_dim = spark.createDataFrame(
        [(1 << j, j + 1) for j in range(HLL_W)] + [(0, HLL_W + 1)],
        "lowbit long, rank int")
    state = (mixed
             .select("node", (F.col("h") % HLL_M).alias("bucket"),
                     F.expr(f"(h div {HLL_M}) & -(h div {HLL_M})").alias("lowbit"))
             .join(F.broadcast(rank_dim), "lowbit")
             .select("node", "bucket", F.col("rank").alias("reg"))
             .localCheckpoint(eager=True))

    harmonic = ((F.lit(HLL_M) - F.count(F.lit(1)))
                + F.sum(F.lit(1.0) / F.expr(
                    "cast(shiftleft(cast(1 as bigint), reg) as double)")))
    ests = []
    for t in range(1, HB_ROUNDS + 1):
        prop = (edges.join(state, state["node"] == edges["dst"])
                .select(edges["src"].alias("node"), state["bucket"],
                        state["reg"]))
        state = (state.unionByName(prop).groupBy("node", "bucket")
                 .agg(F.max("reg").alias("reg"))
                 .localCheckpoint(eager=True))
        # zero_regs rides the final round: balls here are small relative
        # to m, i.e. the raw estimator's linear-counting regime — the
        # EXACT integer V = m − nnz is what the standard correction
        # m·ln(m/V) consumes downstream (ln itself is libm, not
        # cross-engine-stable, so the correction stays out of the oracle-
        # checked output; tests/test_traverse.py applies it Python-side
        # and checks accuracy against exact ball sizes)
        cols = ["node",
                F.floor(F.lit(HLL_ALPHA_MM) / F.col("_s") * 1000)
                .cast("long").alias(f"est{t}_milli")]
        if t == HB_ROUNDS:
            cols.append((F.lit(HLL_M) - F.col("_nnz")).cast("long")
                        .alias("zero_regs"))
        ests.append(state.groupBy("node")
                    .agg(harmonic.alias("_s"),
                         F.count(F.lit(1)).alias("_nnz"))
                    .select(*cols))
    out = ests[0]
    for e in ests[1:]:
        out = out.join(e, "node")
    return (out.orderBy(F.col(f"est{HB_ROUNDS}_milli").desc(), "node")
            .limit(HB_TOP_N))


def _hyperball_oracle_sql(n_rounds: int = HB_ROUNDS) -> str:
    """DuckDB twin of ``q_graph_hyperball``: singleton registers through
    the identical avalanche mix, ``n_rounds`` max-merge rounds unrolled
    as chained MATERIALIZED CTEs (each s{i} is referenced twice — carry +
    propagate — so default inlining would double the tree per round)."""
    from .profiling import _HLL_RANK_ROWS, HLL_ALPHA_MM, HLL_M, mix32_sql

    node_mix = mix32_sql(
        "(SELECT CAST(c_custkey AS BIGINT) AS node FROM customer)",
        "(node % 2147483648)", carry=("node",))
    parts = [f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED ({_synth_edges_sql()}),
rank_dim AS (
  SELECT CAST(lowbit AS BIGINT) AS lowbit, CAST(rank AS INT) AS rank
  FROM (VALUES {_HLL_RANK_ROWS}) AS t(lowbit, rank)
),
s0 AS MATERIALIZED (
  SELECT hb.node, hb.h % {HLL_M} AS bucket, d.rank AS reg
  FROM ({node_mix}) hb
  JOIN rank_dim d ON d.lowbit = ((hb.h // {HLL_M}) & -(hb.h // {HLL_M}))
)"""]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
s{i} AS MATERIALIZED (
  SELECT node, bucket, max(reg) AS reg FROM (
    SELECT node, bucket, reg FROM s{i - 1}
    UNION ALL
    SELECT e.src AS node, s.bucket, s.reg
    FROM e JOIN s{i - 1} s ON s.node = e.dst
  ) GROUP BY node, bucket
),
est{i} AS MATERIALIZED (
  SELECT node,
         ({HLL_M} - count(*)) + sum(1.0 / CAST(1 << reg AS DOUBLE)) AS s,
         CAST({HLL_M} - count(*) AS BIGINT) AS zero_regs
  FROM s{i} GROUP BY node
)""")
    est_cols = ",\n       ".join(
        f"CAST(floor(CAST({HLL_ALPHA_MM!r} AS DOUBLE) / e{i}.s * 1000) "
        f"AS BIGINT) AS est{i}_milli" for i in range(1, n_rounds + 1))
    est_cols += f",\n       e{n_rounds}.zero_regs AS zero_regs"
    joins = "".join(f" JOIN est{i} e{i} ON e{i}.node = e1.node"
                    for i in range(2, n_rounds + 1))
    return (
        "".join(parts)
        + f"""
SELECT e1.node,
       {est_cols}
FROM est1 e1{joins}
ORDER BY est{n_rounds}_milli DESC, e1.node
LIMIT {HB_TOP_N}
""")


HITS_ROUNDS = 3  # fixed rounds, UNNORMALIZED: every score stays an exact
#                  BIGINT (sums of integers), so cross-engine parity has no
#                  float caveat at all; magnitudes are bounded by deg^(2T)
HITS_TOP_N = 20


def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) over the synthetic digraph,
    ``HITS_ROUNDS`` fixed mutual-reinforcement rounds: h(v) = Σ a(u) over
    out-edges, then a(v) = Σ h(u) over in-edges. Deliberately
    UNNORMALIZED: with a(0) = 1 every subsequent score is an integer, so
    the unrolled DuckDB oracle value-checks exact BIGINTs — the
    normalization a production ranker applies is a monotone per-vector
    scale that never changes the ranking this query outputs.

    Scale: each half-round is one equi-join edges⋈scores plus a keyed sum
    (map-side combined) and a broadcast-spine left join for zero-degree
    nodes; state is |V| rows. Same loop discipline as PageRank
    (materialized edges, checkpoint per round, fixed rounds, no probe).
    """
    verts, edges, _ = _synth_digraph(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)
    verts = verts.localCheckpoint(eager=True)
    a = verts.select("node", F.lit(1).cast("long").alias("a"))
    h = None
    for _ in range(HITS_ROUNDS):
        hsum = (edges.join(a, a["node"] == edges["dst"])
                .groupBy(edges["src"]).agg(F.sum("a").alias("hs"))
                .withColumnRenamed("src", "node"))
        h = (verts.join(hsum, "node", "left")
             .select("node",
                     F.coalesce("hs", F.lit(0)).cast("long").alias("h"))
             .localCheckpoint(eager=True))
        asum = (edges.join(h, h["node"] == edges["src"])
                .groupBy(edges["dst"]).agg(F.sum("h").alias("as_"))
                .withColumnRenamed("dst", "node"))
        a = (verts.join(asum, "node", "left")
             .select("node",
                     F.coalesce("as_", F.lit(0)).cast("long").alias("a"))
             .localCheckpoint(eager=True))
    return (h.join(a, "node")
            .select("node", F.col("h").alias("hub_score"),
                    F.col("a").alias("auth_score"))
            .orderBy(F.col("auth_score").desc(), "node").limit(HITS_TOP_N))


def _hits_oracle_sql(n_rounds: int = HITS_ROUNDS) -> str:
    """DuckDB twin: the fixed rounds unrolled. Every aggregate is CAST
    back to BIGINT (DuckDB BIGINT sums widen to HUGEINT, which pandas
    reads as float64 — the canonicalizer trap in CLAUDE.md)."""
    parts = [f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED ({_synth_edges_sql()}),
verts AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer),
a0 AS MATERIALIZED (SELECT node, CAST(1 AS BIGINT) AS a FROM verts)"""]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
h{i} AS MATERIALIZED (
  SELECT v.node, CAST(COALESCE(s.hs, 0) AS BIGINT) AS h
  FROM verts v LEFT JOIN (
    SELECT e.src AS node, sum(a.a) AS hs
    FROM e JOIN a{i - 1} a ON a.node = e.dst GROUP BY e.src
  ) s ON s.node = v.node
),
a{i} AS MATERIALIZED (
  SELECT v.node, CAST(COALESCE(s.as_, 0) AS BIGINT) AS a
  FROM verts v LEFT JOIN (
    SELECT e.dst AS node, sum(h.h) AS as_
    FROM e JOIN h{i} h ON h.node = e.src GROUP BY e.dst
  ) s ON s.node = v.node
)""")
    return ("".join(parts) + f"""
SELECT h{n_rounds}.node, h{n_rounds}.h AS hub_score,
       a{n_rounds}.a AS auth_score
FROM h{n_rounds} JOIN a{n_rounds} ON a{n_rounds}.node = h{n_rounds}.node
ORDER BY auth_score DESC, h{n_rounds}.node
LIMIT {HITS_TOP_N}
""")


TEMPORAL_HOPS = 3     # fixed bounded-hop foremost-arrival rounds
TEMPORAL_SEED = 1     # seed user id (present at every sf)
TEMPORAL_TOP_N = 30


def q_graph_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RESPECTING reachability (foremost arrival) over a temporal
    contact graph — the algorithmic family static k-hop cannot express:
    a path is valid only if its edge timestamps are non-decreasing, so
    information (or contagion) can only flow forward in time. Static BFS
    over the same edges overcounts reach by ignoring ordering; the
    difference IS the operator.

    Graph: co-presence edges — two users sharing an (event_type, hour)
    cell are in contact at that hour. Relaxation: fixed
    ``TEMPORAL_HOPS`` Bellman-Ford-style rounds of
    arr(v) = min over edges (u,v,t) with t ≥ arr(u) of t — the standard
    distributed foremost-arrival recurrence; min-merge makes replayed
    relaxations idempotent.

    Scale: the contact EDGE LIST (u×v per cell, Σ g² rows) is never
    materialized — each round relaxes THROUGH the (type, hour) presence
    cells instead: frontier⋈presence finds the cells a reached user can
    transmit in (t ≥ arr(u)), and a second equi-join on the cell fans
    out to everyone present there. Per-round cost is linear in the
    frontier's presences plus the fan-out of the touched cells only —
    at 100 TB the presence relation IS the event log re-keyed, and the
    quadratic per-cell pair blowup (a flash-crowd cell's g²) simply
    never exists. Semantics are identical to edge-based relaxation: an
    edge (u, v, t) with t ≥ arr(u) contributes arrival t to v ⟺ u
    present in a cell at t ≥ arr(u) and v present in the same cell
    (self-contribution t ≥ arr(u) is absorbed by the min). Loop
    discipline: presence checkpointed once, state checkpointed per
    round, fixed rounds, no probe.

    Determinism: arrival times are exact hour-epoch BIGINTs; output is
    the top-``TEMPORAL_TOP_N`` earliest-reached users under a total
    order. The oracle materializes the edge list (DuckDB-side cost,
    not the operator's plan) — bit-equality across the two formulations
    is itself a check that the through-cell rewrite is lossless.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                  & F.col("event_type").isNotNull()))
    pres = (ev.select(
        F.col("user_id").cast("long").alias("u"),
        F.col("event_type").alias("ty"),
        F.unix_millis(F.date_trunc("hour", F.col("ts")).cast("timestamp"))
        .alias("t"))
        .distinct().localCheckpoint(eager=True))
    arr = (pres.filter(F.col("u") == TEMPORAL_SEED)
           .agg(F.min("t").alias("arr"))
           .select(F.lit(TEMPORAL_SEED).cast("long").alias("node"), "arr")
           .localCheckpoint(eager=True))
    for _ in range(TEMPORAL_HOPS):
        touched = (arr.join(pres, pres["u"] == arr["node"])
                   .filter(pres["t"] >= arr["arr"])
                   .select("ty", "t").distinct())
        relax = (touched.join(pres, ["ty", "t"])
                 .select(F.col("u").alias("node"), F.col("t").alias("arr")))
        arr = (arr.unionByName(relax).groupBy("node")
               .agg(F.min("arr").alias("arr"))
               .localCheckpoint(eager=True))
    return (arr.select(
        F.col("node").alias("user_id"),
        F.date_format(F.timestamp_seconds(F.expr("arr div 1000"))
                      .cast("timestamp_ntz"),
                      "yyyy-MM-dd HH:mm").alias("first_reach"))
        .orderBy("first_reach", "user_id").limit(TEMPORAL_TOP_N))


def _temporal_oracle_sql(n_rounds: int = TEMPORAL_HOPS) -> str:
    """DuckDB twin: the fixed relaxation rounds unrolled (each a{i}
    referenced twice — carry + relax — so AS MATERIALIZED)."""
    parts = [f"""
WITH pres AS MATERIALIZED (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS u, event_type AS ty,
         epoch_ms(date_trunc('hour', ts)) AS t
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), e AS MATERIALIZED (
  SELECT DISTINCT a.u AS src, b.u AS dst, a.t
  FROM pres a JOIN pres b ON a.ty = b.ty AND a.t = b.t AND a.u != b.u
), a0 AS MATERIALIZED (
  SELECT CAST({TEMPORAL_SEED} AS BIGINT) AS node,
         (SELECT min(t) FROM pres WHERE u = {TEMPORAL_SEED}) AS arr
)"""]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
a{i} AS MATERIALIZED (
  SELECT node, min(arr) AS arr FROM (
    SELECT node, arr FROM a{i - 1}
    UNION ALL
    SELECT e.dst AS node, e.t AS arr
    FROM a{i - 1} x JOIN e ON e.src = x.node AND e.t >= x.arr
  ) GROUP BY node
)""")
    return ("".join(parts) + f"""
SELECT node AS user_id,
       strftime(make_timestamp(arr * 1000), '%Y-%m-%d %H:%M') AS first_reach
FROM a{n_rounds}
ORDER BY first_reach, user_id
LIMIT {TEMPORAL_TOP_N}
""")


TEMPORAL_SEEDS = (1, 5, 9)   # seed SET (users 0-14 exist at every sf; the
#                              loud-failure test below guards disappearance)
TEMPORAL_MS_TOP_N = 12       # per-seed earliest-reached cap


def q_graph_temporal_multisource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-SOURCE foremost arrival — ``graph_temporal_reachability``
    generalized from one pinned seed to a seed SET, relaxed concurrently
    with one extra grouping key (the epidemiology / influence-analysis
    form: "earliest reach from each of these k patient-zeros").

    Same through-cell rewrite as the single-source op (the quadratic
    per-cell contact-edge blowup is never materialized; see
    q_graph_temporal_reachability's docstring for the equivalence
    argument — it is seedwise-independent, so carrying ``seed`` through
    every relation preserves it per seed). Per-round cost is linear in
    Σ_seeds |frontier presences| — k seeds share the single checkpointed
    presence relation and the SAME three joins per round, not k separate
    BFS runs. State is keyed (seed, node); min-merge groups on both.

    Output: per-seed top-``TEMPORAL_MS_TOP_N`` earliest-reached users via
    a row_number window PARTITIONED by seed (bounded partitions — |state|
    per seed, never the corpus), total-ordered (seed, first_reach,
    user_id). Arrival instants are exact hour-epoch BIGINTs end to end.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                  & F.col("event_type").isNotNull()))
    pres = (ev.select(
        F.col("user_id").cast("long").alias("u"),
        F.col("event_type").alias("ty"),
        F.unix_millis(F.date_trunc("hour", F.col("ts")).cast("timestamp"))
        .alias("t"))
        .distinct().localCheckpoint(eager=True))
    seeds = spark.createDataFrame([(int(s),) for s in TEMPORAL_SEEDS],
                                  "seed long")
    arr = (F.broadcast(seeds)
           .join(pres, pres["u"] == F.col("seed"))
           .groupBy("seed").agg(F.min("t").alias("arr"))
           .select("seed", F.col("seed").alias("node"), "arr")
           .localCheckpoint(eager=True))
    for _ in range(TEMPORAL_HOPS):
        touched = (arr.join(pres, pres["u"] == arr["node"])
                   .filter(pres["t"] >= arr["arr"])
                   .select("seed", "ty", "t").distinct())
        relax = (touched.join(pres, ["ty", "t"])
                 .select("seed", F.col("u").alias("node"),
                         F.col("t").alias("arr")))
        arr = (arr.unionByName(relax).groupBy("seed", "node")
               .agg(F.min("arr").alias("arr"))
               .localCheckpoint(eager=True))
    ranked = arr.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("seed").orderBy("arr", "node")))
    return (ranked.filter(F.col("rn") <= TEMPORAL_MS_TOP_N)
            .select(
                "seed",
                F.col("node").alias("user_id"),
                F.date_format(F.timestamp_seconds(F.expr("arr div 1000"))
                              .cast("timestamp_ntz"),
                              "yyyy-MM-dd HH:mm").alias("first_reach"),
                F.col("rn").cast("long").alias("reach_rank"))
            .orderBy("seed", "reach_rank"))


def _temporal_multisource_oracle_sql(n_rounds: int = TEMPORAL_HOPS) -> str:
    """DuckDB twin: per-seed relaxation unrolled — the single-source
    oracle with ``seed`` carried through every CTE. Note the rank window
    orders by (arr, node), the exact BIGINT pair, matching the Spark
    window; first_reach is formatted only at the end."""
    seed_list = ", ".join(str(s) for s in TEMPORAL_SEEDS)
    parts = [f"""
WITH pres AS MATERIALIZED (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS u, event_type AS ty,
         epoch_ms(date_trunc('hour', ts)) AS t
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), e AS MATERIALIZED (
  SELECT DISTINCT a.u AS src, b.u AS dst, a.t
  FROM pres a JOIN pres b ON a.ty = b.ty AND a.t = b.t AND a.u != b.u
), a0 AS MATERIALIZED (
  SELECT s.seed, s.seed AS node, min(p.t) AS arr
  FROM (SELECT CAST(unnest([{seed_list}]) AS BIGINT) AS seed) s
  JOIN pres p ON p.u = s.seed
  GROUP BY s.seed
)"""]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
a{i} AS MATERIALIZED (
  SELECT seed, node, min(arr) AS arr FROM (
    SELECT seed, node, arr FROM a{i - 1}
    UNION ALL
    SELECT x.seed, e.dst AS node, e.t AS arr
    FROM a{i - 1} x JOIN e ON e.src = x.node AND e.t >= x.arr
  ) GROUP BY seed, node
)""")
    return ("".join(parts) + f""",
ranked AS (
  SELECT seed, node, arr,
         row_number() OVER (PARTITION BY seed ORDER BY arr, node) AS rn
  FROM a{n_rounds}
)
SELECT seed, node AS user_id,
       strftime(make_timestamp(arr * 1000), '%Y-%m-%d %H:%M') AS first_reach,
       CAST(rn AS BIGINT) AS reach_rank
FROM ranked
WHERE rn <= {TEMPORAL_MS_TOP_N}
ORDER BY seed, reach_rank
""")


# --- strongly connected components (r11) -----------------------------------

SCC_SQUARINGS = 4  # reach relation covers paths of length <= 2^4 = 16


def _scc_graph(spark: SparkSession, sf_dir: str):
    """The planted-SCC substrate — ONE builder shared with
    tests/test_traverse.py (the _lpa_graph/_pr_incr_graphs discipline).

    Customers in blocks of 10 (block b = key div 10): a directed chain
    k → k+1 runs through every block; blocks with b % 3 != 0 get the
    closing edge (10b+9) → 10b and become directed 10-cycles (one
    10-node SCC each); blocks with b % 3 == 0 stay open chains (ten
    singleton SCCs — the size variation the dead-variation rule
    demands). Every 7th block bridges forward to the next block's head
    — cross-SCC edges that mutual-reachability must NOT merge (the
    failure a plain CC/min-flood would commit; the test asserts the
    planted counts)."""
    cust = load_table(spark, sf_dir, "customer")
    verts = cust.select(F.col("c_custkey").cast("long").alias("v"))
    k = F.col("c_custkey").cast("long")
    nmax = verts.agg(F.max("v").alias("nmax"))
    chain = (cust.crossJoin(F.broadcast(nmax))
             .filter((k % 10 < 9) & (k + 1 <= F.col("nmax")))
             .select(k.alias("src"), (k + 1).alias("dst")))
    closing = (cust.filter((k % 10 == 9) & (F.expr("CAST(c_custkey div 10 AS BIGINT)")
                                            % 3 != 0))
               .select(k.alias("src"), (k - 9).alias("dst")))
    bridge = (cust.crossJoin(F.broadcast(nmax))
              .filter((k % 10 == 9) & (F.expr("CAST(c_custkey div 10 AS BIGINT)") % 7 == 0)
                      & (k + 1 <= F.col("nmax")))
              .select(k.alias("src"), (k + 1).alias("dst")))
    return verts, chain.unionByName(closing).unionByName(bridge)


def _scc_labels(verts: DataFrame, edges: DataFrame) -> DataFrame:
    """(node=a, scc) labeling by mutual reachability over the
    repeated-squaring reach relation — shared by q_graph_scc and the
    condensation query (see q_graph_scc's docstring for the method)."""
    p = (verts.select(F.col("v").alias("a"), F.col("v").alias("b"))
         .unionByName(edges.select(F.col("src").alias("a"),
                                   F.col("dst").alias("b")))
         .distinct().localCheckpoint(eager=True))
    for _ in range(SCC_SQUARINGS):
        p = (p.alias("x")
             .join(p.alias("y"), F.col("x.b") == F.col("y.a"))
             .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
             .distinct().localCheckpoint(eager=True))
    rev = p.select(F.col("b").alias("a"), F.col("a").alias("b"))
    return (p.join(rev, ["a", "b"], "left_semi")
            .groupBy("a").agg(F.min("b").alias("scc")))


def _scc_labels_coloring(verts: DataFrame, edges: DataFrame,
                         max_outer: int = 8, max_flood: int = 64
                         ) -> DataFrame:
    """HUB-SAFE SCC labeling — the scale-complete sibling of
    ``_scc_labels`` (r12, verdict #6): forward/backward COLORING
    (Orzan-style FW-BW coloring, cf. Slota/Rajamanickam/Madduri's
    multistep SCC) instead of the repeated-squaring reach relation.
    The squaring form materializes a |V|·reach pair set — exact but
    quadratic on hub-dominated graphs (one popular node drags every
    follower into its row set; the graphq.py:q_graph_scc docstring
    boundary, SCALE.md §7g). Coloring never builds pair sets:

    1. FORWARD MAX-FLOOD: color(v) := max id u with u ⇝ v (init
       color(v)=v, relax color(dst) = max(color(dst), color(src)) to
       fixpoint). Every shuffle is |E|-keyed; state is |V|-sized.
    2. ROOTS: r with color(r)=r. EXTRACT: r's SCC is exactly
       {v : color(v)=r and v ⇝ r within the color class} — found by a
       BACKWARD flood from the roots that only crosses edges whose both
       endpoints share the root's color (color(v)=r proves r ⇝ v; the
       backward flood proves v ⇝ r).
    3. PEEL the extracted SCCs, repeat on the remainder (a color class
       may hold several SCCs; only the root's is proven per round).

    Same output contract as _scc_labels: (a=node, scc=min member id) —
    the canonical relabel makes the two machineries bit-comparable
    (tests assert partition equality; the registry key reuses the
    squaring key's oracle SQL verbatim).

    Loop discipline (CLAUDE.md): every flood round localCheckpoints and
    carries its changed-count probe (probes terminate these loops —
    the CC pattern); loop-invariant edges are checkpointed once per
    peel. Raises LOUDLY on non-convergence within the bounds instead of
    silently mislabeling (the verdict's fail-loud requirement).

    100 TB: worst case (ids anti-ordered along a long SCC chain) needs
    O(chain) outer peels — the documented boundary of THIS form; the
    two siblings cover each other's weak substrate (squaring: bounded
    reach sets, any SCC nesting; coloring: any degree distribution,
    shallow SCC nesting — pick by catalog shape)."""
    remaining = (verts.select("v").distinct()
                 .localCheckpoint(eager=True))
    labels: DataFrame | None = None
    for _outer in range(max_outer):
        if remaining.isEmpty():
            return labels
        rem_s = remaining.select(F.col("v").alias("_rs"))
        rem_d = remaining.select(F.col("v").alias("_rd"))
        e = (edges.join(rem_s, edges.src == F.col("_rs"), "left_semi")
             .join(rem_d, edges.dst == F.col("_rd"), "left_semi")
             .select("src", "dst").distinct()
             .localCheckpoint(eager=True))
        # 1. forward max-id flood to fixpoint
        col = remaining.select("v", F.col("v").alias("color")) \
            .localCheckpoint(eager=True)
        for _i in range(max_flood):
            upd = (e.join(col.select(F.col("v").alias("src"),
                                     F.col("color").alias("c_src")), "src")
                   .groupBy(F.col("dst").alias("v"))
                   .agg(F.max("c_src").alias("c_in")))
            nxt = (col.join(upd, "v", "left")
                   .select("v",
                           F.greatest("color", F.coalesce("c_in",
                                                          F.lit(-1)))
                           .alias("ncolor"),
                           (F.coalesce("c_in", F.lit(-1)) > F.col("color"))
                           .cast("long").alias("chg"))
                   .localCheckpoint(eager=True))
            changed = nxt.agg(F.sum("chg")).first()[0] or 0
            col = nxt.select("v", F.col("ncolor").alias("color"))
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"scc coloring: forward flood did not converge within "
                f"{max_flood} rounds — raise max_flood (graph diameter "
                "exceeds the bound)")
        # 2. backward containment flood from the roots, within classes —
        # monotone boolean mark on the SAME |V|-sized frame as the
        # forward flood (one keyed join + one checkpoint + one probe per
        # round, no growing set / anti-join churn)
        mk = (col.select("v", "color",
                         (F.col("v") == F.col("color")).cast("long")
                         .alias("mk"))
              .localCheckpoint(eager=True))
        for _i in range(max_flood):
            upd = (e.join(mk.select(F.col("v").alias("dst"),
                                    F.col("color").alias("c_dst"),
                                    F.col("mk").alias("mk_dst")), "dst")
                   .filter(F.col("mk_dst") == 1)
                   .groupBy(F.col("src").alias("v"),
                            F.col("c_dst").alias("color"))
                   .agg(F.lit(1).alias("hit")))
            nxt = (mk.join(upd, ["v", "color"], "left")
                   .select("v", "color",
                           F.greatest("mk", F.coalesce("hit", F.lit(0)))
                           .cast("long").alias("nmk"),
                           ((F.col("mk") == 0)
                            & F.col("hit").isNotNull())
                           .cast("long").alias("chg"))
                   .localCheckpoint(eager=True))
            changed = nxt.agg(F.sum("chg")).first()[0] or 0
            mk = nxt.select("v", "color", F.col("nmk").alias("mk"))
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"scc coloring: backward flood did not converge within "
                f"{max_flood} rounds")
        mark = mk.filter(F.col("mk") == 1).select("v", "color")
        # canonical relabel: scc = min member id (the _scc_labels
        # contract), then peel
        got = (mark.groupBy("color").agg(F.min("v").alias("scc"))
               .join(mark, "color")
               .select(F.col("v").alias("a"), "scc")
               .localCheckpoint(eager=True))
        labels = got if labels is None else labels.unionByName(got)
        remaining = (remaining.join(got.select(F.col("a").alias("v")),
                                    "v", "left_anti")
                     .localCheckpoint(eager=True))
    if not remaining.isEmpty():
        raise RuntimeError(
            f"scc coloring: {max_outer} peel rounds left nodes "
            "unlabeled — deeply nested SCC chain; raise max_outer or "
            "use the squaring form (_scc_labels)")
    return labels


def q_graph_scc_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hub-safe SCC labeling driven end-to-end on the SAME planted
    substrate and through the SAME output contract as q_graph_scc — the
    oracle SQL is reused VERBATIM (Q_GRAPH_SCC_SQL), so the driver
    value-checks that two entirely different machineries (repeated
    squaring vs FW-BW coloring) produce the identical SCC partition."""
    verts, edges = _scc_graph(spark, sf_dir)
    lab = _scc_labels_coloring(verts, edges)
    sizes = lab.groupBy("scc").agg(F.count(F.lit(1)).alias("sz"))
    return (sizes.groupBy(F.col("sz").alias("scc_size"))
            .agg(F.count(F.lit(1)).alias("n_sccs"),
                 F.sum("scc").alias("label_checksum"))
            .orderBy("scc_size"))


def q_graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRONGLY connected components — the directed sibling of
    graph_connected_components (which would dissolve the planted cycles
    and their one-way bridges into merged blobs). Exact via MUTUAL
    reachability: u,v share an SCC iff u ⇝ v and v ⇝ u, so each node's
    SCC label is the minimum id it mutually reaches — correct for ANY
    cross-SCC structure (one-way bridges can never be mutual) and exact
    whenever every SCC's internal diameter fits the reach bound.

    The ≤2^{SCC_SQUARINGS}-hop reach relation is built by REPEATED
    SQUARING (p_{k+1} = p_k ∘ p_k, seeded with edges ∪ identity):
    4 keyed equi-join+distinct rounds give 16-hop cover for the
    diameter-9 planted cycles — log₂ rounds instead of 16 frontier
    hops, the right shape when reach sets are bounded. 100 TB: each
    squaring shuffles on 64-bit ids; the relation stays |V|·reach-sized
    (bounded fan-out substrates — the k_hop caveat; hub graphs want the
    frontier/label-propagation form instead, cf. SCALE.md §7g). All
    arithmetic BIGINT; oracle unrolls the same squarings as
    MATERIALIZED CTEs. Output: SCC size histogram + label checksum."""
    verts, edges = _scc_graph(spark, sf_dir)
    lab = _scc_labels(verts, edges)
    sizes = lab.groupBy("scc").agg(F.count(F.lit(1)).alias("sz"))
    return (sizes.groupBy(F.col("sz").alias("scc_size"))
            .agg(F.count(F.lit(1)).alias("n_sccs"),
                 F.sum("scc").alias("label_checksum"))
            .orderBy("scc_size"))


def _scc_label_cte_sql() -> str:
    """The WITH-fragment ending at ``lab(node, scc)`` — the DuckDB twin
    of _scc_labels over the planted substrate, shared by the SCC and
    condensation oracles (the same edge algebra and the same unrolled
    squarings; p_k referenced twice per squaring → MATERIALIZED, the
    CLAUDE.md CTE rule)."""
    parts = [f"""
WITH verts AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
nmx AS (SELECT max(v) AS nmax FROM verts),
e AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS src,
         CAST(c_custkey AS BIGINT) + 1 AS dst
  FROM customer
  WHERE c_custkey % 10 < 9
    AND CAST(c_custkey AS BIGINT) + 1 <= (SELECT nmax FROM nmx)
  UNION ALL
  SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT) - 9
  FROM customer
  WHERE c_custkey % 10 = 9 AND (c_custkey // 10) % 3 <> 0
  UNION ALL
  SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT) + 1
  FROM customer
  WHERE c_custkey % 10 = 9 AND (c_custkey // 10) % 7 = 0
    AND CAST(c_custkey AS BIGINT) + 1 <= (SELECT nmax FROM nmx)
),
p0 AS MATERIALIZED (
  SELECT v AS a, v AS b FROM verts
  UNION
  SELECT src AS a, dst AS b FROM e
)"""]
    for i in range(1, SCC_SQUARINGS + 1):
        parts.append(f""",
p{i} AS MATERIALIZED (
  SELECT DISTINCT x.a, y.b
  FROM p{i-1} x JOIN p{i-1} y ON x.b = y.a
)""")
    pk = f"p{SCC_SQUARINGS}"
    parts.append(f""",
lab AS MATERIALIZED (
  SELECT f.a AS node, min(f.b) AS scc
  FROM {pk} f JOIN {pk} r ON f.a = r.b AND f.b = r.a
  GROUP BY f.a
)""")
    return "".join(parts)


Q_GRAPH_SCC_SQL = _scc_label_cte_sql() + """,
sizes AS (SELECT scc, count(*) AS sz FROM lab GROUP BY scc)
SELECT CAST(sz AS BIGINT) AS scc_size,
       CAST(count(*) AS BIGINT) AS n_sccs,
       CAST(sum(scc) AS BIGINT) AS label_checksum
FROM sizes GROUP BY sz ORDER BY scc_size"""


SCC_LEVEL_ROUNDS = 12  # ≥ longest condensation path (≤ 11 on the substrate)


def q_graph_scc_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONDENSATION of the SCC partition — collapse every SCC to one
    node, keep the distinct cross-SCC edges (an acyclic DAG by
    construction), and layer it by LONGEST-path topological level via
    fixed max-relax rounds: level(c) = 1 + max over predecessors, 0 for
    sources. This is the dependency-scheduling view of a directed graph
    (build stages, pipeline waves): everything in level L can run once
    levels < L are done.

    Fixed-round discipline (CLAUDE.md): SCC_LEVEL_ROUNDS = 12 relax
    rounds with NO fixpoint probe — the substrate's longest condensation
    path is ≤ 11 (a 9-edge open-block chain + a bridge + one more hop),
    and one relax round extends covered path length by 1, so 12 rounds
    are exact; the bound is documented, not probed. All BIGINT. Output:
    per level, the SCC count, total member nodes, and a label checksum.

    Scale: the condensation is |SCCs|-sized — usually orders of
    magnitude below |V| — so the relax loop runs on the REDUCED graph;
    the only |V|-sized steps are the labeling (shared with q_graph_scc)
    and the two label joins deriving condensed edges/sizes."""
    verts, edges = _scc_graph(spark, sf_dir)
    lab = _scc_labels(verts, edges).localCheckpoint(eager=True)
    sizes = lab.groupBy("scc").agg(F.count(F.lit(1)).alias("n_nodes"))
    lsrc = lab.select(F.col("a").alias("src"), F.col("scc").alias("c_src"))
    ldst = lab.select(F.col("a").alias("dst"), F.col("scc").alias("c_dst"))
    ce = (edges.join(lsrc, "src").join(ldst, "dst")
          .filter(F.col("c_src") != F.col("c_dst"))
          .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
          .distinct().localCheckpoint(eager=True))
    lv = sizes.select("scc", F.lit(0).cast("long").alias("lv")) \
              .localCheckpoint(eager=True)
    for _ in range(SCC_LEVEL_ROUNDS):
        incoming = (ce.join(lv.withColumnRenamed("scc", "src"), "src")
                    .groupBy(F.col("dst").alias("scc"))
                    .agg((F.max("lv") + 1).alias("mx")))
        lv = (lv.join(incoming, "scc", "left")
              .select("scc", F.greatest("lv", F.coalesce("mx", F.lit(0)))
                      .cast("long").alias("lv"))
              .localCheckpoint(eager=True))
    return (lv.join(sizes, "scc")
            .groupBy(F.col("lv").alias("level"))
            .agg(F.count(F.lit(1)).alias("n_sccs"),
                 F.sum("n_nodes").alias("n_nodes"),
                 F.sum("scc").alias("label_checksum"))
            .orderBy("level"))


def _scc_condensation_oracle_sql() -> str:
    """DuckDB twin: the shared labeling prefix, the same condensed-edge
    derivation, and SCC_LEVEL_ROUNDS unrolled max-relax rounds."""
    parts = [_scc_label_cte_sql(), """,
sizes AS MATERIALIZED (
  SELECT scc, CAST(count(*) AS BIGINT) AS n_nodes FROM lab GROUP BY scc
),
ce AS MATERIALIZED (
  SELECT DISTINCT ls.scc AS src, ld.scc AS dst
  FROM e
  JOIN lab ls ON ls.node = e.src
  JOIN lab ld ON ld.node = e.dst
  WHERE ls.scc <> ld.scc
),
lv0 AS MATERIALIZED (SELECT scc, CAST(0 AS BIGINT) AS lv FROM sizes)"""]
    for i in range(1, SCC_LEVEL_ROUNDS + 1):
        parts.append(f""",
lv{i} AS MATERIALIZED (
  SELECT s.scc,
         CAST(greatest(s.lv, COALESCE(m.mx, 0)) AS BIGINT) AS lv
  FROM lv{i-1} s LEFT JOIN (
    SELECT ce.dst AS scc, max(p.lv) + 1 AS mx
    FROM ce JOIN lv{i-1} p ON p.scc = ce.src GROUP BY ce.dst
  ) m USING (scc)
)""")
    parts.append(f"""
SELECT lv AS level,
       CAST(count(*) AS BIGINT) AS n_sccs,
       CAST(sum(n_nodes) AS BIGINT) AS n_nodes,
       CAST(sum(s.scc) AS BIGINT) AS label_checksum
FROM lv{SCC_LEVEL_ROUNDS} s JOIN sizes USING (scc)
GROUP BY lv ORDER BY level""")
    return "".join(parts)


Q_GRAPH_SCC_CONDENSATION_SQL = _scc_condensation_oracle_sql()


# --- deterministic random walks (r12) ---------------------------------------

WALK_STEPS = 8
WALK_SEED_MOD = 50      # one walk per customer with custkey % 50 == 0
WALK_DEADEND_MOD = 97   # nodes with custkey % 97 == 0 have NO out-edges
# hash constants: two mixing rounds; operands stay < ~2^21 and the
# largest multiplier is < 2^32, so every BIGINT product is < 2^53 and
# ANSI arithmetic can never overflow (profiling.py HLL discipline); the
# additive offsets kill the zero fixed point
_WALK_H1 = "((walk * 2654435761 + step * 40503 + dst * 1597334677 + 12345) % 2147483647)"
_WALK_HASH = f"(({_WALK_H1} * 48271 + 11) % 2147483647)"


def _walk_graph(spark: SparkSession, sf_dir: str):
    """Walk substrate over customer keys — out-degree VARIES (1–3: chain
    u→u+1, doubling u→2u when in range, halving u→u div 2) so the
    hash-ranked choice is genuinely exercised, and every 97th node is a
    planted DEAD END (no out-edges) so early-terminated walks exist
    (dead-variation rule: walk lengths must vary)."""
    cust = load_table(spark, sf_dir, "customer")
    verts = cust.select(F.col("c_custkey").cast("long").alias("v"))
    k = F.col("c_custkey").cast("long")
    nmax = verts.agg(F.max("v").alias("nmax"))
    base = cust.crossJoin(F.broadcast(nmax)).filter(
        k % WALK_DEADEND_MOD != 0)
    chain = (base.filter(k + 1 <= F.col("nmax"))
             .select(k.alias("src"), (k + 1).alias("dst")))
    dbl = (base.filter(k * 2 <= F.col("nmax"))
           .select(k.alias("src"), (k * 2).alias("dst")))
    half = (base.filter(k >= 2)
            .select(k.alias("src"), F.expr(
                "CAST(c_custkey AS BIGINT) div 2").alias("dst")))
    edges = (chain.unionByName(dbl).unionByName(half).distinct()
             .localCheckpoint(eager=True))
    return verts, edges


def _walk_trail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (walk, step, node) trail relation — the L-round frontier loop
    shared by the walk summary and the skip-gram pair keys (each caller
    re-runs the build; the loop is the operator, not a cache read)."""
    verts, edges = _walk_graph(spark, sf_dir)
    seeds = (verts.filter(F.col("v") % WALK_SEED_MOD == 0)
             .select(F.col("v").alias("walk"), F.col("v").alias("cur")))
    return _walk_trail_over(edges, seeds)


def _walk_trail_over(edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """The frontier loop over an INJECTED (edges, seeds) substrate — the
    sf1-proxy scale probe (scripts/sf_scale_probe_r12b.py) runs this
    exact code over a 10x-replicated substrate, so the measured scaling
    row covers the shipped loop, not a re-implementation."""
    state = seeds.localCheckpoint(eager=True)
    trail = state.select("walk", F.lit(0).cast("long").alias("step"),
                         F.col("cur").alias("node"))
    trail = trail.localCheckpoint(eager=True)
    w = W.partitionBy("walk")
    for t in range(1, WALK_STEPS + 1):
        cand = (state.join(edges, state.cur == edges.src)
                .select("walk", "dst")
                .withColumn("step", F.lit(t).cast("long")))
        ranked = cand.withColumn(
            "rn", F.row_number().over(
                w.orderBy(F.expr(_WALK_HASH), F.col("dst"))))
        state = (ranked.filter(F.col("rn") == 1)
                 .select("walk", F.col("dst").alias("cur"))
                 .localCheckpoint(eager=True))
        if state.isEmpty():
            break
        trail = trail.unionByName(
            state.select("walk", F.lit(t).cast("long").alias("step"),
                         F.col("cur").alias("node"))
        ).localCheckpoint(eager=True)
    return trail


def q_graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC random-walk sampling — the distributed
    DeepWalk/node2vec corpus generator (walks feed skip-gram training
    downstream; the reference's graph has no analytics layer at all, so
    this extends the engine the direction the LLM-pipeline operators
    do). True randomness would break the bit-exact oracle AND
    reproducible training, so each step is chosen by a seeded HASH: from
    node u, walk w at step t moves to the out-neighbor v minimizing
    (h(w, t, v), v) — a uniform-looking, replayable choice (p=q=1
    node2vec; biased variants change only the ranking expression).

    Shape: L=8 synchronous rounds; each round is ONE equi-join of the
    frontier (walk, cur) against edges keyed on src, then a
    row_number=1 rank within (walk) over ≤out-degree candidates.
    Dead-end nodes terminate their walks early (inner join drops them).
    100 TB: frontier and edges both shuffle on 64-bit keys; per-round
    frontier is |walks|-sized — a billion walks is a billion-row keyed
    join per step, embarrassingly partitionable; the per-(walk,step)
    rank window is over ≤3 rows. The trail accumulates via unions of
    checkpointed per-step frames (lineage O(1) per round).

    Output: per walk — end node, steps completed, Σ(t+1)·node_t
    checksum (the whole path pinned by one BIGINT), all exactly
    mirrored by the oracle's unrolled per-step CTEs."""
    trail = _walk_trail(spark, sf_dir)
    return (trail.groupBy("walk")
            .agg(F.max("step").alias("n_steps"),
                 F.max_by("node", "step").alias("end_node"),
                 F.sum((F.col("step") + 1) * F.col("node"))
                 .alias("path_checksum"))
            .orderBy("walk"))


def _walk_trail_cte_sql() -> str:
    """The WITH-fragment ending at ``trail(walk, step, node)`` — unrolled
    per-step CTEs with the IDENTICAL hash/rank (DuckDB's ROW_NUMBER over
    (hash, dst) reproduces the argmin exactly); shared by the walk
    summary and skip-gram oracles."""
    parts = [f"""
WITH verts AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
nmx AS (SELECT max(v) AS nmax FROM verts),
e AS MATERIALIZED (
  SELECT v AS src, v + 1 AS dst FROM verts
  WHERE v % {WALK_DEADEND_MOD} <> 0 AND v + 1 <= (SELECT nmax FROM nmx)
  UNION
  SELECT v, v * 2 FROM verts
  WHERE v % {WALK_DEADEND_MOD} <> 0 AND v * 2 <= (SELECT nmax FROM nmx)
  UNION
  SELECT v, v // 2 FROM verts
  WHERE v % {WALK_DEADEND_MOD} <> 0 AND v >= 2
),
s0 AS MATERIALIZED (
  SELECT v AS walk, v AS cur FROM verts WHERE v % {WALK_SEED_MOD} = 0
)"""]
    for t in range(1, WALK_STEPS + 1):
        h1 = (f"((walk * 2654435761 + {t} * 40503 + dst * 1597334677 "
              "+ 12345) % 2147483647)")
        h = f"(({h1} * 48271 + 11) % 2147483647)"
        parts.append(f""",
s{t} AS MATERIALIZED (
  SELECT walk, dst AS cur FROM (
    SELECT s.walk, e.dst,
           ROW_NUMBER() OVER (PARTITION BY s.walk
                              ORDER BY {h}, e.dst) AS rn
    FROM s{t-1} s JOIN e ON e.src = s.cur
  ) WHERE rn = 1
)""")
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT walk, CAST({t} AS BIGINT) AS step, cur AS node FROM s{t}"
        for t in range(0, WALK_STEPS + 1))
    parts.append(f""",
trail AS MATERIALIZED (
  {unions}
)""")
    return "".join(parts)


Q_GRAPH_RANDOM_WALKS_SQL = _walk_trail_cte_sql() + """
SELECT walk,
       CAST(max(step) AS BIGINT) AS n_steps,
       CAST(max_by(node, step) AS BIGINT) AS end_node,
       CAST(sum((step + 1) * node) AS BIGINT) AS path_checksum
FROM trail GROUP BY walk ORDER BY walk"""


# --- skip-gram pairs + hash negative sampling over the walk trail -----------

WALK_WINDOW = 2        # skip-gram context window over walk positions
_PAIR_KEY = 4_000_000_000  # > any node id: center*KEY+other is injective
_NEG_H1 = ("((center * 2654435761 + context * 1597334677 + dist * 40503 "
           "+ 999331) % 2147483647)")
_NEG_HASH = f"(({_NEG_H1} * 48271 + 11) % 2147483647)"


def q_graph_walk_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram training pairs from the walk corpus — the downstream
    half of the DeepWalk/node2vec pipeline (walks → (center, context)
    pairs within a window → negative samples; the pairs ARE the
    embedding-training dataset). Positives: ordered pairs within
    WALK_WINDOW positions on the same walk. Negatives: one per positive,
    drawn by the same seeded-hash discipline as the walk steps (uniform
    over the vertex universe, replayable — the training set is
    bit-reproducible end to end).

    Shape: the trail self-joins ON WALK (keyed, ≤L+1 rows per key — no
    blow-up), negatives are a pure per-row expression + one broadcast
    1-row max. 100 TB: pairs = |walks|·O(L·window) rows generated by one
    keyed self-join — the standard corpus-expansion job before
    embedding training. Output: one audit row per (kind, dist) with
    count / injective-key distinct count / checksum, pinning the exact
    pair multiset either side of the negative sampler."""
    trail = _walk_trail(spark, sf_dir)
    t1 = trail.select("walk", F.col("step").alias("s1"),
                      F.col("node").alias("center"))
    t2 = trail.select("walk", F.col("step").alias("s2"),
                      F.col("node").alias("context"))
    dist = F.abs(F.col("s2") - F.col("s1"))
    pairs = (t1.join(t2, "walk")
             .filter((dist >= 1) & (dist <= WALK_WINDOW))
             .select("center", "context", dist.cast("long").alias("dist"))
             .localCheckpoint(eager=True))
    pos = (pairs.groupBy("dist")
           .agg(F.count(F.lit(1)).alias("n_pairs"),
                F.countDistinct(F.col("center") * F.lit(_PAIR_KEY)
                                + F.col("context")).alias("n_distinct"),
                F.sum(F.col("center") + 131 * F.col("context"))
                .alias("checksum"))
           .select(F.lit("pos").alias("kind"), "dist", "n_pairs",
                   "n_distinct", "checksum"))
    nmax = (load_table(spark, sf_dir, "customer")
            .agg(F.max(F.col("c_custkey").cast("long")).alias("nmax")))
    negs = (pairs.crossJoin(F.broadcast(nmax))
            .withColumn("neg", F.expr(_NEG_HASH) % F.col("nmax") + 1))
    neg = (negs.agg(F.count(F.lit(1)).alias("n_pairs"),
                    F.countDistinct(F.col("center") * F.lit(_PAIR_KEY)
                                    + F.col("neg")).alias("n_distinct"),
                    F.sum(F.col("center") + 131 * F.col("neg"))
                    .alias("checksum"))
           .select(F.lit("neg").alias("kind"),
                   F.lit(0).cast("long").alias("dist"), "n_pairs",
                   "n_distinct", "checksum"))
    return pos.unionByName(neg).orderBy("kind", "dist")


Q_GRAPH_WALK_SKIPGRAMS_SQL = _walk_trail_cte_sql() + f""",
pairs AS MATERIALIZED (
  SELECT a.node AS center, b.node AS context,
         CAST(abs(b.step - a.step) AS BIGINT) AS dist
  FROM trail a JOIN trail b ON a.walk = b.walk
  WHERE abs(b.step - a.step) BETWEEN 1 AND {WALK_WINDOW}
),
negs AS MATERIALIZED (
  SELECT center,
         {_NEG_HASH} % (SELECT nmax FROM nmx) + 1 AS neg
  FROM pairs
)
SELECT 'pos' AS kind, dist,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT center * {_PAIR_KEY} + context) AS BIGINT)
         AS n_distinct,
       CAST(sum(center + 131 * context) AS BIGINT) AS checksum
FROM pairs GROUP BY dist
UNION ALL
SELECT 'neg', CAST(0 AS BIGINT),
       CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT center * {_PAIR_KEY} + neg) AS BIGINT),
       CAST(sum(center + 131 * neg) AS BIGINT)
FROM negs
ORDER BY kind, dist"""


# --- Luby maximal independent set --------------------------------------------

MIS_ROUNDS = 8

# strict total-order priority: two xorshift/multiply rounds over the
# node id (profiling.py hash discipline), packed with the id itself so
# no two nodes ever tie — pri < 2^31 * 2^31 + 2^31 < 2^63, BIGINT-safe
# in both engines
def _mis_pri(col: str) -> str:
    h1 = f"(({col} * 2654435761 + 777) % 2147483647)"
    return f"((({h1}) * 48271 + 11) % 2147483647) * 2147483648 + {col}"


def q_graph_mis_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set via Luby's algorithm, the deterministic
    PRIORITY variant: in each round an undecided node joins the MIS iff
    its hash-priority beats every undecided neighbor's; its neighbors
    become excluded; repeat. The classic O(log n)-round distributed
    symmetry-breaking primitive (Luby 1986) — the building block under
    distributed coloring/scheduling — on the clustering-coeff union
    substrate (cliques + chain fringe: cliques give one winner per
    round per block, the sparse chain fringe decides in parallel).

    Determinism: true Luby samples priorities per round; here the
    priority is a seeded hash of the node id (round-invariant), which
    keeps the oracle bit-exact and the output replayable while
    preserving the independence/maximality guarantees (any strict total
    order works; round-invariant order costs rounds only in adversarial
    orders, and the round count is CAPPED anyway).

    Both engines run the same FIXED ``MIS_ROUNDS`` rounds (the Spark
    loop early-exits once nothing is undecided — identical result, the
    oracle's extra rounds operate on an empty set), and the output
    carries ``n_undecided`` so an unconverged cap is VISIBLE in the
    checked values, plus ``n_conflict`` (edges inside the MIS — the
    independence invariant, pinned at 0 by the golden compare).

    Shape per round: one keyed min-aggregation over the live edge set +
    two anti-joins, all on 64-bit ids; the live edge set shrinks
    geometrically. 100 TB: every step is a keyed shuffle over the
    current undecided subgraph — no all-pairs, no broadcast of
    anything unbounded."""
    edges = _lcc_union_edges(spark, sf_dir)
    sym = (edges.union(edges.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
           .localCheckpoint(eager=True))
    und = (sym.select(F.col("u").alias("node")).distinct()
           .localCheckpoint(eager=True))
    mis = und.filter(F.lit(False)).localCheckpoint(eager=True)
    pri_node = F.expr(_mis_pri("node"))
    for _ in range(MIS_ROUNDS):
        live = (sym.join(und.select(F.col("node").alias("u")), "u")
                .join(und.select(F.col("node").alias("v")), "v"))
        nbmin = (live.groupBy(F.col("u").alias("node"))
                 .agg(F.min(F.expr(_mis_pri("v"))).alias("mn")))
        winners = (und.join(nbmin, "node", "left")
                   .filter(F.col("mn").isNull() | (pri_node < F.col("mn")))
                   .select("node").localCheckpoint(eager=True))
        excl = (sym.join(winners.select(F.col("node").alias("u")), "u")
                .select(F.col("v").alias("node")).distinct())
        und = (und.join(winners, "node", "left_anti")
               .join(excl, "node", "left_anti")
               .localCheckpoint(eager=True))
        # mis is a union of ALREADY-checkpointed winner frames — its
        # lineage is O(rounds) flat, no per-round checkpoint needed
        mis = mis.unionByName(winners)
        if und.isEmpty():
            break
    conflict = (edges
                .join(mis.select(F.col("node").alias("u")), "u", "left_semi")
                .join(mis.select(F.col("node").alias("v")), "v", "left_semi")
                .agg(F.count(F.lit(1)).alias("n_conflict")))
    summary = mis.agg(F.count(F.lit(1)).alias("n_mis"),
                      F.sum("node").alias("mis_checksum"),
                      F.min("node").alias("min_mis"),
                      F.max("node").alias("max_mis"))
    undec = und.agg(F.count(F.lit(1)).alias("n_undecided"))
    return summary.crossJoin(F.broadcast(undec))         .crossJoin(F.broadcast(conflict))


def _mis_sql() -> str:
    """Unrolled Luby rounds with the identical packed-hash priority —
    the edges CTE is the Q_LCC_SQL substrate verbatim."""
    parts = ["""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT CAST(a.c_custkey AS BIGINT) AS u, CAST(b.c_custkey AS BIGINT) AS v
    FROM customer a JOIN customer b
      ON b.c_custkey > a.c_custkey
     AND b.c_custkey - b.c_custkey % 10 = a.c_custkey - a.c_custkey % 10
    UNION ALL
    SELECT CAST(a.c_custkey AS BIGINT), CAST(b.c_custkey AS BIGINT)
    FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 10
    WHERE a.c_custkey % 70 = 0
    UNION ALL
    SELECT CAST(a.c_custkey AS BIGINT), CAST(b.c_custkey AS BIGINT)
    FROM customer a JOIN customer b
      ON (b.c_custkey = a.c_custkey + 1 OR b.c_custkey = a.c_custkey + 2)
     AND a.c_nationkey = b.c_nationkey
  )
),
sym AS MATERIALIZED (
  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
),
und0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym)"""]
    for r in range(1, MIS_ROUNDS + 1):
        parts.append(f""",
m{r} AS MATERIALIZED (
  SELECT d.node FROM und{r-1} d
  LEFT JOIN (
    SELECT s.u AS node, min({_mis_pri('s.v')}) AS mn
    FROM sym s
    JOIN und{r-1} a ON a.node = s.u
    JOIN und{r-1} b ON b.node = s.v
    GROUP BY s.u) nb ON nb.node = d.node
  WHERE nb.mn IS NULL OR {_mis_pri('d.node')} < nb.mn
),
und{r} AS MATERIALIZED (
  SELECT node FROM und{r-1}
  WHERE node NOT IN (SELECT node FROM m{r})
    AND node NOT IN (SELECT s.v FROM sym s
                     JOIN m{r} w ON w.node = s.u)
)""")
    unions = " UNION ALL ".join(f"SELECT node FROM m{r}"
                                for r in range(1, MIS_ROUNDS + 1))
    parts.append(f""",
mis AS MATERIALIZED ({unions})""")
    return "".join(parts)


Q_GRAPH_MIS_LUBY_SQL = _mis_sql() + f"""
SELECT CAST((SELECT count(*) FROM mis) AS BIGINT) AS n_mis,
       CAST((SELECT sum(node) FROM mis) AS BIGINT) AS mis_checksum,
       CAST((SELECT min(node) FROM mis) AS BIGINT) AS min_mis,
       CAST((SELECT max(node) FROM mis) AS BIGINT) AS max_mis,
       CAST((SELECT count(*) FROM und{MIS_ROUNDS}) AS BIGINT)
         AS n_undecided,
       CAST((SELECT count(*) FROM edges e
             WHERE e.u IN (SELECT node FROM mis)
               AND e.v IN (SELECT node FROM mis)) AS BIGINT) AS n_conflict
"""


# --- node2vec biased (second-order) walks -----------------------------------

# integer penalty analogs of node2vec's 1/p (return) and 1/q
# (exploration) weights: the hash-argmin choice scales each candidate's
# hash by its class penalty, so higher-penalty classes win less often —
# a deterministic, replayable stand-in for weighted sampling. Penalties
# stay tiny so hash * pen < 2^33 and BIGINT arithmetic can never
# overflow in either engine (profiling.py discipline).
N2V_RETURN_PEN = 4   # p-analog: discourage immediate backtracking
N2V_FAR_PEN = 2      # q-analog: mildly discourage leaving prev's hood


def _n2v_trail_over(edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """The biased (walk, step, node, cls) trail over an INJECTED
    substrate — seeds carry (walk, prev, cur); the sf1-proxy scale
    probe runs this exact loop over a 10x-replicated substrate."""
    adj = edges.select(F.col("src").alias("p_adj"),
                       F.col("dst").alias("d_adj"),
                       F.lit(1).alias("is_adj"))
    state = seeds.localCheckpoint(eager=True)
    trail = state.select("walk", F.lit(0).cast("long").alias("step"),
                         F.col("cur").alias("node"),
                         F.lit(-1).cast("long").alias("cls"))
    trail = trail.localCheckpoint(eager=True)
    w = W.partitionBy("walk")
    for t in range(1, WALK_STEPS + 1):
        cand = (state.join(edges, state.cur == edges.src)
                .select("walk", "prev", "cur", "dst"))
        cand = (cand.join(
            adj, (F.col("prev") == F.col("p_adj"))
            & (F.col("dst") == F.col("d_adj")), "left")
            .select("walk", "prev", "cur", "dst", "is_adj"))
        cls = (F.when(F.col("dst") == F.col("prev"), F.lit(0))
               .when(F.col("is_adj") == 1, F.lit(1))
               .otherwise(F.lit(2)))
        pen = (F.when(cls == 0, F.lit(N2V_RETURN_PEN))
               .when(cls == 1, F.lit(1))
               .otherwise(F.lit(N2V_FAR_PEN)))
        cand = (cand.withColumn("step", F.lit(t).cast("long"))
                .withColumn("cls", cls.cast("long"))
                .withColumn("pen", pen.cast("long")))
        ranked = cand.withColumn(
            "rn", F.row_number().over(
                w.orderBy(F.expr(_WALK_HASH) * F.col("pen"),
                          F.col("dst"))))
        chosen = (ranked.filter(F.col("rn") == 1)
                  .select("walk", F.col("cur").alias("prev"),
                          F.col("dst").alias("cur"), "cls")
                  .localCheckpoint(eager=True))
        if chosen.isEmpty():
            break
        state = chosen
        trail = trail.unionByName(
            chosen.select("walk", F.lit(t).cast("long").alias("step"),
                          F.col("cur").alias("node"), "cls")
        ).localCheckpoint(eager=True)
    return trail


def q_graph_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec SECOND-ORDER biased walks — the random_walks docstring
    promises "biased variants change only the ranking expression"; this
    key makes that real. The frontier carries (walk, prev, cur); each
    candidate dst is classed node2vec-style against prev — 0: return
    (dst = prev), 1: common (a prev→dst edge exists — dst stays in
    prev's neighborhood), 2: exploration — and the seeded hash is
    scaled by the class penalty before the argmin, so returns are
    discouraged 4× and exploration 2× without losing determinism.

    Shape: vs the unbiased walk, each round adds ONE extra keyed
    left join (candidates × distinct edge set on (prev, dst) — the
    adjacency probe). Still |walks|-sized frontier per round; the
    first step has prev = -1 so every candidate is class 2 and the
    choice equals the unbiased walk's (uniform), after which the paths
    diverge (pinned by test).

    Output adds per-walk class counts (n_return/n_common/n_far) so the
    bias is LIVE in the checked values, not just in the plan."""
    verts, edges = _walk_graph(spark, sf_dir)
    seeds = (verts.filter(F.col("v") % WALK_SEED_MOD == 0)
             .select(F.col("v").alias("walk"),
                     F.lit(-1).cast("long").alias("prev"),
                     F.col("v").alias("cur")))
    trail = _n2v_trail_over(edges, seeds)
    return (trail.groupBy("walk")
            .agg(F.max("step").alias("n_steps"),
                 F.max_by("node", "step").alias("end_node"),
                 F.sum((F.col("step") + 1) * F.col("node"))
                 .alias("path_checksum"),
                 F.sum(F.when(F.col("cls") == 0, 1).otherwise(0))
                 .cast("long").alias("n_return"),
                 F.sum(F.when(F.col("cls") == 1, 1).otherwise(0))
                 .cast("long").alias("n_common"),
                 F.sum(F.when(F.col("cls") == 2, 1).otherwise(0))
                 .cast("long").alias("n_far"))
            .orderBy("walk"))


def _node2vec_cte_sql() -> str:
    """Unrolled per-step CTEs mirroring the biased walk exactly: the
    adjacency LEFT JOIN, the class CASE, and the penalty-scaled hash in
    the window ORDER BY (same constants, same tie-break)."""
    parts = [f"""
WITH verts AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
nmx AS (SELECT max(v) AS nmax FROM verts),
e AS MATERIALIZED (
  SELECT v AS src, v + 1 AS dst FROM verts
  WHERE v % {WALK_DEADEND_MOD} <> 0 AND v + 1 <= (SELECT nmax FROM nmx)
  UNION
  SELECT v, v * 2 FROM verts
  WHERE v % {WALK_DEADEND_MOD} <> 0 AND v * 2 <= (SELECT nmax FROM nmx)
  UNION
  SELECT v, v // 2 FROM verts
  WHERE v % {WALK_DEADEND_MOD} <> 0 AND v >= 2
),
n0 AS MATERIALIZED (
  SELECT v AS walk, CAST(-1 AS BIGINT) AS prev, v AS cur
  FROM verts WHERE v % {WALK_SEED_MOD} = 0
)"""]
    cls_case = ("CASE WHEN e.dst = s.prev THEN 0 "
                "WHEN a.p_adj IS NOT NULL THEN 1 ELSE 2 END")
    pen_case = (f"CASE WHEN e.dst = s.prev THEN {N2V_RETURN_PEN} "
                f"WHEN a.p_adj IS NOT NULL THEN 1 ELSE {N2V_FAR_PEN} END")
    for t in range(1, WALK_STEPS + 1):
        h1 = (f"((walk * 2654435761 + {t} * 40503 + dst * 1597334677 "
              "+ 12345) % 2147483647)")
        h = f"(({h1} * 48271 + 11) % 2147483647)"
        parts.append(f""",
n{t} AS MATERIALIZED (
  SELECT walk, cur AS prev, dst AS cur, cls FROM (
    SELECT s.walk, s.cur, e.dst, {cls_case} AS cls,
           ROW_NUMBER() OVER (PARTITION BY s.walk
                              ORDER BY {h} * ({pen_case}), e.dst) AS rn
    FROM n{t-1} s
    JOIN e ON e.src = s.cur
    LEFT JOIN (SELECT DISTINCT src AS p_adj, dst AS d_adj FROM e) a
      ON a.p_adj = s.prev AND a.d_adj = e.dst
  ) WHERE rn = 1
)""")
    unions = "\n  UNION ALL\n  ".join(
        [f"SELECT walk, CAST(0 AS BIGINT) AS step, cur AS node, "
         "CAST(-1 AS BIGINT) AS cls FROM n0"]
        + [f"SELECT walk, CAST({t} AS BIGINT) AS step, cur AS node, cls "
           f"FROM n{t}" for t in range(1, WALK_STEPS + 1)])
    parts.append(f""",
ntrail AS MATERIALIZED (
  {unions}
)""")
    return "".join(parts)


Q_GRAPH_NODE2VEC_WALKS_SQL = _node2vec_cte_sql() + """
SELECT walk,
       CAST(max(step) AS BIGINT) AS n_steps,
       CAST(max_by(node, step) AS BIGINT) AS end_node,
       CAST(sum((step + 1) * node) AS BIGINT) AS path_checksum,
       CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_return,
       CAST(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_common,
       CAST(sum(CASE WHEN cls = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_far
FROM ntrail GROUP BY walk ORDER BY walk"""


QUERIES = {
    "graph_khop_hierarchy": q_khop_hierarchy,
    "graph_khop_seeded": q_khop_seeded,
    "graph_khop_undirected": q_khop_undirected,
    "graph_connected_components": q_connected_components,
    "graph_cc_incremental": q_graph_cc_incremental,
    "graph_temporal_reachability": q_graph_temporal_reachability,
    "graph_temporal_multisource": q_graph_temporal_multisource,
    "graph_pagerank": q_pagerank,
    "graph_pagerank_personalized": q_pagerank_personalized,
    "graph_pagerank_incremental": q_graph_pagerank_incremental,
    "graph_label_propagation": q_label_propagation,
    "graph_kcore": q_graph_kcore,
    "graph_ktruss": q_graph_ktruss,
    "graph_louvain_sweeps": q_graph_louvain,
    "graph_modularity": q_graph_modularity,
    "graph_triangle_count": q_triangle_count,
    "graph_clustering_coeff": q_graph_clustering_coeff,
    "graph_shortest_paths": q_shortest_paths,
    "graph_weighted_sssp": q_weighted_sssp,
    "graph_link_prediction": q_link_prediction,
    "graph_degree_histogram": q_degree_histogram,
    "graph_hyperball": q_graph_hyperball,
    "graph_hits": q_graph_hits,
    "graph_densest_subgraph": q_graph_densest_subgraph,
    "graph_betweenness_sampled": q_graph_betweenness_sampled,
    "graph_scc": q_graph_scc,
    "graph_scc_coloring": q_graph_scc_coloring,
    "graph_mis_luby": q_graph_mis_luby,
    "graph_random_walks": q_graph_random_walks,
    "graph_node2vec_walks": q_graph_node2vec_walks,
    "graph_walk_skipgrams": q_graph_walk_skipgrams,
    "graph_scc_condensation": q_graph_scc_condensation,
    "sql_recursive_khop": q_sql_recursive_khop,
}

ORACLE = {
    "graph_khop_hierarchy": Q_KHOP_SQL,
    "graph_khop_seeded": Q_KHOP_SEEDED_SQL,
    "graph_khop_undirected": Q_KHOP_UNDIRECTED_SQL,
    "graph_connected_components": Q_CC_SQL,
    "graph_cc_incremental": Q_CC_SQL,  # IVM vs full-recompute merge-equivalence
    "graph_temporal_reachability": _temporal_oracle_sql(),  # foremost-arrival rounds unrolled
    "graph_temporal_multisource": _temporal_multisource_oracle_sql(),  # per-seed unroll
    "graph_pagerank": Q_PAGERANK_SQL,  # fixed-iteration unrolled CTE chain
    "graph_pagerank_personalized": Q_PPR_SQL,  # seeded-teleport unrolled chain
    "graph_pagerank_incremental": Q_PAGERANK_INCR_SQL,  # warm-start IVM, both phases unrolled
    "graph_label_propagation": Q_LPA_SQL,  # same unrolled-CTE trick as PageRank
    "graph_kcore": Q_KCORE_SQL,  # fixed peel rounds unrolled
    "graph_ktruss": Q_KTRUSS_SQL,  # fixed truss peel rounds unrolled
    "graph_louvain_sweeps": Q_LOUVAIN_SQL,  # sweeps unrolled, integer gain argmax
    "graph_modularity": Q_MODULARITY_SQL,  # LPA unroll + exact-integer Newman Q
    "graph_triangle_count": Q_TRIANGLE_SQL,
    "graph_clustering_coeff": Q_LCC_SQL,
    "graph_densest_subgraph": _densest_sql(),
    "graph_betweenness_sampled": Q_BETWEENNESS_SQL,  # two-phase unrolled chain
    "graph_shortest_paths": Q_SHORTEST_PATHS_SQL,
    "graph_weighted_sssp": _wsssp_oracle_sql(),  # Bellman-Ford rounds unrolled
    "graph_link_prediction": Q_LINK_PREDICTION_SQL,
    "graph_degree_histogram": Q_DEGREE_HISTOGRAM_SQL,
    "graph_hyperball": _hyperball_oracle_sql(),  # HLL ball-merge rounds unrolled
    "graph_hits": _hits_oracle_sql(),  # exact-integer mutual reinforcement
    "graph_scc": Q_GRAPH_SCC_SQL,  # mutual reach via unrolled squarings
    # hub-safe FW-BW coloring, SAME oracle verbatim: the driver checks
    # two machineries produce the identical SCC partition
    "graph_scc_coloring": Q_GRAPH_SCC_SQL,
    # hash-seeded walk steps unrolled per round, identical rank both sides
    "graph_mis_luby": Q_GRAPH_MIS_LUBY_SQL,
    "graph_random_walks": Q_GRAPH_RANDOM_WALKS_SQL,
    "graph_node2vec_walks": Q_GRAPH_NODE2VEC_WALKS_SQL,
    "graph_walk_skipgrams": Q_GRAPH_WALK_SKIPGRAMS_SQL,
    "graph_scc_condensation": Q_GRAPH_SCC_CONDENSATION_SQL,
    "sql_recursive_khop": RECURSIVE_KHOP_SQL,  # same text both engines
}
