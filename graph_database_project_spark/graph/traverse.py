"""Iterative graph algorithms as DataFrame loops (SURVEY.md §7.0/§7.2).

The reference's flagship read is a depth≤3 directed expansion
(`first-graph.py:141` — "matched node and its connected nodes up to three
levels deep in the downward direction"); Neo4j runs it as `[*1..3]`. Spark
has no recursive CTE, so traversal is a driver-side loop of joins. GraphX is
JVM/Scala-only and GraphFrames isn't assumed — this is the Pregel pattern in
pure DataFrames.

Scale discipline for every loop here:
* ``localCheckpoint(eager=True)`` per iteration — truncates lineage so plan
  size / task count stays O(1) per hop instead of O(2^hops);
* early exit on an empty/stable frontier (driver reads one count per hop —
  a scalar, not a collect of data);
* frontier is deduplicated per hop (cycle safety + keeps the join input
  minimal);
* edges are re-used across iterations; for a many-iteration algorithm the
  caller should cache/bucket the edge table on ``src`` so every hop's join
  co-locates on the same partitioning and AQE skips re-shuffling the big
  side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_hop(seeds: DataFrame, edges: DataFrame, depth: int,
          direction: str = "out") -> DataFrame:
    """Directed k-hop expansion from seed nodes.

    Parameters
    ----------
    seeds : DataFrame with columns (seed: long, node: long) — typically
        ``node == seed`` at depth 0.
    edges : DataFrame with columns (src: long, dst: long).
    depth : maximum number of hops (k). The reference contract is k=3.
    direction : 'out' follows src→dst, 'in' follows dst→src, 'both' is
        undirected.

    Returns (seed, node, depth) with depth = minimal hop distance ≤ k.
    Cycle-safe: the visited set is subtracted from each new frontier.
    """
    if direction == "in":
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        edges = edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    edges = edges.select("src", "dst")

    v0 = seeds.select("seed", "node", F.lit(0).alias("depth")).distinct() \
        .localCheckpoint(eager=True)
    # visited is kept as a UNION of per-hop checkpointed frontiers rather
    # than re-checkpointed wholesale each hop (r15): every layer is already
    # materialized, so the union is free to reference — the old
    # ``visited.union(nxt).localCheckpoint()`` re-wrote ALL visited rows
    # once per hop (O(k·|visited|) extra materialization jobs).
    layers = [v0]
    frontier = v0
    for hop in range(1, depth + 1):
        visited_keys = layers[0].select("seed", "node")
        for l in layers[1:]:
            visited_keys = visited_keys.union(l.select("seed", "node"))
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select("seed", F.col("dst").alias("node"), F.lit(hop).alias("depth"))
            .distinct()
            # min-depth semantics: drop nodes already reached at a lower depth
            .join(visited_keys, ["seed", "node"], "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        layers.append(nxt)
        frontier = nxt
    visited = layers[0]
    for l in layers[1:]:
        visited = visited.union(l)
    return visited


def connected_components(vertices: DataFrame, edges: DataFrame,
                         max_iter: int = 50) -> DataFrame:
    """Connected components by min-label propagation + pointer jumping.

    vertices: (node: long); edges: (src, dst) treated as undirected.
    Returns (node, component) where component = min node id reachable.

    Each iteration does two steps:
    1. propagate: every node adopts min(own label, neighbors' labels);
    2. shortcut (pointer jumping): component ← component[component]. A
       label is always a reachable node id, so the label's label is also
       reachable — taking it compresses chains exponentially, giving
       O(log diameter) iterations instead of O(diameter). On a path graph
       of length 1000, plain propagation needs 1000 rounds; this needs ~10.

    Stops at the exact fixpoint (no label changed); ``max_iter`` is a
    runaway guard. Per-iteration cost: two joins + a groupBy, all
    hash-partitioned on node id, so the exchanges line up across stages.
    """
    # und is loop-invariant but referenced twice per iteration; without a
    # materialization boundary its distinct() shuffle re-executes on every
    # use (measured at sf0.1: checkpoint cuts the query median ~8% and
    # halves the first-run cost). Same persist-the-invariant rule as the
    # dedup shingle relation.
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = vertices.select("node", F.col("node").alias("component"))
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # carry the PRE-iteration label through as _old so the fixpoint
        # probe below is a filter over the checkpointed output — the
        # previous formulation re-joined new labels to old labels on node
        # (a full node-keyed shuffle job per iteration just to ask "did
        # anything change"; measured at sf0.1: ~2.8 s → ~2.1 s median)
        propagated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.col("component").alias("_old"),
                F.least(F.col("component"), F.coalesce("nbr_component", "component")).alias("component"),
            )
        )
        parent = propagated.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_component"))
        new_labels = (
            propagated.join(parent, propagated.component == F.col("p_node"), "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("p_component", "component")).alias("component"),
                "_old",
            )
            .withColumn("_chg", F.col("component") != F.col("_old"))
            .drop("_old")
        ).localCheckpoint(eager=True)
        labels = new_labels.drop("_chg")
        if new_labels.filter(F.col("_chg")).isEmpty():
            break
    return labels


def label_propagation(vertices: DataFrame, edges: DataFrame,
                      n_iter: int = 10) -> DataFrame:
    """Community detection by synchronous label propagation (LPA).

    vertices: (node: long); edges: (src, dst) treated as undirected.
    Returns (node, community).

    Semantics are pinned DETERMINISTIC so a SQL oracle can unroll them:
    every round, each node adopts the most frequent label among its
    neighbors' previous-round labels PLUS ITS OWN previous label (one
    self-vote), ties broken by smallest label (classic async LPA breaks
    ties randomly — useless for differential testing); isolated nodes
    keep their label via the self-vote. The self-vote is the standard
    anti-oscillation term for SYNCHRONOUS LPA: without it, bipartite
    regions (a chain is bipartite) flip labels every round and the
    "communities" converge to parity classes — independent sets with
    ZERO intra-community edges (r06 found exactly that: the planted-chain
    partition scored modularity −0.004 with intra_pairs = 0; with the
    self-vote the same graph scores ≈0.93 — see q_graph_modularity). Runs EXACTLY
    ``n_iter`` rounds — deliberately no per-round fixpoint probe: unlike
    connected_components (where the probe IS the termination condition),
    a fixed-round loop only profits from the probe when it converges
    early, and at tiny per-round data the probe's extra Spark job per
    round dominates the loop cost (measured at sf0.1: dropping it took
    the 10-round loop from ~6 s to ~4.2 s warm; label results are
    identical because extra rounds past a fixpoint are no-ops).

    Scale: per round two keyed aggregations, both map-side combined —
    vote counts per (node, label), then the winner via ``max_by(label,
    struct(cnt, -label))`` (lexicographic struct max = most votes, tie →
    largest -label = SMALLEST label — the pinned tie-break as a single
    aggregate). The max_by form replaces an earlier row_number window:
    same semantics, but an aggregation combines map-side and never
    sorts — at 100 TB the window form would sort every node's vote list
    inside a full-width exchange each round. Same loop discipline as
    connected_components: und materialized once,
    ``localCheckpoint(eager=True)`` per round.
    """
    # und is loop-invariant — materialize once (same rule as CC/PageRank).
    # A pre-repartition on src was tried and reverted: at local scale AQE
    # coalesces the tiny exchange to a width the per-round join can't
    # reuse, so it cost a job without removing one (measured 4.2→5.1 s);
    # the cluster-scale answer is a src-bucketed edge table (SCALE.md §1).
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = vertices.select("node", F.col("node").alias("label"))
    for _ in range(n_iter):
        neighbor_votes = (
            und.join(labels, und.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        votes = (
            neighbor_votes.union(labels.select("node", "label"))  # self-vote
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = votes.groupBy("node").agg(
            F.max_by(
                "label",
                F.struct(F.col("cnt"), (-F.col("label")).alias("nl")),
            ).alias("new_label")
        )
        labels = (
            labels.join(winner, "node", "left")
            .select("node",
                    F.coalesce("new_label", "label").alias("label"))
        ).localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def k_core(vertices: DataFrame, edges: DataFrame, k: int = 3,
           n_iter: int = 10) -> DataFrame:
    """k-core decomposition by synchronous peeling: every round each node
    counts its ALIVE neighbors and survives iff that degree ≥ k; peeled
    nodes take their incident edges with them, which can cascade (a chain
    hanging off a dense core peels one node per round). Runs exactly
    ``n_iter`` rounds — fixed count so a chained-CTE SQL oracle unrolls it
    (the PageRank/LPA trick); past the fixpoint every round is a no-op,
    and no per-round convergence probe (the LPA lesson: at tiny per-round
    data the probe's extra job dominates the loop).

    vertices: (node: long); edges: (src, dst) treated as undirected.
    Returns (node, core_degree) for nodes in the k-core, with their
    degree WITHIN the core.

    Scale: per round one alive-filtered degree count — two joins against
    the (shrinking) alive set plus a map-side-combined aggregation, all
    keyed on node id; the edge relation is materialized once.
    """
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    alive = vertices.select("node").localCheckpoint(eager=True)
    surv = alive.select("node", F.lit(0).alias("core_degree"))
    for _ in range(n_iter):
        deg = (
            und.join(alive, und.src == alive.node)
            .join(alive.select(F.col("node").alias("dst")), "dst")
            .groupBy("node").agg(F.count(F.lit(1)).alias("core_degree"))
        )
        surv = deg.filter(F.col("core_degree") >= k).localCheckpoint(eager=True)
        alive = surv.select("node")
    return surv


def pagerank(vertices: DataFrame, edges: DataFrame, n_iter: int = 10,
             damping: float = 0.85,
             personalize: DataFrame | None = None,
             init_ranks: DataFrame | None = None) -> DataFrame:
    """PageRank with dangling-mass redistribution, fixed iteration count.

    vertices: (node,); edges: (src, dst) directed. Returns (node, rank)
    with ranks summing to ~N (classic formulation, rank_0 = 1.0).

    ``personalize``: optional (node, p) relation with Σp = 1 —
    PERSONALIZED PageRank (seeded teleport, the recommendation/RAG
    relevance form): teleport mass (1−d) and the dangling mass both land
    on the p distribution instead of uniformly, and rank_0 = p, so ranks
    sum to ~1 and concentrate near the seed set. The global branch is
    byte-for-byte the original expression tree (same IEEE op order) — a
    personalization hook must not perturb the 7-round-green global ranks.

    ``init_ranks``: optional (node, rank) WARM START — the IVM hook: a
    stored rank vector from a prior graph state seeds the iteration, so
    a delta batch needs only a few correction rounds instead of a cold
    restart (power iteration contracts the error by d per round from
    wherever it starts). Per-round arithmetic is byte-for-byte the cold
    branch's; only rank_0 changes. Nodes absent from init_ranks (births)
    start at 1.0, the cold value.
    """
    n = vertices.count()
    # vertices/edges/out_deg are loop-invariant but referenced in all
    # n_iter iterations — materialize once instead of re-deriving (incl.
    # the out_deg shuffle) per round. Measured at sf0.1: 3.38 s → 2.51 s
    # median, identical ranks.
    vertices = vertices.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")) \
                   .localCheckpoint(eager=True)
    if personalize is None:
        pvec = None
        if init_ranks is None:
            ranks = vertices.select("node", F.lit(1.0).alias("rank"))
        else:
            ranks = (vertices.join(init_ranks, "node", "left")
                     .select("node",
                             F.coalesce("rank", F.lit(1.0)).alias("rank"))
                     .localCheckpoint(eager=True))
    else:
        pvec = (vertices.join(personalize, "node", "left")
                .select("node", F.coalesce("p", F.lit(0.0)).alias("p"))
                .localCheckpoint(eager=True))
        ranks = pvec.select("node", F.col("p").alias("rank"))
    for _ in range(n_iter):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_deg")).alias("contrib"))
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        # dangling mass stays in the plan as a 1-row broadcast — a driver
        # .first() here would cost an extra job per iteration
        dang_sum = ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
        if pvec is None:
            dangling = dang_sum.agg(
                (F.coalesce(F.sum("rank"), F.lit(0.0)) / F.lit(float(n))).alias("_dang"))
            ranks = (
                vertices.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(1.0 - damping)
                        + F.lit(damping) * (F.coalesce("in_mass", F.lit(0.0)) + F.col("_dang"))
                    ).alias("rank"),
                )
            ).localCheckpoint(eager=True)
        else:
            # raw dangling mass (no /n): it redistributes onto p, not 1/n
            dangling = dang_sum.agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
            ranks = (
                pvec.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(1.0 - damping) * F.col("p")
                        + F.lit(damping) * (F.coalesce("in_mass", F.lit(0.0))
                                            + F.col("_dang") * F.col("p"))
                    ).alias("rank"),
                )
            ).localCheckpoint(eager=True)
    return ranks
