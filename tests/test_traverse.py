"""Unit tests for the iterative graph loops on hand-built graphs with known
answers (cycle safety, min-depth semantics, CC fixpoint, PageRank closed
form)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_project_spark.graph.traverse import (
    connected_components, k_hop, pagerank,
)

from .conftest import SF_ORACLE


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(i, i) for i in ids], "seed long, node long")


def test_khop_chain_with_cycle(spark):
    # 1→2→3→4→1 cycle plus 3→5
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (3, 5)])
    got = {
        (r.node, r.depth)
        for r in k_hop(_seeds(spark, [1]), edges, depth=3).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2), (4, 3), (5, 3)}


def test_khop_min_depth_on_diamond(spark):
    # 1→2, 1→3, 2→4, 3→4 : node 4 at depth 2, once
    edges = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    rows = k_hop(_seeds(spark, [1]), edges, depth=3).collect()
    assert sorted((r.node, r.depth) for r in rows) == [(1, 0), (2, 1), (3, 1), (4, 2)]


def test_khop_directions(spark):
    edges = _edges(spark, [(1, 2), (3, 2)])
    out_ = {r.node for r in k_hop(_seeds(spark, [2]), edges, 2, "out").collect()}
    in_ = {r.node for r in k_hop(_seeds(spark, [2]), edges, 2, "in").collect()}
    both = {r.node for r in k_hop(_seeds(spark, [2]), edges, 2, "both").collect()}
    assert out_ == {2} and in_ == {1, 2, 3} and both == {1, 2, 3}


def test_khop_empty_frontier_early_exit(spark):
    edges = _edges(spark, [(1, 2)])
    rows = k_hop(_seeds(spark, [1]), edges, depth=10).collect()
    assert len(rows) == 2  # loop stopped at hop 2, not 10


def test_connected_components_two_islands(spark):
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    # island A: 1-2-3-4 chain; island B: 5-6; singleton 7
    edges = _edges(spark, [(2, 1), (2, 3), (3, 4), (5, 6)])
    got = {(r.node, r.component) for r in connected_components(verts, edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5), (7, 7)}


def test_pagerank_ring_uniform(spark):
    # directed 4-ring: symmetric → all ranks exactly 1.0
    verts = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ranks = pagerank(verts, edges, n_iter=5).collect()
    assert all(abs(r.rank - 1.0) < 1e-9 for r in ranks)


def test_pagerank_star_center_highest(spark):
    verts = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = _edges(spark, [(i, 0) for i in range(1, 5)])  # all point at 0
    ranks = {r.node: r.rank for r in pagerank(verts, edges, n_iter=20).collect()}
    assert ranks[0] > ranks[1]
    assert abs(sum(ranks.values()) - 5.0) < 1e-6  # mass conserved


def test_ppr_mass_conserved_and_concentrates_on_seeds(spark):
    # 12-ring, one seed at node 0: ranks form a probability distribution
    # whose mass decays geometrically with distance from the seed
    n = 12
    verts = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    p = spark.createDataFrame([(0, 1.0)], "node long, p double")
    ranks = {r.node: r.rank
             for r in pagerank(verts, edges, n_iter=30,
                               personalize=p).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9       # Σp=1 conserved
    assert ranks[0] > 0.15                              # seed holds ≥ (1-d)
    # strictly decaying downstream of the seed (single out-edge ring)
    for i in range(1, n - 1):
        assert ranks[i] > ranks[i + 1]


def test_ppr_registry_query_seed_locality(spark):
    # the registered operator: seeds average ≥5x the non-seed average and
    # total mass is ~1 (the property global PR cannot have — it tends to
    # uniform on the in-degree-≤1 referral ring)
    from graph_database_project_spark.operators.graphq import (
        PPR_SEED_MOD, PPR_SEED_REM, q_pagerank_personalized)

    rows = q_pagerank_personalized(spark, SF_ORACLE).collect()
    seed = [r.rank for r in rows if r.node % PPR_SEED_MOD == PPR_SEED_REM]
    non = [r.rank for r in rows if r.node % PPR_SEED_MOD != PPR_SEED_REM]
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-3
    assert (sum(seed) / len(seed)) > 5 * (sum(non) / len(non))


def test_stress_centrality_bridge_wins(spark):
    # two 3-cliques {1,2,3} and {5,6,7} joined through bridge node 4
    # (3—4—5): every cross-clique shortest path runs through 4, so the
    # bridge strictly out-scores every other node; its clique attachment
    # points (3, 5) come second, symmetric
    from graph_database_project_spark.operators.graphq import stress_centrality

    pairs = [(1, 2), (1, 3), (2, 3), (5, 6), (5, 7), (6, 7), (3, 4), (4, 5)]
    e = spark.createDataFrame(pairs, "u long, v long")
    und = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    src = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    got = {r.node: r.stress
           for r in stress_centrality(und, src, depth=3).collect()}
    assert got[4] == max(got.values())          # bridge wins
    assert got[3] == got[5] and got[3] < got[4]  # symmetric attachments
    assert set(got) == {3, 4, 5}  # clique interiors carry no through-paths


def test_betweenness_registry_query_live_variation(spark):
    # CLAUDE.md dead-variation discipline: the sampled-stress output must
    # spread across many classes, not collapse to a constant
    from graph_database_project_spark.operators.graphq import (
        q_graph_betweenness_sampled)

    rows = q_graph_betweenness_sampled(spark, SF_ORACLE).collect()
    vals = [r.stress for r in rows]
    assert len(rows) >= 50
    assert len(set(vals)) >= 20
    assert vals == sorted(vals, reverse=True)   # total-ordered output


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: CC merges them into one
    component; LPA's majority vote must keep them as two communities
    (each clique's internal votes outnumber the single bridge vote)."""
    from graph_database_project_spark.graph.traverse import label_propagation

    clique = lambda ids: [(a, b) for a in ids for b in ids if a < b]
    edges = _edges(spark, clique([0, 1, 2, 3]) + clique([10, 11, 12, 13])
                   + [(3, 10)])
    verts = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 10, 11, 12, 13]],
                                  "node long")
    comm = {r.node: r.community
            for r in label_propagation(verts, edges, n_iter=10).collect()}
    # one label per clique, and the two cliques differ
    assert len({comm[i] for i in [0, 1, 2, 3]}) == 1
    assert len({comm[i] for i in [10, 11, 12, 13]}) == 1
    assert comm[0] != comm[10]
    cc = {r.node: r.component
          for r in connected_components(verts, edges).collect()}
    assert len(set(cc.values())) == 1  # the bridge merges the component


def test_label_propagation_refines_components(spark):
    """Structural invariant on the registered planted-community graph at
    sf0.001: labels propagate only along edges, so every LPA community
    lies inside ONE connected component (LPA refines CC), and the planted
    bridges force strictly more communities than components."""
    from graph_database_project_spark.operators.graphq import (
        _lpa_graph, q_label_propagation)
    from graph_database_project_spark.graph.traverse import (
        connected_components)
    from .conftest import SF_SMOKE

    lpa = q_label_propagation(spark, SF_SMOKE)

    # SAME builder the registered query uses — no copy-paste drift
    verts, edges = _lpa_graph(spark, SF_SMOKE)
    cc = connected_components(verts, edges)

    joined = lpa.join(cc, "node")
    # refinement: a community never spans two components
    spans = (joined.groupBy("community")
             .agg(F.countDistinct("component").alias("nc"))
             .filter(F.col("nc") > 1))
    assert spans.isEmpty()
    n_comm = joined.select("community").distinct().count()
    n_comp = joined.select("component").distinct().count()
    assert n_comm > n_comp, (n_comm, n_comp)


def test_k_core_peels_tail_keeps_clique(spark):
    """4-clique with a 3-node chain tail: the 3-core is exactly the
    clique (tail peels one node per round, including the cascade through
    the attachment node), and every survivor reports its in-core
    degree."""
    from graph_database_project_spark.graph.traverse import k_core

    clique = [(a, b) for a in [0, 1, 2, 3] for b in [0, 1, 2, 3] if a < b]
    edges = _edges(spark, clique + [(3, 10), (10, 11), (11, 12)])
    verts = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 10, 11, 12]], "node long")
    got = {r.node: r.core_degree
           for r in k_core(verts, edges, k=3, n_iter=10).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_supp_base_disjoint_from_partkeys(spark):
    """The bipartite part↔supplier graphs (shortest_paths, weighted SSSP)
    shift supplier ids by _SUPP_BASE and CLAIM the spaces are disjoint —
    check it against the data instead of assuming (TPC-H partkey =
    200,000 × sf would have crossed the old 1e6 base at sf≥5; r05
    ADVICE). sf-agnostic: runs on whatever SF the parity gate uses."""
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.graphq import _SUPP_BASE

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    mx = li.agg(F.max("l_partkey")).first()[0]
    assert mx < _SUPP_BASE, (mx, _SUPP_BASE)
    # and the SF margin itself: the base covers any plausible scale run
    assert _SUPP_BASE >= (1 << 40)


def test_modularity_closed_form_two_bridged_triangles(spark):
    """Newman modularity on the textbook hand graph — two triangles
    joined by one bridge edge, partitioned into the two triangles:
    m = 7, intra = 6, degrees (2,2,3 | 3,2,2) → Q = (14·12 − 98)/14²
    = 70/196 = 5/14 exactly. The operator must reproduce the closed form
    bit-exactly (its arithmetic is all-integer until one final IEEE
    division)."""
    from graph_database_project_spark.operators.graphq import modularity_score

    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = _edges(spark, tri)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "node long, community long")
    row = modularity_score(labels, edges).first()
    assert row.m_edges == 7 and row.intra_pairs == 12 and row.sum_deg_sq == 98
    assert row.modularity == 70 / 196
    assert row.n_communities == 2 and row.largest_community == 3


# --- HyperBall + HITS over the synthetic digraph -----------------------------

def test_hyperball_estimates_track_exact_ball_sizes(spark):
    """Semantic accuracy the bit-exact oracle can't see: apply the
    standard linear-counting correction m·ln(m/V) (Python-side — ln is
    libm, deliberately outside the oracle-checked output) to the reported
    zero_regs and compare against EXACT |B(v, 3)| computed by iterated
    distinct expansion. Per-node HLL error at m=64 is ~13%; assert a
    loose 40% per-node band and a 15% band on the mean."""
    import math

    from graph_database_project_spark.operators.graphq import (
        HB_ROUNDS, _synth_digraph, q_graph_hyperball)
    from graph_database_project_spark.operators.profiling import HLL_M

    got = {r.node: r for r in
           q_graph_hyperball(spark, SF_ORACLE).collect()}
    assert len(got) == 20

    verts, edges, _ = _synth_digraph(spark, SF_ORACLE)
    edges = edges.localCheckpoint(eager=True)
    ball = verts.select(F.col("node").alias("root"),
                        F.col("node").alias("m"))
    for _ in range(HB_ROUNDS):
        grown = (ball.join(edges, ball["m"] == edges["src"])
                 .select("root", F.col("dst").alias("m")))
        ball = ball.union(grown).distinct().localCheckpoint(eager=True)
    exact = {r.root: r.sz for r in
             ball.groupBy("root").agg(F.count(F.lit(1)).alias("sz"))
             .collect()}

    rel_errs = []
    for node, r in got.items():
        v = r.zero_regs
        assert 0 < v <= HLL_M
        est_lc = HLL_M * math.log(HLL_M / v)
        rel = (est_lc - exact[node]) / exact[node]
        rel_errs.append(rel)
        assert abs(rel) <= 0.40, (node, est_lc, exact[node])
    assert abs(sum(rel_errs) / len(rel_errs)) <= 0.15

    # monotone balls: est milli must not shrink round over round
    for r in got.values():
        assert r.est1_milli <= r.est2_milli <= r.est3_milli


def test_hits_integer_invariants(spark):
    """Exact integer cross-checks: with a0=1, round-1 hubs equal
    out-degree; the top-20 output carries scores consistent with a full
    recomputation of Σ auth (edge-sum conservation: Σ_v h1(v) = |E|)."""
    from graph_database_project_spark.operators.graphq import (
        _synth_digraph, q_graph_hits)

    verts, edges, _ = _synth_digraph(spark, SF_ORACLE)
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    out_deg = {r.src: r.d for r in
               edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
               .collect()}
    # out-degree is 1..3 by construction (three residue-gated families,
    # minus self-loops/collisions)
    assert set(out_deg.values()) <= {1, 2, 3}
    assert sum(out_deg.values()) == n_edges

    rows = q_graph_hits(spark, SF_ORACLE).collect()
    assert len(rows) == 20
    assert all(r.hub_score >= 0 and r.auth_score > 0 for r in rows)
    # descending by auth, node-tiebreak ascending
    auths = [(r.auth_score, r.node) for r in rows]
    assert auths == sorted(auths, key=lambda t: (-t[0], t[1]))


def test_cc_incremental_equals_full_recompute_and_contracts(spark):
    """IVM contract in-engine (the oracle checks it against DuckDB too):
    incremental labels == full recompute over base∪delta, and the delta
    pass's component-level graph is a CONTRACTION — orders smaller than
    |V| (the whole point; a regression that feeds raw nodes into the
    delta loop fails the pin)."""
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.graphq import (
        q_graph_cc_incremental)

    cust = load_table(spark, SF_ORACLE, "customer")
    a = cust.select(F.col("c_custkey").alias("u"), "c_nationkey")
    b = cust.select(F.col("c_custkey").alias("v"),
                    F.col("c_nationkey").alias("vn"))
    edges = (a.join(b, (b.v == a.u + 1) & (a.c_nationkey == b.vn))
             .select(F.col("u").cast("long").alias("src"),
                     F.col("v").cast("long").alias("dst")))
    verts = cust.select(F.col("c_custkey").cast("long").alias("node"))
    full = {(r.node, r.component) for r in
            connected_components(verts, edges).collect()}
    inc = {(r.node, r.component) for r in
           q_graph_cc_incremental(spark, SF_ORACLE).collect()}
    assert inc == full

    n_nodes = verts.count()
    n_delta = edges.filter(F.col("src") % 7 == 0).count()
    assert 0 < n_delta < n_nodes / 3  # the delta is a real, small batch


def test_pagerank_incremental_warm_start_converges_faster(spark):
    """The IVM value proposition, machine-checked: warm-starting the
    correction rounds from the stored base-graph ranks lands closer to
    the converged full-graph fixed point than a COLD start with the same
    round budget, and lands within a real tolerance of it — i.e. the
    stored state buys convergence, it isn't just recomputation."""
    from graph_database_project_spark.operators.graphq import (
        PR_CORR_ROUNDS, _pr_incr_graphs, q_graph_pagerank_incremental)

    sf = "/root/testdata/sf0.001"
    verts, base_e, full_e = _pr_incr_graphs(spark, sf)
    n = verts.count()
    converged = {r.node: r.rank
                 for r in pagerank(verts, full_e, n_iter=40).collect()}
    cold = {r.node: r.rank
            for r in pagerank(verts, full_e,
                              n_iter=PR_CORR_ROUNDS).collect()}
    incr = {r.node: r.rank
            for r in q_graph_pagerank_incremental(spark, sf).collect()}
    err_cold = max(abs(cold[k] - converged[k]) for k in converged)
    err_incr = max(abs(incr[k] - converged[k]) for k in converged)
    l1_cold = sum(abs(cold[k] - converged[k]) for k in converged)
    l1_incr = sum(abs(incr[k] - converged[k]) for k in converged)
    assert err_incr < err_cold / 2  # warm start clearly beats cold start
    assert l1_incr < l1_cold / 5    # and by a wide margin in total mass

    # dead-variation guards: the funnel's fixed point is FAR from the
    # uniform cold vector (the permutation-ring trap: on a ring, uniform
    # cold start IS the fixed point and the IVM story is vacuous), and
    # the delta is a real, small additive batch
    assert err_cold > 0.5
    n_delta = full_e.count() - base_e.count()
    assert 0 < n_delta < n / 3

    # float-safety structural guards (the r11 advice fix): the dangling
    # set is {node 0} in BOTH phases (its funnel edge 0→0 self-loops
    # away and 0 is excluded from shortcut sources — a ONE-term,
    # order-free sum), and no node's in-mass fold ever exceeds two
    # terms in either phase
    for e in (base_e, full_e):
        dangling = verts.join(e, verts.node == e.src, "left_anti")
        assert [r.node for r in dangling.collect()] == [0]
    max_indeg = (full_e.groupBy("dst").count()
                 .agg(F.max("count").alias("m")).first().m)
    assert max_indeg <= 2


def test_clustering_coeff_closed_form_classes(spark):
    """Closed-form expectations on the planted structure: interior
    full-clique nodes have lcc exactly 1.0 (deg 9, 36 triangles); pure
    bridge endpoints have deg 10 with the same 36 triangles → lcc
    floor-ppm 800000; every reported class satisfies the identity
    lcc_ppm = 2e6·tri/(deg·(deg−1)) for SOME integer triangle count (the
    ppm must be realizable, not arbitrary)."""
    from graph_database_project_spark.operators.graphq import (
        q_graph_clustering_coeff)

    rows = q_graph_clustering_coeff(spark, SF_ORACLE).collect()
    classes = {(r.deg, r.lcc_ppm): r.n_nodes for r in rows}
    assert classes.get((9, 1_000_000), 0) > 1000   # clique interiors dominate
    assert (10, 800_000) in classes                # bridge endpoints
    for (deg, ppm), n in classes.items():
        assert n > 0
        realizable = {t * 2_000_000 // (deg * (deg - 1))
                      for t in range(deg * (deg - 1) // 2 + 1)}
        assert ppm in realizable, (deg, ppm)


def test_temporal_reachability_respects_time_and_is_subset_of_static(spark):
    """Semantic contracts the bit-exact oracle can't see: (a) every
    first_reach is at or after the seed's own first presence (time flows
    forward); (b) the temporally-reached set is a SUBSET of static 3-hop
    reach over the same contact edges (ignoring timestamps) — the
    constraint is the operator."""
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.graphq import (
        TEMPORAL_HOPS, TEMPORAL_SEED, q_graph_temporal_reachability)

    rows = q_graph_temporal_reachability(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= 30
    seed_start = min(r.first_reach for r in rows
                     if r.user_id == TEMPORAL_SEED)
    assert all(r.first_reach >= seed_start for r in rows)

    ev = (load_table(spark, SF_ORACLE, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()))
    pres = ev.select(F.col("user_id").cast("long").alias("u"),
                     "event_type",
                     F.date_trunc("hour", F.col("ts")).alias("h")).distinct()
    a = pres.select(F.col("u").alias("src"), "event_type", "h")
    b = pres.select(F.col("u").alias("dst"),
                    F.col("event_type").alias("t2"), F.col("h").alias("h2"))
    edges = (a.join(b, (F.col("event_type") == F.col("t2"))
                    & (F.col("h") == F.col("h2"))
                    & (F.col("src") != F.col("dst")))
             .select("src", "dst").distinct().localCheckpoint(eager=True))
    static = {TEMPORAL_SEED}
    frontier = static
    for _ in range(TEMPORAL_HOPS):
        nxt = {r.dst for r in edges.filter(
            F.col("src").isin(list(frontier))).select("dst").collect()}
        frontier = nxt - static
        static |= nxt
        if not frontier:
            break
    assert {r.user_id for r in rows} <= static


def test_temporal_seeds_present_and_relaxation_live(spark):
    """r07 ADVICE: TEMPORAL_SEED's every-sf presence was asserted only in a
    comment — if a future corpus drops the seed user, the query degrades to
    a single (seed, NULL) row that still matches the oracle (dead
    variation). Fail loudly instead: every seed (single- and multi-source)
    must have presence rows at both sf dirs, and the relaxed state must
    reach beyond the seeds themselves."""
    from .conftest import SF_SMOKE
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.graphq import (
        TEMPORAL_SEED, TEMPORAL_SEEDS, q_graph_temporal_reachability)

    for sf in (SF_SMOKE, SF_ORACLE):
        present = {r.u for r in load_table(spark, sf, "events")
                   .filter(F.col("user_id").isNotNull()
                           & F.col("ts").isNotNull()
                           & F.col("event_type").isNotNull())
                   .select(F.col("user_id").cast("long").alias("u"))
                   .distinct().collect()}
        assert TEMPORAL_SEED in present, sf
        assert set(TEMPORAL_SEEDS) <= present, sf
    rows = q_graph_temporal_reachability(spark, SF_ORACLE).collect()
    assert len(rows) > 1, "no relaxation round fired — dead variation"


def test_temporal_multisource_slices_match_single_source(spark):
    """Seedwise-independence contract of the multi-source generalization:
    each seed's slice is a self-contained foremost-arrival run — ranks are
    dense from 1, the seed reaches itself at the slice minimum, and the
    TEMPORAL_SEED slice must be EXACTLY the single-source operator's
    output truncated to the per-seed cap (same state, same total order)."""
    from graph_database_project_spark.operators.graphq import (
        TEMPORAL_MS_TOP_N, TEMPORAL_SEED, TEMPORAL_SEEDS,
        q_graph_temporal_multisource, q_graph_temporal_reachability)

    ms = q_graph_temporal_multisource(spark, SF_ORACLE).collect()
    by_seed: dict[int, list] = {}
    for r in ms:
        by_seed.setdefault(r.seed, []).append(r)
    assert set(by_seed) == set(TEMPORAL_SEEDS)
    for s, rows in by_seed.items():
        assert [r.reach_rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) > 1, f"seed {s}: relaxation never fired"
        own = [r for r in rows if r.user_id == s]
        assert own and own[0].first_reach == min(r.first_reach for r in rows)
    assert TEMPORAL_SEED in TEMPORAL_SEEDS
    single = q_graph_temporal_reachability(spark, SF_ORACLE).collect()
    exp = [(r.user_id, r.first_reach) for r in single[:TEMPORAL_MS_TOP_N]]
    got = [(r.user_id, r.first_reach) for r in by_seed[TEMPORAL_SEED]]
    assert got == exp


def test_densest_subgraph_peel_monotone_and_clique_peak(spark):
    """Peel contracts the bit-exact oracle can't see: (a) every round
    strictly shrinks the survivor set (a min-degree node never beats the
    (1+eps)-avg threshold, integer floor included); (b) density at the
    flagged peak is >= the full graph's (peeling never has to accept a
    worse answer than round 0); (c) the peak reaches at least the planted
    10-clique density (avg degree 9) - the dense core the sparse chain
    fringe must not dilute; (d) exactly one flagged row, earliest on
    ties."""
    from graph_database_project_spark.operators.graphq import (
        q_graph_densest_subgraph)

    rows = q_graph_densest_subgraph(spark, SF_ORACLE).collect()
    assert rows and rows[0].round == 0
    sizes = [r.n_nodes for r in rows]
    assert all(a > b for a, b in zip(sizes, sizes[1:])), sizes
    flagged = [r for r in rows if r.is_peak]
    assert len(flagged) == 1
    peak = flagged[0]
    assert peak.avg_deg_ppm == max(r.avg_deg_ppm for r in rows)
    assert peak.round == min(r.round for r in rows
                             if r.avg_deg_ppm == peak.avg_deg_ppm)
    assert peak.avg_deg_ppm >= rows[0].avg_deg_ppm
    assert peak.avg_deg_ppm >= 9_000_000, peak
    # density contrast actually exercised: round 0 is diluted by chains
    assert rows[0].avg_deg_ppm < peak.avg_deg_ppm


def test_ktruss_planted_structure_and_fixpoint(spark):
    """The three planted behaviors actually exercise the peel (CLAUDE.md
    dead-variation rule): the chain dies in round 1, the triangle strip
    survives round 1 then cascades away in round 2 (the multi-round
    semantics that distinguish truss from one-shot triangle filtering),
    and the final rounds equal an INDEPENDENT per-block clique count —
    with round R == round R-1 proving the fixed-round output reached the
    true k-truss fixpoint."""
    from math import comb

    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.graphq import (
        TRUSS_ROUNDS, q_graph_ktruss)

    rows = {r["round"]: (r.n_edges, r.n_tri)
            for r in q_graph_ktruss(spark, SF_ORACLE).collect()}
    assert set(rows) == set(range(TRUSS_ROUNDS + 1))

    # independent ground truth: the k=4 truss of the substrate is exactly
    # the per-block cliques (positions 0-5); count them from raw keys
    keys = [r.u for r in load_table(spark, SF_ORACLE, "customer")
            .select(F.col("c_custkey").alias("u")).collect()]
    per_block: dict[int, int] = {}
    for u in keys:
        if u % 20 < 6:
            per_block[u // 20] = per_block.get(u // 20, 0) + 1
    clique_edges = sum(comb(n, 2) for n in per_block.values())
    clique_tris = sum(comb(n, 3) for n in per_block.values())

    assert rows[TRUSS_ROUNDS] == (clique_edges, clique_tris)
    assert rows[TRUSS_ROUNDS] == rows[TRUSS_ROUNDS - 1]  # fixpoint reached
    # two REAL peel rounds: chain+ends die r1, strip cascade dies r2
    assert rows[0][0] > rows[1][0] > rows[2][0] == clique_edges
    assert rows[1][0] > clique_edges  # strip interior alive after round 1


def test_louvain_recovers_planted_cliques(spark):
    """Objective-quality contract the oracle can't see: from singletons
    (Q < 0 by construction) the greedy sweeps must fully recover the
    planted 10-clique partition — exactly |V|/10 communities of size 10
    and modularity within the clique-partition ballpark (> 0.9) — i.e.
    the alternating-half synchronous moves actually climb Q instead of
    oscillating."""
    from graph_database_project_spark.operators.graphq import (
        q_graph_louvain)

    row = q_graph_louvain(spark, SF_ORACLE).collect()[0]
    assert row.n_communities == row.n_nodes // 10
    assert row.largest_community == 10
    assert row.modularity > 0.9
    # singleton baseline is strictly negative: intra_pairs = 0 ⇒
    # Q = -Σdeg²/U² — any positive Q proves real moves happened
    assert row.intra_pairs > 0


def test_scc_planted_structure_and_oneway_bridges(spark):
    """The SCC detector against the planted truth: closed blocks are
    10-node SCCs, open chains are singletons (the size variation), and
    the forward-only bridges exist but never merge components — the
    exact failure a CC/min-flood would commit on a directed graph."""
    from graph_database_project_spark.operators.graphq import (
        _scc_graph, q_graph_scc)

    sf = "/root/testdata/sf0.001"
    verts, edges = _scc_graph(spark, sf)
    n = verts.count()
    assert n % 10 == 0
    blocks = n // 10
    closed = [b for b in range(blocks) if b % 3 != 0]
    opened = [b for b in range(blocks) if b % 3 == 0]

    rows = {r.scc_size: (r.n_sccs, r.label_checksum)
            for r in q_graph_scc(spark, sf).collect()}
    assert set(rows) == {1, 10}          # both planted classes present
    assert rows[10] == (len(closed), sum(10 * b for b in closed))
    assert rows[1] == (10 * len(opened),
                       sum(k for b in opened
                           for k in range(10 * b, 10 * b + 10)))

    # the bridges are live (cross-block edges exist) yet did not merge:
    # every 10-SCC is exactly one closed block, counted above
    nb = edges.filter((F.col("src") % 10 == 9)
                      & (F.col("dst") == F.col("src") + 1)).count()
    assert nb > 0


def test_scc_condensation_levels_match_planted_structure(spark):
    """Longest-path levels over the condensation DAG, checked against
    the substrate arithmetic: open blocks spread their chain across
    levels (tail at 9), a bridge lifts its target one past the source's
    last node, and the ONLY level-10 occupants are (a) closed blocks
    bridged from an open chain's tail (source block ≡ 0 mod 21 — its
    successor ≡ 1 mod 3 is always closed) and (b) at larger sf, chain
    tails of open blocks bridged from closed sources. At sf0.001
    (blocks 0..14) only case (a) with b=0 exists: one 10-node SCC."""
    from graph_database_project_spark.operators.graphq import (
        q_graph_scc_condensation)

    rows = {r.level: (r.n_sccs, r.n_nodes)
            for r in q_graph_scc_condensation(
                spark, "/root/testdata/sf0.001").collect()}
    assert max(rows) == 10                 # the relax bound is tight
    assert rows[10] == (1, 10)             # block 1, bridged from b=0
    # levels 2..9 hold exactly the open-block chain interiors: one
    # singleton per open block per level (5 open blocks at sf0.001)
    for lv in range(2, 10):
        assert rows[lv] == (5, 5)
    # level 0 holds every unbridged closed block + chain heads
    assert rows[0][1] > rows[0][0]         # multi-node SCCs present


def test_scc_coloring_matches_squaring_partition(spark):
    """r12 (verdict #6): the hub-safe FW-BW coloring and the
    repeated-squaring labeling must produce the IDENTICAL partition
    (node -> min-member label), not just equal histograms."""
    from graph_database_project_spark.operators.graphq import (
        _scc_graph, _scc_labels, _scc_labels_coloring)

    sf = "/root/testdata/sf0.001"
    verts, edges = _scc_graph(spark, sf)
    a = {r.a: r.scc for r in _scc_labels(verts, edges).collect()}
    b = {r.a: r.scc for r in _scc_labels_coloring(verts, edges).collect()}
    assert a == b
    assert len(a) == verts.count()


def test_scc_coloring_planted_hub(spark):
    """The substrate the squaring form is documented WRONG-SHAPED for
    (SCALE.md §7g): one hub mutually linked to every spoke makes the
    reach relation |V|^2-sized, while coloring stays |E|-shaped. Plant
    hub+spokes (one giant SCC) plus a one-way ring of singletons
    hanging off it; assert exact sizes and that the one-way tail is NOT
    merged. At this test scale the squaring form can still grind
    through the quadratic relation, so it cross-checks the partition."""
    from pyspark.sql import functions as F
    from graph_database_project_spark.operators.graphq import (
        _scc_labels, _scc_labels_coloring)

    n_spokes = 200
    hub = 0
    rows = []
    for s in range(1, n_spokes + 1):
        rows.append((hub, s))
        rows.append((s, hub))
    # one-way tail: hub -> t1 -> t2 -> t3 (never back) — singletons
    rows += [(hub, 1001), (1001, 1002), (1002, 1003)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    verts = (edges.select(F.col("src").alias("v"))
             .unionByName(edges.select(F.col("dst").alias("v")))
             .distinct())
    lab = {r.a: r.scc for r in
           _scc_labels_coloring(verts, edges).collect()}
    # hub + all spokes share one SCC labeled by the min member (hub=0)
    assert lab[hub] == 0
    assert all(lab[s] == 0 for s in range(1, n_spokes + 1))
    # the one-way tail stays singleton
    assert lab[1001] == 1001 and lab[1002] == 1002 and lab[1003] == 1003
    ref = {r.a: r.scc for r in _scc_labels(verts, edges).collect()}
    assert lab == ref


def test_scc_coloring_fails_loud_on_bound_exhaustion(spark):
    """Non-convergence raises instead of silently mislabeling (the
    verdict's fail-loud requirement): a 12-node one-way ring (one SCC,
    diameter 11) cannot finish its forward flood in 3 rounds."""
    import pytest
    from pyspark.sql import functions as F
    from graph_database_project_spark.operators.graphq import (
        _scc_labels_coloring)

    n = 12
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long")
    verts = edges.select(F.col("src").alias("v")).distinct()
    with pytest.raises(RuntimeError, match="did not converge"):
        _scc_labels_coloring(verts, edges, max_flood=3)


def test_random_walks_match_pure_python_replay(spark):
    """Third machinery for the r12 walk sampler: rebuild the substrate
    and replay every walk in pure Python (dict adjacency + the same
    hash), then compare (n_steps, end_node, path_checksum) per walk."""
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.graphq import (
        WALK_DEADEND_MOD, WALK_SEED_MOD, WALK_STEPS, q_graph_random_walks)

    sf = "/root/testdata/sf0.001"
    keys = [r[0] for r in load_table(spark, sf, "customer")
            .select("c_custkey").collect()]
    nmax = max(keys)
    adj: dict[int, list[int]] = {}
    for v in keys:
        if v % WALK_DEADEND_MOD == 0:
            continue
        outs = set()
        if v + 1 <= nmax:
            outs.add(v + 1)
        if v * 2 <= nmax:
            outs.add(v * 2)
        if v >= 2:
            outs.add(v // 2)
        adj[v] = sorted(outs)

    def h(walk, step, dst):
        x = (walk * 2654435761 + step * 40503 + dst * 1597334677
             + 12345) % 2147483647
        return (x * 48271 + 11) % 2147483647

    expect = {}
    for seed in (v for v in keys if v % WALK_SEED_MOD == 0):
        cur, checksum, steps = seed, seed, 0
        for t in range(1, WALK_STEPS + 1):
            outs = adj.get(cur, [])
            if not outs:
                break
            cur = min(outs, key=lambda d: (h(seed, t, d), d))
            steps, checksum = t, checksum + (t + 1) * cur
        expect[seed] = (steps, cur, checksum)

    got = {r.walk: (r.n_steps, r.end_node, r.path_checksum)
           for r in q_graph_random_walks(spark, sf).collect()}
    assert got == expect
    # dead-variation rule: lengths vary (dead-ends are live)
    assert len({v[0] for v in got.values()}) > 1


def test_walk_skipgrams_match_pure_python_replay(spark):
    """Replay the skip-gram expansion + negative sampler in pure Python
    over the replayed trails (shares the walk-replay machinery above)."""
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.graphq import (
        WALK_DEADEND_MOD, WALK_SEED_MOD, WALK_STEPS, WALK_WINDOW,
        q_graph_walk_skipgrams)

    sf = "/root/testdata/sf0.001"
    keys = [r[0] for r in load_table(spark, sf, "customer")
            .select("c_custkey").collect()]
    nmax = max(keys)
    adj = {}
    for v in keys:
        if v % WALK_DEADEND_MOD == 0:
            continue
        outs = {x for x in (v + 1, v * 2, v // 2)
                if 1 <= x <= nmax and x != v}
        adj[v] = sorted(outs)

    def h(walk, step, dst):
        x = (walk * 2654435761 + step * 40503 + dst * 1597334677
             + 12345) % 2147483647
        return (x * 48271 + 11) % 2147483647

    trails = []
    for seed in (v for v in keys if v % WALK_SEED_MOD == 0):
        path, cur = [seed], seed
        for t in range(1, WALK_STEPS + 1):
            outs = adj.get(cur, [])
            if not outs:
                break
            cur = min(outs, key=lambda d: (h(seed, t, d), d))
            path.append(cur)
        trails.append(path)

    import collections
    pos = collections.defaultdict(lambda: [0, set(), 0])
    neg_stats = [0, set(), 0]
    for path in trails:
        for i, c in enumerate(path):
            for j, x in enumerate(path):
                d = abs(j - i)
                if not (1 <= d <= WALK_WINDOW):
                    continue
                st = pos[d]
                st[0] += 1
                st[1].add(c * 4_000_000_000 + x)
                st[2] += c + 131 * x
                hn = (c * 2654435761 + x * 1597334677 + d * 40503
                      + 999331) % 2147483647
                neg = ((hn * 48271 + 11) % 2147483647) % nmax + 1
                neg_stats[0] += 1
                neg_stats[1].add(c * 4_000_000_000 + neg)
                neg_stats[2] += c + 131 * neg

    got = {(r.kind, r.dist): (r.n_pairs, r.n_distinct, r.checksum)
           for r in q_graph_walk_skipgrams(spark, sf).collect()}
    for d, st in pos.items():
        assert got[("pos", d)] == (st[0], len(st[1]), st[2])
    assert got[("neg", 0)] == (neg_stats[0], len(neg_stats[1]),
                               neg_stats[2])


def test_node2vec_walks_match_pure_python_replay(spark):
    """Third machinery for the r12b biased sampler: replay the
    second-order walk in pure Python (adjacency dict + class penalties
    + the same hash) and compare the full per-walk summary including
    the class counts; also pin that the bias actually diverges from the
    unbiased walk and that every class is chosen somewhere."""
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.graphq import (
        N2V_FAR_PEN, N2V_RETURN_PEN, WALK_DEADEND_MOD, WALK_SEED_MOD,
        WALK_STEPS, q_graph_node2vec_walks, q_graph_random_walks)

    sf = "/root/testdata/sf0.001"
    keys = [r[0] for r in load_table(spark, sf, "customer")
            .select("c_custkey").collect()]
    nmax = max(keys)
    adj: dict[int, list[int]] = {}
    for v in keys:
        if v % WALK_DEADEND_MOD == 0:
            continue
        outs = set()
        if v + 1 <= nmax:
            outs.add(v + 1)
        if v * 2 <= nmax:
            outs.add(v * 2)
        if v >= 2:
            outs.add(v // 2)
        adj[v] = sorted(outs)

    def h(walk, step, dst):
        x = (walk * 2654435761 + step * 40503 + dst * 1597334677
             + 12345) % 2147483647
        return (x * 48271 + 11) % 2147483647

    def cls_of(prev, dst):
        if dst == prev:
            return 0
        if dst in adj.get(prev, []):
            return 1
        return 2

    pen = {0: N2V_RETURN_PEN, 1: 1, 2: N2V_FAR_PEN}
    expect = {}
    for seed in (v for v in keys if v % WALK_SEED_MOD == 0):
        prev, cur, checksum, steps = -1, seed, seed, 0
        counts = [0, 0, 0]
        for t in range(1, WALK_STEPS + 1):
            outs = adj.get(cur, [])
            if not outs:
                break
            best = min(outs, key=lambda d: (
                h(seed, t, d) * pen[cls_of(prev, d)], d))
            counts[cls_of(prev, best)] += 1
            prev, cur = cur, best
            steps, checksum = t, checksum + (t + 1) * cur
        expect[seed] = (steps, cur, checksum,
                        counts[0], counts[1], counts[2])

    got = {r.walk: (r.n_steps, r.end_node, r.path_checksum,
                    r.n_return, r.n_common, r.n_far)
           for r in q_graph_node2vec_walks(spark, sf).collect()}
    assert got == expect
    # every bias class is chosen somewhere (live variation)
    totals = [sum(v[3] for v in got.values()),
              sum(v[4] for v in got.values()),
              sum(v[5] for v in got.values())]
    assert all(t > 0 for t in totals), totals
    # the bias changes real choices vs the unbiased sampler
    un = {r.walk: r.path_checksum
          for r in q_graph_random_walks(spark, sf).collect()}
    assert any(un[wk] != v[2] for wk, v in got.items())


def test_mis_luby_matches_pure_python_replay(spark):
    """Third machinery for the r12b MIS: replay Luby's priority rounds
    in pure Python over the same substrate, verify independence AND
    maximality structurally, and compare the full summary row."""
    from graph_database_project_spark.operators.graphq import (
        MIS_ROUNDS, _lcc_union_edges, q_graph_mis_luby)

    sf = "/root/testdata/sf0.001"
    und_edges = {(r.u, r.v) for r in
                 _lcc_union_edges(spark, sf).collect()}
    adj: dict[int, set[int]] = {}
    for u, v in und_edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def pri(v):
        h = (((v * 2654435761 + 777) % 2147483647) * 48271 + 11) \
            % 2147483647
        return h * 2147483648 + v

    und = set(adj)
    mis: set[int] = set()
    for _ in range(MIS_ROUNDS):
        winners = {v for v in und
                   if all(pri(v) < pri(u) for u in adj[v] if u in und)}
        mis |= winners
        excl = {u for w in winners for u in adj[w]}
        und -= winners | excl
        if not und:
            break

    # structural invariants, independently of the engine
    assert all(not (mis & adj[v]) for v in mis)          # independence
    assert all(v in mis or (mis & adj[v]) or v in und
               for v in adj)                              # maximality
    row = q_graph_mis_luby(spark, sf).collect()[0]
    assert (row.n_mis, row.mis_checksum, row.min_mis, row.max_mis,
            row.n_undecided, row.n_conflict) == \
        (len(mis), sum(mis), min(mis), max(mis), len(und), 0)
    assert len(mis) > 10  # the substrate actually exercises the rounds
