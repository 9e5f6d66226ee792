#!/usr/bin/env python
"""Regenerate PLANS.md: a compact physical-plan audit of the bench headline
queries. Counts use the formatted explain's detail-section headers
(`(N) <Op>`) so operators aren't double-counted between the tree and the
detail list; shuffles = Exchange blocks with hashpartitioning arguments
(broadcasts say SinglePartition, presentation sorts rangepartitioning).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.registry import all_queries
    import bench

    spark = get_spark("plan-report")
    jvm = spark._jvm
    qs = all_queries()
    rows = []
    # bench headline + the r04-promoted operators whose plans carry scale
    # arguments (streaming drains can't be explained post-hoc, so the
    # stream_* shapes are audited in tests/test_streaming.py instead)
    extra = ["graph_pagerank", "multimodal_resize", "multimodal_frame_sample",
             "agg_approx_distinct", "xml_khop_flagship", "sim_ivf_topk",
             # r05 additions: mergeable-state + ANN + graph operators
             "ts_rollup_incremental", "heavy_hitters_cms", "cardinality_hll",
             "graph_label_propagation", "quantile_sketch_merge",
             "sim_ivfpq_topk", "graph_kcore",
             # r05 second batch: retrieval + runtime-filter + association
             "text_bm25_search", "join_bloom_prune", "text_cooccur_pmi",
             "graph_weighted_sssp", "semantic_decontaminate",
             "mutation_scd2_pit_join",
             # r06 additions: scoring + reduction operators
             "graph_modularity", "ts_lttb_downsample", "embedding_mrl_audit",
             "cardinality_hll_grouped", "text_chunk_windows", "dedup_chunk_level",
             # r07 additions: centrality + keyed quantile sketch
             "graph_hyperball", "graph_hits", "quantile_sketch_grouped",
             "theta_sketch_setops", "dedup_prefix_filter", "graph_cc_incremental",
             "drift_histogram_tv", "graph_clustering_coeff",
             "heavy_hitters_cms_grouped", "graph_temporal_reachability",
             "ts_markov_transitions",
             # r08 additions: retrieval fusion, basket/skyline/CUSUM/BPE,
             # densest subgraph, multi-source temporal
             "text_hybrid_rrf", "graph_temporal_multisource",
             "assoc_basket_rules", "skyline_pareto", "ts_cusum_changepoint",
             "bpe_learn_merges", "bpe_token_count", "graph_densest_subgraph",
             # r09 additions: centrality pair, truss/Louvain communities,
             # ER linkage, Heaps profile, mix budgeting, integer ACF
             # (stream_topk_continuous drains on build — audited in
             # tests/test_streaming_sketch.py like the other stream shapes)
             "graph_pagerank_personalized", "graph_betweenness_sampled",
             "graph_ktruss", "graph_louvain_sweeps",
             "entity_resolution_scored", "vocab_growth_heaps",
             "mix_budget_allocate", "ts_autocorrelation",
             # r10 additions: the r09 plan-audit tail (verdict finding 1)
             # + this round's new operators
             "sim_ivf_recall_curve", "path_trigrams",
             "graph_motif_chain", "graph_motif_fanout",
             "graph_motif_shared", "graph_motif_negation",
             "graph_motif_varlength", "graph_pagerank_incremental",
             "batch_padding_audit", "dedup_weighted_mass",
             # r11 additions: the MATCH-string front-end keys + SCC
             "graph_motif_parsed", "graph_motif_optional", "graph_scc",
             # r12 additions
             "graph_motif_edge_distinct", "graph_motif_edge_var",
             "graph_scc_coloring", "ts_seasonal_decompose",
             "attribution_linear",
             "graph_scc_condensation",
             # r12 late + r12b additions: walk family, pattern surface,
             # Luby MIS
             "graph_random_walks", "graph_walk_skipgrams",
             "graph_node2vec_walks", "graph_motif_aggregate",
             "graph_motif_pipeline", "graph_motif_shortestpath",
             "graph_mis_luby",
             # r13 additions: collect(), optional chains, UNION
             "graph_motif_collect", "graph_motif_optional_chain",
             "graph_motif_union", "graph_motif_optional_where",
             # r14 additions: numeric exprs, exists semi, whole-node
             # collect, CASE keys, expr aggregates
             "graph_motif_numeric", "graph_motif_exists",
             "graph_motif_collect_node", "graph_motif_case",
             "graph_motif_numeric_agg"]
    for name in bench.HEADLINE + extra:
        fn = qs.get(name)
        if fn is None:
            continue
        df = fn(spark, SF_DIR)
        p = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        n_shuffle = len(re.findall(r"\(\d+\) Exchange\n[^\n]*\n[^\n]*hashpartitioning", p))
        n_bc = len(re.findall(r"\(\d+\) BroadcastHashJoin", p))
        pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", p) else "–"
        topk = "yes" if "TakeOrderedAndProject" in p else "–"
        partial = "yes" if len(re.findall(r"\(\d+\) HashAggregate", p)) >= 2 else "–"
        rows.append((name, str(n_shuffle), str(n_bc), pushed, partial, topk))

    with open("/root/repo/PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan audit of the headline queries\n\n"
            "Generated from `.explain('formatted')` at sf0.01 (regenerate:\n"
            "`python scripts/plan_report.py`). Columns: hash-shuffle exchanges\n"
            "in the plan (broadcast exchanges and presentation sorts excluded),\n"
            "broadcast hash joins, scan-level filter pushdown, map-side partial\n"
            "aggregation, TakeOrderedAndProject top-k. Hard assertions live in\n"
            "`tests/test_plans.py`; this table is the audit trail. Iterative\n"
            "operators (graph loops) and streaming queries report their\n"
            "per-iteration / per-microbatch shape.\n\n"
            "| query | shuffles | broadcasts | pushdown | partial agg | top-k |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write("| " + " | ".join(r) + " |\n")
    print(f"PLANS.md written ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
