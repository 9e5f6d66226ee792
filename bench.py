#!/usr/bin/env python
"""Per-round benchmark harness.

Runs the headline queries from the registry at ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {"q1": sec, ...}, "sf": ...}

``value`` is the sum of per-query wall-clock seconds over the FROZEN v2
headline set (the driver compares it against BASELINE.md round over round);
the v2.1 EXTENDED set (heavy non-headline families: XML ingest, streaming
drain, codecs, span dedup, hypertable rollup) is timed identically and
reported additively under ``queries_extended``/``extended_total`` so those
paths are no longer perf-invisible. Each query is forced through the
``noop`` batch sink, which materializes EVERY output column JVM-side (a bare
count() would let Spark prune unused columns out of the final project and
under-time wide results). Each query is executed NUM_RUNS times and the
median is recorded — the median discards both the one-time codegen-JIT hit
of the first execution and transient machine-load spikes. Repetitions are
INTERLEAVED (A,B,C,…,A,B,C,… rather than A,A,A,B,B,B): correlated machine-
load spikes on this sandbox last seconds-to-minutes, so back-to-back
repetitions of one query all land inside the same spike and the median
absorbs nothing — spreading a query's repetitions across the whole suite
decorrelates them (memory: single runs swing ±3×). A failed query
contributes a fixed FAIL_PENALTY to the total — breakage must read as a
regression, never as a speedup. A warm-up pass on the flagship query first
absorbs JVM classloading so even the first per-query run measures mostly the
plan.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# The headline set: the flagship pricing summary plus one representative of
# each expensive operator family (join-heavy, window, graph loop, dedup, ANN,
# text). Cheap scalar-function demos are excluded — they don't move at scale.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q07_volume_shipping",
    "q10_returned_items",
    "q13_order_distribution",
    "q18_large_volume",
    "window_topk_per_group",
    "sessionize",
    "graph_connected_components",
    "graph_khop_seeded",
    "graph_triangle_count",
    "dedup_minhash_lsh",
    "dedup_exact",
    "sim_topk_bruteforce",
    # sim_ivf_topk intentionally excluded: since r04 the k-means index is
    # session-cached (build/serve split), so its timing here would measure
    # a cache read on warm runs and index construction on the first — and
    # HEADLINE membership is frozen by BASELINE.md v2 regardless
    "udf_embedding_norm",
    "text_stats",
    "pipeline_training_data",
    "mutation_merge_upsert",
]


def _xml_ingest_e2e(spark, sf_dir):
    """End-to-end XML ingest: wholetext read → mapInPandas shred → node/edge
    derivation, both relations materialized. build_graph caches the shred;
    the unpersist first drops any prior run's entry (CacheManager matches by
    logical plan) so every timed run does the real ingest work."""
    from graph_database_project_spark.graph.shred import ingest_xml, shred_xml
    from graph_database_project_spark.operators.xmlq import REFERENCE_XML_GLOB

    shred_xml(spark, REFERENCE_XML_GLOB).unpersist()
    nodes, edges = ingest_xml(spark, REFERENCE_XML_GLOB)
    return nodes.unionByName(edges, allowMissingColumns=True)


# BASELINE v2.1 additive set: heavy non-headline families that were
# perf-invisible under v2 (the r03 streaming regression had no bench
# symptom). Timed and reported separately; v2 HEADLINE rows stay the gate.
EXTENDED = [
    # seam canaries — never retire (BASELINE v2.8 wall policy): the only
    # readStream row, and the Python-codec / worker-reaper canary
    "stream_tumbling_hourly",   # real readStream → availableNow drain
    "multimodal_png_decode",    # real zlib/filter PNG codec via mapInPandas
    # recent rows (operator changed / added within the last 3 rounds)
    "graph_motif_varlength",    # r10: *1..3 reachability expansion
                                # (r15: per-hop materialization, 8 exch)
    "graph_motif_negation",     # r10: NOT-EXISTS anti-join motif
    "graph_motif_parsed",       # r11: MATCH-string front-end (text→plan)
    "graph_motif_optional",     # r11: OPTIONAL MATCH left-outer motif
    "graph_motif_edge_distinct",  # r12: relationship-uniqueness mode,
                                  # both modes timed in one key
    "graph_motif_edge_var",     # r12: untyped -[r]-> edge variable
    "graph_motif_aggregate",    # r12: RETURN aggregates (implicit
                                # grouping) compiled from pattern text
    "graph_motif_pipeline",     # r12b: Cypher WITH stages (aggregate ->
                                # HAVING -> re-anchored MATCH) from text
    "graph_motif_shortestpath",  # r12b: shortestPath distance histogram
                                 # (per-h exact sets + min fold, k<=4)
    "graph_mis_luby",           # r12b: Luby MIS — job-count-bound
                                # priority rounds; kept as the codegen-
                                # cache EVICTION canary (first==median
                                # telltale, r13 adjudication)
    "graph_motif_textpred",     # r12b: WHERE string predicates (JVM
                                # Column.contains/startswith filter)
    "graph_motif_collect",      # r13: collect() list aggregate (WITH-
                                # composed, sort_array + concat_ws fold)
    "graph_motif_optional_chain",  # r13: 3-hop all-or-nothing optional
                                   # chain (inner motif + one left join)
    "graph_motif_union",        # r13: UNION of two branch motifs +
                                # whole-result distinct
    "graph_motif_optional_where",  # r13: match-time WHERE in the
                                   # optional left-join condition
    "graph_motif_numeric",      # r14: cast+arithmetic WHERE exprs
    "graph_motif_exists",       # r14: left-semi pattern predicate
    "graph_motif_collect_node",  # r14: whole-node collect cells
    "graph_motif_case",         # r14: searched CASE group key
    "graph_motif_weighted",     # r15: parenthesized exprs + ORDER BY expr
    "graph_motif_cond_agg",     # r15: sum(CASE WHEN ...) conditional agg
    "graph_motif_size_concat",  # r15: string '+' concat, size(), WITH
]

# BASELINE v2.8 wall policy (pin-and-retire): rows whose operator is
# unchanged ≥3 rounds and whose last two healthy captures sat within the
# healthy-window spread of their pins are RETIRED from the default
# bench — their BASELINE pins stand, they stay in the registry/parity/
# plan gates, and SPARK_GRAFT_BENCH_FULL=1 still times them. A retired
# row un-retires the round its operator code changes. Rationale: the
# extended family hit 41 rows / ~87 s per rep, and long fires cost
# healthy-window capture odds on this drifty host (see BASELINE.md).
RETIRED = [
    # r12b retirements (wall policy): operators unchanged since r10/r11,
    # pins stamped (weighted_mass 1.442, padding_audit 0.41,
    # pagerank_incremental 3.886) and cross-checked within spread on
    # the last two healthy captures
    "dedup_weighted_mass",
    "batch_padding_audit",
    "graph_pagerank_incremental",
    "multimodal_video_frames",  # Y4M frame sampling
    "text_span_dedup",          # inverted-index span dedup
    "ts_rollup_multires",       # hypertable multi-resolution rollup
    "graph_label_propagation",  # r05: 10-round iterative vote loop
    "text_cooccur_pmi",         # r05: pair fan-out self-join + df broadcast
    "ts_lttb_downsample",       # r06: triangle-area plot downsampling
    "embedding_mrl_audit",      # r06: prefix-dim retrieval agreement
    "graph_modularity",         # r06: LPA loop + exact-integer scoring
    "graph_hyperball",          # r07: HLL ball-merge centrality loop
    "graph_hits",               # r07: integer mutual-reinforcement loop
    "quantile_sketch_grouped",  # r07: keyed mergeable histogram quantiles
    "theta_sketch_setops",      # r07: KMV set-operation sketch (2-phase K-min)
    "dedup_prefix_filter",      # r07: PPJoin prefix-filtered Jaccard join
    "graph_cc_incremental",     # r07: IVM delta-merge over stored CC labels
    "drift_histogram_tv",       # r07: exact-integer TV drift audit
    "graph_clustering_coeff",   # r07: wedge-join triple tally + lcc rollup
    "heavy_hitters_cms_grouped",  # r07: keyed CMS build + per-day top-k probe
    "graph_temporal_reachability",  # r07: contact-edge build + 3 relax rounds
    "ts_markov_transitions",    # r07: per-user lag window + matrix rollup
    "bpe_learn_merges",         # r08: 6-round tokenizer merge loop over vocab
    "assoc_basket_rules",       # r08: basket pair self-join + lift
    "skyline_pareto",           # r08: grid prune + running-max windows
    "ts_cusum_changepoint",     # r08: day-grain integer CUSUM
    "graph_densest_subgraph",   # r08: 8-round (1+eps)-peel loop
    "graph_pagerank_personalized",  # r09: seeded-teleport PPR loop
    "graph_betweenness_sampled",    # r09: bounded-depth Brandes two-chain
    "stream_topk_continuous",   # r09: day-CMS + candidate-ledger top-k
    "graph_ktruss",             # r09: triangle-support edge peel loop
    # r13 retirements (wall policy): r11 operators unchanged r12+r13,
    # v2.8 pins stamped and cross-checked within spread on BOTH r12
    # healthy captures (scc 5.064/5.577 vs pin 5.155, condensation
    # 5.430/6.147 vs 5.183, attribution 1.141/1.438 vs 1.212, seasonal
    # — see BASELINE.md v2.8.1/v2.8.2 tables)
    "graph_scc",                # r11: repeated-squaring mutual reach
    "graph_scc_condensation",   # r11: condensation DAG topo levels
    "attribution_linear",       # r11: multi-touch value split
    "ts_seasonal_decompose",    # r11: day-of-week + signed-ppm residuals
    # r14 retirements (wall policy): graphq loop rows unchanged
    # r13+r14, pins cross-checked within spread on the r12 AND r14
    # healthy captures (scc 6.073 vs pin 6.584, walks 2.253 vs
    # 2.969, skipgrams 2.403 vs 3.209) — the three heaviest
    # non-canary rows (~10.7 s of the 25.3 s healthy extended wall)
    "graph_scc_coloring",       # r12: hub-safe FW-BW coloring SCC
    "graph_random_walks",       # r12: hash-seeded DeepWalk sampling
    "graph_walk_skipgrams",     # r12: skip-gram pair expansion
    # r15 retirement (wall policy): operator unchanged since r12b, pin
    # 3.149 stamped v2.8.3 from BOTH r14 healthy captures, and the r14
    # driver capture read 3.647 (cold-JIT shape, warm at pin). Offsets
    # the three new r15 motif rows; graph_mis_luby stays as the
    # codegen-cache eviction canary.
    "graph_node2vec_walks",     # r12b: second-order biased walks
]

# Bench-only callables (not registry keys) timed within the extended set.
CUSTOM = {
    "xml_ingest_e2e": _xml_ingest_e2e,
}

# Floor charged per failed/missing headline query so breakage can only make
# the round-over-round total WORSE, never better. The actual charge scales
# with the slowest successful query (100×) so the penalty dominates at any
# SF, not just sf0.1.
FAIL_PENALTY = 600.0

# BASELINE.md freezes the methodology as the median of 3 warm runs per query.
NUM_RUNS = 3

# Idle-window sentinel references (BASELINE.md "Machine-state sentinel",
# pinned r05) and the pin-eligibility threshold (r07 verdict #8): a run is
# "healthy" only when EVERY before/after sentinel is within this factor of
# its idle reference. BASELINE.md pins may only be stamped from runs whose
# own contract line says sentinel_health=healthy — the adjudication that
# was manual through r07 (3 of 4 r07-era runs landed degraded) is now
# machine-readable in the recorded BENCH_r{N}.json itself.
SENTINEL_REF = {"python_loop_sec": 0.27, "numpy_matmul_sec": 0.48}
SENTINEL_HEALTHY_MAX = 1.3


def sentinel_health(*sentinels: dict) -> tuple[str, float]:
    """Worst before/after ratio vs the idle references → verdict."""
    worst = max(s[k] / SENTINEL_REF[k] for s in sentinels for k in SENTINEL_REF)
    verdict = "healthy" if worst <= SENTINEL_HEALTHY_MAX else "degraded"
    return verdict, round(worst, 2)


def contract_line(out: dict) -> str:
    """The FINAL stdout line. The driver keeps only the last ~2000 bytes
    and parses the final line, so the line must always fit. Since r11
    the per-row EXTENDED medians do not ride the line at all — the
    extended family grew to 39 rows (r10 verdict #1 added seven) and a
    realistic rendering crossed the 1900-byte budget, so per-row
    extended data lives in BENCH_DETAIL.json (committed each round by
    the driver's round-close commit) plus an earlier stdout line; the
    line keeps the frozen v2 gate fields (per-headline medians) and the
    extended AGGREGATE (extended_total / extended_n), which preserves
    the regression tripwire: any extended row blowing up moves
    extended_total, and the per-row attribution is one file away.
    tests/test_bench_contract.py drives this function with worst-case
    renderings (FAIL_PENALTY floats, full-suite failed lists)."""
    out = dict(out)
    ext = out.pop("queries_extended", {})
    out["extended_n"] = len(ext)
    contract = json.dumps(out, separators=(",", ":"))
    if len(contract) > 1900 and out.get("failed"):
        # full-suite breakage renders a 46-key failed list (~2094 bytes
        # even without extended rows — r08 review finding): keep a count
        # plus a prefix so the line still names the blast radius
        out = {**out, "failed_count": len(out["failed"]),
               "failed": sorted(out["failed"])[:5]}
        contract = json.dumps(out, separators=(",", ":"))
    return contract


def machine_sentinel() -> dict:
    """Fixed CPU + memory-bandwidth microbenchmarks timed alongside the
    suite, so round-over-round drift in the query numbers can be ATTRIBUTED:
    this sandbox's wall-clocks swing 2-3x on tens-of-minutes timescales
    (measured r05: the same suite totaled 24.6s and then, 40 minutes later,
    individual queries ran at r04 speeds), and without a sentinel a slow
    round is indistinguishable from a plan regression. Single-threaded pure
    Python (interpreter/CPU) + a numpy matmul (SIMD/memory); both are
    Spark-free so they measure the MACHINE, not the engine. Reference
    values pinned in BASELINE.md; compare ratios, not absolutes."""
    import numpy as np

    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    cpu_s = time.perf_counter() - t0
    a = np.arange(1_000_000, dtype=np.float64).reshape(1000, 1000)
    t0 = time.perf_counter()
    for _ in range(3):
        a = (a @ a) % 1e9
    blas_s = time.perf_counter() - t0
    return {"python_loop_sec": round(cpu_s, 3),
            "numpy_matmul_sec": round(blas_s, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from graph_database_project_spark.session import get_spark
    from graph_database_project_spark.registry import all_queries

    sentinel_before = machine_sentinel()
    spark = get_spark("bench")
    queries = all_queries()

    # Warm-up: JVM classloading + codegen on a small action, plus one tiny
    # pandas_udf call so the Python worker pool + Arrow path is live before
    # any timed query needs it (worker spin-up is startup cost, not plan
    # cost, same as the JIT).
    try:
        queries["q01_pricing_summary"](spark, sf_dir).limit(1).count()
        from pyspark.sql.functions import pandas_udf
        import pandas as _pd

        @pandas_udf("double")
        def _warm(s: _pd.Series) -> _pd.Series:
            return s * 1.0

        spark.range(32).select(_warm("id")).write.format("noop") \
            .mode("overwrite").save()
    except Exception:
        pass

    # BASELINE v2.8 wall policy: the default suite times the ACTIVE
    # extended set; SPARK_GRAFT_BENCH_FULL=1 adds the retired rows back
    # (their pins stand in BASELINE.md — see the policy note there).
    full = os.environ.get("SPARK_GRAFT_BENCH_FULL") == "1"
    suite: list[str] = (HEADLINE + EXTENDED
                        + (RETIRED if full else []) + list(CUSTOM))
    runs: dict[str, list[float]] = {n: [] for n in suite}
    failed: list[str] = []
    # Interleaved repetitions: one full pass over the suite per round, so a
    # query's NUM_RUNS samples are minutes apart and a transient machine-
    # load spike can't poison all of them (see module docstring).
    # SPARK_GRAFT_BENCH_MODE=backtoback restores the v2 A,A,A,B,B,B order
    # (protocol-comparison runs only).
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "interleaved")
    if mode == "backtoback":
        schedule = [(name,) * NUM_RUNS for name in suite]
        schedule = [n for grp in schedule for n in grp]
    else:
        schedule = [n for _ in range(NUM_RUNS) for n in suite]
    for name in schedule:
            if name in failed:
                continue
            fn = CUSTOM.get(name) or queries.get(name)
            if fn is None:
                failed.append(name)
                continue
            try:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                # noop sink: full-width materialization, zero serialization
                # to Python, no files written
                df.write.format("noop").mode("overwrite").save()
                runs[name].append(time.perf_counter() - t0)
            except Exception as exc:
                print(f"bench: {name} failed: {exc}", file=sys.stderr)
                failed.append(name)

    ok = {n: r for n, r in runs.items() if r and n not in failed}
    cold = {n: round(r[0], 3) for n, r in ok.items()}
    medians = {n: round(statistics.median(r), 3) for n, r in ok.items()}
    penalty = max(FAIL_PENALTY, 100.0 * max(medians.values(), default=0.0))
    for name in failed:
        medians[name] = penalty

    timings = {n: medians[n] for n in HEADLINE if n in medians}
    extended = {n: medians[n] for n in suite if n not in HEADLINE and n in medians}
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    import pyspark

    sentinel_after = machine_sentinel()
    health, worst_ratio = sentinel_health(sentinel_before, sentinel_after)
    # The driver records only the LAST ~2000 bytes of stdout and parses the
    # final line (BENCH_r05 had "parsed": null because the contract line
    # outgrew that window). So: full diagnostics go to BENCH_DETAIL.json +
    # an earlier stdout line; the FINAL line is the compact contract —
    # metric/value/sf/stat/per-query medians/sentinels only.
    detail = {
        # untrimmed first-run (JIT-inclusive) timings alongside the medians
        "queries_first_run": cold,
        # round-over-round comparability: the runtime that produced these
        # numbers (the r02→r03 22% shift on identical code was a PySpark
        # 3.x→4.1 runtime change, not a plan change) and the fixed warmup
        # protocol that precedes the first timed run
        "pyspark_version": pyspark.__version__,
        "python_version": sys.version.split()[0],
        "warmup": "q01_limit1_count + pandas_udf_32row_noop (JVM codegen + Arrow worker pool)",
        "sink": "noop_full_width",
        "baseline": "BASELINE.md v2 gate + v2.1 extended rows (interleaved protocol, r05)",
        "sentinel_worst_ratio": worst_ratio,
    }
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # BASELINE v2.1 additive rows — NOT part of "value" (the frozen v2
        # gate); pinned separately in BASELINE.md
        "queries_extended": extended,
        "extended_total": round(sum(extended.values()), 3),
        "sf": sf_val,
        "stat": (f"median_of_{NUM_RUNS}_interleaved" if mode != "backtoback"
                 else f"median_of_{NUM_RUNS}"),
        # machine-state sentinel: Spark-free microbench timed before and
        # after the suite — lets a reader separate host-load drift from
        # plan regressions (reference values in BASELINE.md)
        "sentinel_before": sentinel_before,
        "sentinel_after": sentinel_after,
        # machine-stamped pin-eligibility (worst sentinel ratio vs the idle
        # references, threshold 1.3x): BASELINE.md pins come only from
        # "healthy" runs; a "degraded" contract is load-window evidence
        "sentinel_health": health,
        # v2.8 wall policy: how many pinned rows are retired from this
        # run's default suite (0 when SPARK_GRAFT_BENCH_FULL=1)
        "retired_n": 0 if full else len(RETIRED),
    }
    if failed:
        out["failed"] = failed
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as fh:
            json.dump({**out, **detail}, fh, indent=1)
    except OSError:
        pass
    print("bench detail: " + json.dumps(detail))
    # per-row extended medians: earlier line + BENCH_DETAIL.json (the
    # driver window may clip this line; the committed file is canonical)
    print("bench extended: "
          + json.dumps(extended, separators=(",", ":")))
    print(contract_line(out))
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
