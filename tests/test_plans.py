"""Physical-plan regression tests — the 100 TB survival checks.

Correctness tests prove the small-SF answer; these prove the *plan* is the
one we'd want on a 1000-executor cluster: filters and projections reach the
parquet scan, small dimensions broadcast instead of shuffling, aggregates
combine map-side, and whole-stage codegen covers the hot path. A passing
value with a regressed plan is a silent 10× at scale — so the plan is
asserted, not eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from graph_database_project_spark.io import load_table
from graph_database_project_spark.operators import relational, tpch_ext, mutation

from .conftest import SF_ORACLE


def plan(df) -> str:
    # same JVM helper DataFrame.explain(mode=...) prints through
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def n_ops(p: str, op: str) -> int:
    """Count operators by their detail-section headers `(N) <Op>` — the
    tree section abbreviates and would double-count."""
    return len(re.findall(rf"\(\d+\) {op}\b", p))


def n_hash_shuffles(p: str) -> int:
    # shuffle exchanges carry hashpartitioning arguments in their detail
    # block; broadcast exchanges say SinglePartition, presentation sorts
    # rangepartitioning — neither counts as a data shuffle here
    return len(re.findall(r"\(\d+\) Exchange\n[^\n]*\n[^\n]*hashpartitioning", p))


def test_q01_filter_and_projection_pushed_to_scan(spark):
    p = plan(relational.q01_pricing_summary(spark, SF_ORACLE))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: the scan must read only the 7 referenced columns,
    # not the full 11-column lineitem schema
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_q01_partial_aggregation(spark):
    # map-side combine: HashAggregate appears twice (partial + final) so the
    # shuffle carries ~#groups rows per task, not the raw scan
    p = plan(relational.q01_pricing_summary(spark, SF_ORACLE))
    assert p.count("HashAggregate") >= 2


def test_q03_broadcasts_dim_and_codegen(spark):
    df = relational.q03_shipping_priority(spark, SF_ORACLE)
    assert "BroadcastHashJoin" in plan(df)
    # AQE's formatted plan hides codegen spans pre-execution → ask the
    # codegen explain mode, which reports the generated subtrees directly
    jvm = df.sparkSession._jvm
    cg = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen subtree" in cg


def test_q03_topk_avoids_global_sort(spark):
    p = plan(relational.q03_shipping_priority(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in p


def test_q07_all_dims_broadcast_single_big_shuffle(spark):
    p = plan(tpch_ext.q07_volume_shipping(spark, SF_ORACLE))
    assert n_ops(p, "BroadcastHashJoin") >= 4  # supplier, customer, nation x2
    # only lineitem⋈orders may shuffle: at most the join exchange pair plus
    # the final aggregate exchange (at sf0.01 orders broadcasts too → 1)
    assert 1 <= n_hash_shuffles(p) <= 3, p


def test_q19_common_key_extracted_not_nested_loop(spark):
    # the OR-of-ANDs predicate shares l_partkey = p_partkey → must stay a
    # hash join, never BroadcastNestedLoopJoin / CartesianProduct
    p = plan(tpch_ext.q19_or_of_ands(spark, SF_ORACLE))
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "HashJoin" in p


def test_property_set_no_shuffle_before_aggregate(spark):
    # a SET is a pure projection rewrite: exactly one hash exchange (the
    # final groupBy), nothing for the update itself (the trailing
    # rangepartitioning is the presentation orderBy)
    p = plan(mutation.property_set_parts(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 1, p


def test_scan_projection_pruning_generic(spark):
    # 2-column projection over the 11-column lineitem must prune the scan
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan(li))
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_orderkey", "l_quantity"}


def test_semi_join_stays_semi(spark):
    # EXISTS must compile to LeftSemi (no materialized distinct + inner join)
    p = plan(tpch_ext.q04_priority_exists(spark, SF_ORACLE))
    assert "LeftSemi" in p


def test_anti_join_stays_anti(spark):
    p = plan(tpch_ext.q22_idle_customers(spark, SF_ORACLE))
    assert "LeftAnti" in p


def test_partition_filter_events_ts(spark):
    # min/max row-group pruning needs the filter pushed to parquet
    ev = load_table(spark, SF_ORACLE, "events").filter(F.col("event_type") == "click")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in plan(ev)


def test_decontaminate_broadcasts_benchmark_side(spark):
    # the held-out benchmark shingle set is tiny relative to the corpus —
    # it must ride a BroadcastExchange, never shuffle the training side
    # for the join
    from graph_database_project_spark.operators import textops

    p = plan(textops.q_text_decontaminate(spark, SF_ORACLE))
    assert n_ops(p, "BroadcastHashJoin") >= 1, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_stratified_sample_broadcasts_group_counts(spark):
    # per-language counts are a 5-row aggregate joined back onto the
    # corpus — broadcast, not a corpus-wide shuffle join
    from graph_database_project_spark.operators import textops

    p = plan(textops.q_sample_stratified(spark, SF_ORACLE))
    assert n_ops(p, "BroadcastHashJoin") >= 1, p


def test_repetition_signals_no_shuffle_before_output(spark):
    # pure per-row array math: zero hash exchanges in the whole plan
    from graph_database_project_spark.operators import textops

    p = plan(textops.q_text_repetition(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 0, p


def test_scalar_funcs_union_has_no_shuffle(spark):
    # three projection branches + union: no exchange anywhere
    p = plan(relational.q_scalar_funcs(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 0, p


def test_ts_rollup_single_expand_single_shuffle(spark):
    # the multi-resolution rollup must stay ONE grouping-sets aggregation:
    # one Expand, one hash shuffle — not a re-aggregation cascade
    from graph_database_project_spark.operators import timeseries

    p = plan(timeseries.q_ts_rollup_multires(spark, SF_ORACLE))
    assert n_ops(p, "Expand") == 1
    assert n_hash_shuffles(p) == 1


def test_ts_gapfill_grid_broadcast_no_corpus_cartesian(spark):
    # the dense grid comes from a broadcast 1-row bounds aggregate; the
    # only nested-loop join allowed is against that single-row side —
    # the events scan must never be a cartesian input
    from graph_database_project_spark.operators import timeseries

    p = plan(timeseries.q_ts_gapfill_locf(spark, SF_ORACLE))
    assert "BroadcastExchange" in p
    assert n_ops(p, "CartesianProduct") == 0
    # hourly agg + LOCF window partitioning: exactly two data shuffles
    assert n_hash_shuffles(p) <= 2
    # metadata (bounds+types) and hourly aggregate: exactly two events
    # scans — the grid must not cost a third pass over the corpus
    assert n_ops(p, "Scan parquet") == 2


def test_embedding_quantize_zero_shuffle(spark):
    # per-vector quantization is pure projection math: no exchange at all
    from graph_database_project_spark.operators import similarity

    p = plan(similarity.q_embedding_quantize_int8(spark, SF_ORACLE))
    assert n_ops(p, "Exchange") == 0


def test_pack_sequences_single_shuffle(spark):
    # the running-sum window shuffles by source; the per-sequence rollup
    # groups on (source, seq_id) — Spark must recognize the existing
    # source-partitioning satisfies it and NOT shuffle again. This is the
    # partitioning-reuse property the tokenizer-writer pipeline relies on.
    from graph_database_project_spark.operators import curation

    p = plan(curation.q_pack_sequences(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 1, p
    assert p.count("HashAggregate") >= 2  # map-side partial rollup


def test_path_trigrams_lead_window_no_joins(spark):
    # trigrams come from lead(1)/lead(2) over the (user, day) journey
    # window — exactly TWO keyed shuffles total (the window partitioning
    # + the path rollup) and NO joins; the r09 two-self-join form paid
    # two extra keyed shuffles for the identical relation
    from graph_database_project_spark.operators import pipeline

    p = plan(pipeline.q_path_trigrams(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 2, p
    assert n_ops(p, "SortMergeJoin") == 0
    assert n_ops(p, "BroadcastHashJoin") == 0
    assert n_ops(p, "Scan parquet") == 1
    assert "TakeOrderedAndProject" in p  # top-20 never sorts the corpus
    assert p.count("HashAggregate") >= 2  # map-side partial rollup


def test_ivf_recall_curve_no_keyed_shuffle(spark):
    # the nprobe sweep rides the shared unrolled-Lloyd centroid chain:
    # centroids come back as broadcasts, every per-vector rank is
    # computed scan-side — zero hash-partition exchanges, bounded scans
    from graph_database_project_spark.operators import similarity

    p = plan(similarity.q_sim_ivf_recall_curve(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 0, p
    assert n_ops(p, "Scan parquet") <= 4
    assert "Cartesian" not in p


def test_unigram_logprob_vocab_broadcast_no_smj(spark):
    # vocab and corpus-total must come back as broadcasts (the vocab is
    # dim-sized at any corpus scale); the token stream must never be the
    # build side of a sort-merge join
    from graph_database_project_spark.operators import curation

    p = plan(curation.q_text_unigram_logprob(spark, SF_ORACLE))
    assert n_ops(p, "BroadcastHashJoin") >= 1
    assert n_ops(p, "SortMergeJoin") == 0
    assert n_ops(p, "CartesianProduct") == 0


def test_embedding_outlier_centroids_broadcast(spark):
    # centroids (labels x dims rows) broadcast back to the exploded
    # vectors; only the centroid agg and per-vector regroup shuffle
    from graph_database_project_spark.operators import curation

    p = plan(curation.q_embedding_outlier(spark, SF_ORACLE))
    assert n_ops(p, "BroadcastHashJoin") == 1
    assert n_ops(p, "SortMergeJoin") == 0
    assert n_hash_shuffles(p) <= 2


def test_ts_anomaly_two_bounded_shuffles(spark):
    # hourly agg shuffles on (event_type, hour) — wide, map-side combined;
    # the window then re-shuffles only hourly rows by event_type. Exactly
    # these two: the raw event stream must never enter the window state.
    from graph_database_project_spark.operators import timeseries

    p = plan(timeseries.q_ts_anomaly_zscore(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 2, p
    assert p.count("HashAggregate") >= 2  # partial agg before the shuffle
    # NOT one shuffle by design: pre-partitioning the raw scan by
    # event_type (cardinality ~5) would serialize the aggregation into a
    # handful of giant partitions at scale.


def test_retention_cohorts_no_smj_no_cartesian(spark):
    # every join is either broadcast (cohort sizes: rows = #weeks) or on
    # the shared user_id key over post-collapse frames; the raw stream
    # collapses at the first distinct
    from graph_database_project_spark.operators import pipeline

    p = plan(pipeline.q_funnel_retention_cohorts(spark, SF_ORACLE))
    assert n_ops(p, "SortMergeJoin") == 0
    assert n_ops(p, "CartesianProduct") == 0
    assert n_ops(p, "BroadcastHashJoin") >= 1


def test_pii_redact_and_gopher_pure_projection(spark):
    # both PII scrubbing and the quality battery are scan-local row maps:
    # no exchange of any kind, regexp/higher-order work inside codegen
    from graph_database_project_spark.operators import textops

    for q in (textops.q_pii_redact, textops.q_quality_gopher):
        p = plan(q(spark, SF_ORACLE))
        assert n_ops(p, "Exchange") == 0, p
        assert n_ops(p, "BatchEvalPython") == 0  # no row-at-a-time Python


def test_span_dedup_hash_shuffles_only_no_cartesian(spark):
    # chunks shuffle once on content-hash (the dedup window) and once back
    # to doc grain; the text column itself must never cross a shuffle —
    # only the 32-char md5 and ids do
    from graph_database_project_spark.operators import textops

    p = plan(textops.q_span_dedup(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 2, p
    assert n_ops(p, "CartesianProduct") == 0
    exchanges = re.findall(r"\(\d+\) Exchange\n[^\n]*\n[^\n]*", p)
    assert not any("text" in e for e in exchanges), exchanges


def test_table_diff_single_copartitioned_join(spark):
    # CDC diff: both snapshots shuffle once on the key into one full-outer
    # sort-merge join; the change filter runs post-join, no second pass
    from graph_database_project_spark.operators import mutation as mut

    p = plan(mut.table_diff_orders(spark, SF_ORACLE))
    assert n_ops(p, "SortMergeJoin") == 1, p
    assert "FullOuter" in p
    assert n_ops(p, "CartesianProduct") == 0


def test_ts_ewma_bounded_window_after_hourly_collapse(spark):
    # same shape as ts_anomaly: partial-agg to hourly grain, then one
    # window re-shuffle of hourly rows only — raw events never enter the
    # 24-element frame state
    from graph_database_project_spark.operators import timeseries

    p = plan(timeseries.q_ts_ewma(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 2, p
    assert p.count("HashAggregate") >= 2


def test_sample_split_scan_local_gate(spark):
    # split membership is decided at the scan (md5 projection, no shuffle
    # to assign); only the 3-row audit rollup exchanges
    from graph_database_project_spark.operators import curation

    p = plan(curation.q_sample_split(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 1, p
    assert p.count("HashAggregate") >= 2


def test_link_prediction_capped_pair_join_broadcast_degrees(spark):
    # candidate pairs come from ONE part-keyed equi-join (never a
    # supplier×supplier product); the degree cap and both per-supplier
    # degree tables attach via broadcast, so only the edge list shuffles
    from graph_database_project_spark.operators import graphq

    p = plan(graphq.q_link_prediction(spark, SF_ORACLE))
    assert n_ops(p, "CartesianProduct") == 0
    assert n_ops(p, "BroadcastHashJoin") >= 3, p
    # top-k under the total-order sort must not globally sort all pairs
    assert "TakeOrderedAndProject" in p, p


def test_degree_histogram_partial_aggs_no_join(spark):
    from graph_database_project_spark.operators import graphq

    p = plan(graphq.q_degree_histogram(spark, SF_ORACLE))
    assert n_ops(p, "CartesianProduct") == 0
    assert n_ops(p, "BroadcastHashJoin") + n_ops(p, "SortMergeJoin") == 0
    assert p.count("HashAggregate") >= 4  # partial+final on both grains


def test_phash_neardup_banded_equi_join_no_cartesian(spark):
    # candidates come from the (band_idx, val) equi-join; the all-pairs
    # product must never appear, and payload/hash columns must not be in
    # the pair shuffle (only ids + band keys)
    from graph_database_project_spark.operators import multimodal as mm

    p = plan(mm.q_multimodal_phash_neardup(spark, SF_ORACLE))
    assert n_ops(p, "CartesianProduct") == 0
    assert n_ops(p, "BroadcastNestedLoopJoin") == 0
    # the binary payload must stop at the decode stage — no exchange
    # (shuffle or broadcast) may carry it
    for m in re.finditer(r"\(\d+\) Exchange\n(?:[^\n]*\n){0,3}", p):
        assert "payload" not in m.group(0), m.group(0)


def test_profile_columns_single_scan_with_expand(spark):
    # the profiler is ONE pass: a single parquet scan feeds the
    # multi-distinct Expand; a per-column loop (N scans) is the regression
    from graph_database_project_spark.operators import profiling

    p = plan(profiling.q_profile_columns(spark, SF_ORACLE))
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert n_ops(p, "Expand") >= 1
    # string min/max compiles to SortAggregate — count any aggregate flavor
    assert len(re.findall(r"(?:Hash|Sort|ObjectHash)Aggregate", p)) >= 2, p


def test_dq_audit_anti_join_and_one_by_one_cross(spark):
    # FK rule = one left-anti join; the only non-equi join is the 1×1
    # combine of the two scalar aggregate branches
    from graph_database_project_spark.operators import profiling

    p = plan(profiling.q_dq_audit(spark, SF_ORACLE))
    assert "LeftAnti" in p, p
    assert n_ops(p, "CartesianProduct") + n_ops(p, "BroadcastNestedLoopJoin") <= 1


def test_interval_overlap_bucket_equi_join_no_cartesian(spark):
    # the interval×interval theta join must run as the hour-bucket
    # equi-join decomposition — a cartesian (or pure theta nested-loop)
    # over the session table is the scale regression
    p = plan(relational.q_join_interval_overlap(spark, SF_ORACLE))
    assert n_ops(p, "CartesianProduct") == 0
    assert n_ops(p, "BroadcastNestedLoopJoin") == 0
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_zorder_layout_key_is_zero_shuffle_projection(spark):
    # the Morton key must be a codegen projection over a broadcast 1-row
    # bounds aggregate: exactly one hash shuffle in the whole plan (the
    # bucket rollup), no nested-loop against the corpus side
    from graph_database_project_spark.operators import profiling

    p = plan(profiling.q_zorder_layout(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 1, p
    assert "BroadcastExchange" in p
    assert n_ops(p, "CartesianProduct") == 0


def test_runtime_bloom_filter_prunes_fact_side_prejoin(spark):
    """At 100 TB the winning plan for fact⋈(selectively filtered dim) on a
    non-broadcastable dim is Catalyst's runtime bloom filter: the dim side
    aggregates a bloom of its join keys and the fact scan applies
    might_contain BEFORE the shuffle, cutting exchange volume by the dim
    filter's selectivity. Local testdata sits under the default size
    thresholds, so this test pins the thresholds to force the same
    decision the defaults make at cluster scale, then restores them."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")
        li = load_table(spark, SF_ORACLE, "lineitem")
        dim = load_table(spark, SF_ORACLE, "orders") \
            .filter(F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(dim, li.l_orderkey == dim.o_orderkey)
               .groupBy("o_orderpriority").count())
        p = plan(j)
        assert "bloom_filter_agg" in p, p
        assert "might_contain" in p, p
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_fuzzy_typo_linkage_blocked_equi_join(spark):
    # candidates come from the (side,length,half) block key equi-join;
    # never a name×name product, and levenshtein runs post-block only
    from graph_database_project_spark.operators import dedup

    p = plan(dedup.q_fuzzy_join_typo_linkage(spark, SF_ORACLE))
    assert n_ops(p, "CartesianProduct") == 0
    assert n_ops(p, "BroadcastNestedLoopJoin") == 0


def test_scd2_build_one_keyed_shuffle_no_joins(spark):
    # union-of-versions derives per-row from one scan; change-collapse
    # (lag) and interval-close (lead) share the (key, version) window
    # partitioning, so the whole build is ONE keyed shuffle and no joins
    p = plan(mutation.scd2_build_orders(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 1, p
    assert n_ops(p, "SortMergeJoin") + n_ops(p, "BroadcastHashJoin") == 0
    assert n_ops(p, "CartesianProduct") == 0


def test_ts_rollup_incremental_merge_stays_bounded(spark):
    # partial build per slice + merge: ≤3 keyed shuffles total (two
    # slice partial-aggregations and at most one for the keyed merge —
    # Catalyst elides it when the slices' partitioning lines up), NO
    # Expand (this is not the grouping-sets cascade), and the only
    # nested-loop joins are the broadcast 1-row watermark scalars
    from graph_database_project_spark.operators import timeseries

    p = plan(timeseries.q_ts_rollup_incremental(spark, SF_ORACLE))
    assert n_hash_shuffles(p) <= 3, p
    assert n_ops(p, "Expand") == 0
    assert n_ops(p, "SortMergeJoin") == 0
    assert n_ops(p, "BroadcastNestedLoopJoin") <= 2, p


def test_heavy_hitters_cms_probe_broadcast_topk_no_global_sort(spark):
    # sketch build + exact side + probe-merge: 3 keyed shuffles; the
    # top-k never global-sorts (TakeOrderedAndProject) and the probe
    # joins the sketch as a BROADCAST hash join (top-k × d rows), never
    # a sort-merge join
    from graph_database_project_spark.operators import profiling

    p = plan(profiling.q_heavy_hitters_cms(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 3, p
    assert n_ops(p, "TakeOrderedAndProject") == 1, p
    assert n_ops(p, "BroadcastHashJoin") == 1, p
    assert n_ops(p, "SortMergeJoin") == 0, p


def test_cardinality_hll_constant_size_reduce_no_smj(spark):
    # the register build must collapse map-side to ≤ m rows per partition
    # before its single keyed shuffle; the rank dim and the spine fill are
    # broadcasts (regs ≤ m rows by construction — asserting no SortMergeJoin
    # pins the explicit broadcast hint that overrides Catalyst's missing
    # stats); the 1×1 exact-count attach is the only nested-loop join
    from graph_database_project_spark.operators import profiling

    p = plan(profiling.q_cardinality_hll(spark, SF_ORACLE))
    assert n_ops(p, "SortMergeJoin") == 0, p
    assert n_ops(p, "BroadcastHashJoin") == 2, p
    assert n_ops(p, "BroadcastNestedLoopJoin") == 1, p
    assert n_hash_shuffles(p) <= 3, p
    assert n_ops(p, "Expand") == 0, p


def test_ivfpq_serving_no_corpus_shuffle(spark):
    # ADC serving: probe + LUT are broadcast scalars, candidates come via
    # a broadcast hash join on the probed cells, the ADC fold is in-row,
    # and top-k is TakeOrderedAndProject — the codes corpus must never
    # hash-shuffle (index build is session-cached and excluded here by
    # warming the memo first)
    from graph_database_project_spark.operators import similarity

    similarity.q_sim_ivfpq_topk(spark, SF_ORACLE).limit(1).count()  # warm memo
    p = plan(similarity.q_sim_ivfpq_topk(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 0, p
    # two TakeOrdered: the nprobe cell probe (16 rows) and the final top-k
    assert n_ops(p, "TakeOrderedAndProject") == 2, p
    assert n_ops(p, "SortMergeJoin") == 0, p


def test_quantile_sketch_bounded_aggs_no_corpus_sort(spark):
    # one-scan slice histogram (conditional sums) + B-row sketch math:
    # every aggregation reduces to <= B rows; at most the histogram
    # shuffle and the 3-row qbin shuffle carry hash exchanges; the raw
    # values never globally sort and events is scanned at most twice
    # (bounds pass + binning pass)
    from graph_database_project_spark.operators import profiling

    p = plan(profiling.q_quantile_sketch_merge(spark, SF_ORACLE))
    assert n_ops(p, "SortMergeJoin") == 0, p
    assert n_hash_shuffles(p) <= 3, p
    # the 1-row bounds is checkpointed, so the lazy plan reads events
    # EXACTLY once (the binning pass) — re-references must not re-scan
    assert n_ops(p, "Scan parquet") == 1, p


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew handling, executed and observed — the automatic
    counterpart of join_salted_skew's manual salting (SCALE.md §3): with
    thresholds scaled to local data, a join keyed so ~2/3 of lineitem
    lands on ONE key must come out of AQE with the skewed partition
    split (skew=true in the final sort-merge join).

    Two preconditions this test documents by construction (each cost a
    debugging round when absent):
    * the skewed side must come from MULTIPLE map tasks — AQE splits a
      reduce partition by MAP RANGES, so a single-row-group parquet scan
      (one mapper) is UNSPLITTABLE and the rule silently skips; widen=
      True supplies the mappers (at 100 TB the analogue is under-split
      input files disabling skew mitigation);
    * both join inputs must be Sort(Shuffle)-shaped — a distinct/agg
      between the shuffle and the join breaks the rule's pattern, so the
      dim side is built aggregate-free (orders keys are already unique).
    The final plan must be read from THIS DataFrame's queryExecution
    after collect(); a sink write runs its own execution and the plan
    here would still say isFinalPlan=false."""
    keep = {k: spark.conf.get(k, None) for k in [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        li = load_table(spark, SF_ORACLE, "lineitem", widen=True).select(
            F.when(F.col("l_orderkey") % 3 != 0, F.lit(0))
             .otherwise(F.col("l_orderkey")).alias("k"),
            F.md5(F.concat_ws(":", "l_orderkey", "l_partkey", "l_suppkey"))
             .alias("payload"))
        dim = (load_table(spark, SF_ORACLE, "orders")
               .filter(F.col("o_orderkey") % 3 == 0)
               .select(F.col("o_orderkey").cast("long").alias("k"))
               .union(spark.range(1).select(F.lit(0).cast("long").alias("k"))))
        joined = li.join(dim, "k")
        assert joined.collect()  # executed — final adaptive plan available
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in executed
        assert "skew=true" in executed, executed[:4000]
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bm25_zero_shuffle_single_pass_topk(spark):
    # per-doc tf via higher-order fns (no Generate), corpus stats attach as
    # a 1-row broadcast nested-loop, ranking is TakeOrderedAndProject —
    # ZERO keyed shuffles end to end: the serving-path shape where one scan
    # pass + a driver-sized broadcast answers the query at any corpus size
    from graph_database_project_spark.operators import textops

    p = plan(textops.q_bm25_search(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 0, p
    assert n_ops(p, "Generate") == 0, p
    assert n_ops(p, "BroadcastNestedLoopJoin") == 1, p
    assert n_ops(p, "TakeOrderedAndProject") == 1, p
    assert n_ops(p, "SortMergeJoin") == 0, p
    assert n_ops(p, "CartesianProduct") == 0, p


def test_cooccur_pmi_bounded_shuffles_no_cartesian(spark):
    # the pair fan-out is an equi-join on doc_id (never a cartesian), df
    # weights attach as broadcasts, and the top-N never global-sorts; the
    # per-doc term cap bounds every shuffle's row count at any corpus size
    from graph_database_project_spark.operators import textops

    p = plan(textops.q_cooccur_pmi(spark, SF_ORACLE))
    assert n_ops(p, "CartesianProduct") == 0, p
    assert n_hash_shuffles(p) <= 4, p
    assert n_ops(p, "TakeOrderedAndProject") == 1, p
    assert n_ops(p, "Sort") == 0, p


def test_bloom_prune_constant_size_build_scan_local_probe(spark):
    # the filter build collapses to BLOOM_WORDS rows through ONE keyed
    # shuffle (bit_or partial-aggregates map-side); the probe pass is
    # scan-local: the assembled words attach as a 1-row broadcast (BNLJ),
    # the true-match flag joins broadcast — no SortMergeJoin anywhere, so
    # the fact side never shuffles before being pruned
    from graph_database_project_spark.operators import profiling

    p = plan(profiling.q_join_bloom_prune(spark, SF_ORACLE))
    assert n_hash_shuffles(p) <= 2, p
    assert n_ops(p, "SortMergeJoin") == 0, p
    assert n_ops(p, "BroadcastHashJoin") == 2, p
    assert n_ops(p, "BroadcastNestedLoopJoin") == 2, p
    assert n_ops(p, "CartesianProduct") == 0, p


def test_no_per_reference_rederivation_in_multi_consumer_plans(spark):
    """r05 scan-multiplicity audit, pinned: plans whose derived relation
    feeds several consumers must materialize it once — Catalyst re-expands
    a subtree PER REFERENCE (no CTE sharing) and executes every copy
    (zero ReusedExchange measured), so each extra reference is a full
    table re-scan (or a full Python codec re-run) at 100 TB. Bounds are
    the post-fix scan counts; intentionally multi-scan queries (CDC
    snapshot diff, merge-equivalence oracles, TPC-H correlated shapes)
    are not listed."""
    import re as _re

    from graph_database_project_spark.registry import all_queries

    BOUNDS = {
        "graph_triangle_count": 0,       # edge list checkpointed
        "graph_link_prediction": 0,      # distinct edges checkpointed
        "setop_ops": 0,                  # both epoch sides checkpointed
        "mutation_merge_upsert": 1,      # target scan; batch checkpointed
        "sim_knn_per_vector": 0,         # normed vectors + buckets checkpointed
        "dedup_embedding_cosine": 0,     # same
        "multimodal_phash_neardup": 0,   # hash table checkpointed
        "text_cooccur_pmi": 0,           # token relation checkpointed
        "text_bm25_search": 0,           # per-doc tf relation checkpointed
        "text_unigram_logprob": 0,       # token relation checkpointed
        "semantic_decontaminate": 0,     # normed vectors checkpointed
        "join_size_estimate": 0,         # key base checkpointed
        "embedding_mrl_audit": 2,        # top1 winners checkpointed; corpus + probe scans remain
        "ts_lttb_downsample": 1,         # bucket anchors checkpointed
        "cardinality_hll_grouped": 1,    # registers checkpointed; exact-count scan remains
        "graph_hyperball": 0,            # edges + per-round registers checkpointed
        "graph_hits": 0,                 # edges/verts + per-round scores checkpointed
        "graph_scc": 0,                  # substrate + squarings checkpointed
        "ts_seasonal_decompose": 1,      # daily relation checkpointed
        "quantile_sketch_grouped": 0,    # bounds + (day, bin) hist checkpointed
        "theta_sketch_setops": 1,        # K-min survivors checkpointed; exact-count scan remains
        "graph_cc_incremental": 0,       # stored labels + delta edges checkpointed
        "drift_histogram_tv": 0,         # bounds + slice histogram checkpointed
        "graph_clustering_coeff": 0,     # unioned canonical edge list checkpointed
        "graph_temporal_reachability": 0,  # presence + contact edges checkpointed
        "graph_temporal_multisource": 0,   # same presence relation, seed-keyed
        "text_hybrid_rrf": 2,  # tf sidecar checkpointed; 2 embeddings scans
        #                        (probe + corpus, the sim_topk baseline shape)
        "assoc_basket_rules": 0,  # (order, brand) relation checkpointed
        "ts_cusum_changepoint": 0,  # day series checkpointed
        "bpe_learn_merges": 0,      # vocab + per-round winners checkpointed
        "bpe_token_count": 1,       # learn loop checkpointed; the per-doc
        #                             word-count scan remains
        "graph_densest_subgraph": 0,  # edge list + per-round peels checkpointed
        "graph_pagerank_personalized": 0,  # verts/edges/pvec/ranks checkpointed
        "graph_betweenness_sampled": 0,    # und/layers/T tables checkpointed
        # r15 materialize-once refactors: post-fix scan counts pinned
        "funnel_retention_cohorts": 0,  # activity + cohorts checkpointed (was 3 events scans)
        "q02_min_cost_supplier": 3,     # unit-cost agg checkpointed (was 6 scans)
        "vocab_growth_heaps": 1,        # doc_id bounds checkpointed (was 4 scans)
        "sim_ivf_recall_curve": 0,      # probe + candidate sets checkpointed (was 4 scans)
    }
    qs = all_queries()
    for name, bound in BOUNDS.items():
        p = plan(qs[name](spark, SF_ORACLE))
        n = len(_re.findall(r"\(\d+\) Scan parquet", p))
        assert n <= bound, f"{name}: {n} parquet scans (bound {bound})\n{p}"

    # every BOUNDS key checkpoints a derived relation AT CONSTRUCTION, so
    # /explain on it executes Spark jobs — api._eager_on_build must flag
    # each one or the endpoint's documented-side-effect note drifts (the
    # r05 ADVICE gap: join_size_estimate was bounded here but unflagged)
    from graph_database_project_spark.api import _eager_on_build
    unflagged = [k for k in BOUNDS if not _eager_on_build(k)]
    assert not unflagged, f"BOUNDS keys missing from EAGER_ON_BUILD: {unflagged}"


def test_skyline_two_scans_broadcast_prune_no_cartesian(spark):
    # deliberately two part scans (bucket-max pass + prune pass — lazy,
    # no checkpoint: the corpus-sized pts relation must not materialize
    # at 100 TB); the bucket prefix relation attaches by broadcast; the
    # global windows see only pre-pruned survivors
    import re as _re

    from graph_database_project_spark.operators import tpch_ext

    p = plan(tpch_ext.q_skyline_pareto(spark, SF_ORACLE))
    assert len(_re.findall(r"\(\d+\) Scan parquet", p)) <= 2, p
    assert n_ops(p, "CartesianProduct") == 0, p
    assert n_ops(p, "SortMergeJoin") == 0, p
    assert n_ops(p, "BroadcastHashJoin") == 1, p


def test_lttb_single_scan_broadcast_anchors(spark):
    # the anchor relation (bucket firsts) is checkpointed and attaches by
    # broadcast; n_in_bucket rides the rank window's partitioning — the
    # whole downsample is ONE events scan, no sort-merge join anywhere
    from graph_database_project_spark.operators import timeseries

    p = plan(timeseries.q_ts_lttb_downsample(spark, SF_ORACLE))
    assert n_ops(p, "SortMergeJoin") == 0, p
    import re as _re
    assert len(_re.findall(r"\(\d+\) Scan parquet", p)) <= 1, p


def test_chunk_windows_zero_shuffle(spark):
    # chunking is pure per-row explode+slice: no exchange anywhere
    from graph_database_project_spark.operators import textops

    p = plan(textops.q_text_chunk_windows(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 0, p


def test_hybrid_rrf_arms_broadcast_bounded_fusion_tiny(spark):
    # both candidate arms keep their flagships' serving shape — a 1-row
    # broadcast (stats / query vector) attached by BNLJ and a TakeOrdered
    # to the RRF_CAND cap — so ZERO keyed shuffles touch a corpus-sized
    # relation; the fusion full-outer join and the rank windows see only
    # the ≤2×RRF_CAND-row candidate sets (the lone SMJ + Sorts below are
    # over those constant-bounded rows, not data). Final ranking is the
    # third TakeOrdered.
    from graph_database_project_spark.operators import textops

    p = plan(textops.q_text_hybrid_rrf(spark, SF_ORACLE))
    assert n_hash_shuffles(p) == 0, p
    assert n_ops(p, "BroadcastNestedLoopJoin") == 2, p
    assert n_ops(p, "TakeOrderedAndProject") == 3, p
    assert n_ops(p, "CartesianProduct") == 0, p
    assert n_ops(p, "SortMergeJoin") <= 1, p  # tiny×tiny fusion join only
    assert n_ops(p, "Generate") == 0, p
