"""Count-min sketch invariants on real data: the sketch is a constant-size
TABLE whose cells merge by addition (the property that makes it the
per-key-frequency structure for key spaces too large to groupBy exactly),
and estimates never undercount."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_project_spark.io import load_table
from graph_database_project_spark.operators.profiling import (
    CMS_D, CMS_W, cms_estimate, cms_sketch, q_heavy_hitters_cms)

from .conftest import SF_ORACLE


def _keys(spark):
    return (load_table(spark, SF_ORACLE, "events")
            .filter(F.col("user_id").isNotNull())
            .select(F.col("user_id").cast("long").alias("k"),
                    F.col("event_id")))


def test_sketch_size_bounded_by_d_times_w(spark):
    sk = cms_sketch(_keys(spark).select("k"))
    assert sk.count() <= CMS_D * CMS_W
    # total mass per depth row == number of keyed rows (each row lands in
    # exactly one bucket per depth)
    n = _keys(spark).count()
    per_depth = {r.d: r.total for r in
                 sk.groupBy("d").agg(F.sum("c").alias("total")).collect()}
    assert set(per_depth) == set(range(CMS_D))
    assert all(v == n for v in per_depth.values())


def test_sketch_merges_by_cell_addition(spark):
    """Sketch(slice A) + Sketch(slice B) must equal Sketch(A ∪ B) cell for
    cell — the ingest-batch merge contract (same shape as
    timeseries.merge_partials). The split is on event_id parity, so both
    slices carry every hot user."""
    keys = _keys(spark)
    whole = cms_sketch(keys.select("k"))
    lo = cms_sketch(keys.filter(F.col("event_id") % 2 == 0).select("k"))
    hi = cms_sketch(keys.filter(F.col("event_id") % 2 == 1).select("k"))
    merged = (lo.unionByName(hi)
              .groupBy("d", "bucket").agg(F.sum("c").alias("c")))
    diff = (merged.alias("m")
            .join(whole.alias("w"), ["d", "bucket"], "full")
            .filter(F.coalesce(F.col("m.c"), F.lit(0))
                    != F.coalesce(F.col("w.c"), F.lit(0))))
    assert diff.isEmpty()


def test_estimates_never_undercount(spark):
    """est ≥ exact for EVERY key (not just the top-20 the query reports):
    counters only ever overcount."""
    keys = _keys(spark).select("k")
    exact = keys.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(cms_sketch(keys), exact)
    assert est.filter(F.col("est_n") < F.col("exact_n")).isEmpty()


def test_query_overcounts_live_at_oracle_sf(spark):
    """The width is deliberately undersized so collisions FIRE at test
    scale — if every overcount were zero the differential check would
    never exercise the sketch's defining behavior (the dead-variation
    trap from the multimodal Y4M review)."""
    out = q_heavy_hitters_cms(spark, SF_ORACLE).collect()
    assert any(r.overcount > 0 for r in out)
    assert all(r.est_n >= r.exact_n for r in out)


def _hll_keys(spark):
    return (load_table(spark, SF_ORACLE, "events")
            .filter(F.col("user_id").isNotNull())
            .select((F.col("user_id").cast("long") % 2147483648).alias("k"),
                    F.col("event_id")))


def test_hll_registers_merge_by_max(spark):
    """HLL register tables merge by per-bucket max — and because HLL is
    insertion-idempotent, this holds even for OVERLAPPING slices (unlike
    the CMS, whose counters require disjoint slices). Both split kinds
    are asserted."""
    from graph_database_project_spark.operators.profiling import (
        HLL_M, hll_registers)

    keys = _hll_keys(spark)
    whole = hll_registers(keys.select("k"))
    assert whole.count() == HLL_M

    def merged(a, b):
        return (hll_registers(a.select("k"))
                .unionByName(hll_registers(b.select("k")))
                .groupBy("bucket").agg(F.max("reg").alias("reg")))

    disjoint = merged(keys.filter(F.col("event_id") % 2 == 0),
                      keys.filter(F.col("event_id") % 2 == 1))
    overlapping = merged(keys.filter(F.col("event_id") % 3 != 0),
                         keys.filter(F.col("event_id") % 3 != 1))
    for m in (disjoint, overlapping):
        diff = (m.alias("m").join(whole.alias("w"), "bucket")
                .filter(F.col("m.reg") != F.col("w.reg")))
        assert diff.isEmpty()


def test_hll_estimate_within_theory_band(spark):
    """The raw estimator must land within ~3σ of exact at sf0.01 (σ ≈
    1.04/√m ≈ 13 %) — the regression guard that caught the two broken
    hash designs (plain LCG: +100 %; no-offset mix: a saturated register
    from the user_id=0 fixed point)."""
    from graph_database_project_spark.operators.profiling import (
        q_cardinality_hll)

    row = q_cardinality_hll(spark, SF_ORACLE).collect()[0]
    assert abs(row.rel_error) < 0.40, row
    assert row.max_register < 20, row  # no saturated fixed-point register


def test_quantile_sketch_within_bin_width_of_exact(spark):
    """The histogram sketch's guarantee: the chosen bin contains the
    target-rank value, so the estimate sits within ~one bin width of the
    exact quantile (2w asserted for the rank-convention gap between
    count-based and (n-1)q interpolation)."""
    from graph_database_project_spark.operators.profiling import (
        QH_BINS, q_quantile_sketch_merge)

    vals = (load_table(spark, SF_ORACLE, "events")
            .filter(F.col("value").isNotNull())
            .select(F.col("value").alias("v")))
    lo, hi = vals.agg(F.min("v"), F.max("v")).first()
    w = (hi - lo) / QH_BINS
    exact = {q: vals.agg(F.expr(f"percentile(v, {q})")).first()[0]
             for q in (0.5, 0.9, 0.99)}
    for r in q_quantile_sketch_merge(spark, SF_ORACLE).collect():
        assert abs(r.est_value - exact[r.q]) <= 2 * w, (r, exact[r.q], w)


# --- bloom-filter runtime join pruning ---------------------------------------

def test_bloom_prune_contract(spark):
    """Structural contract of the bloom gate: no false negatives EVER
    (n_missed = 0 — every true join match passes the filter), the observed
    false-positive rate stays inside ~3x the textbook (bits_set/m)^k bound
    (loose: one sf0.01 draw), and the gate actually prunes (a filter that
    passes everything is a no-op, not a runtime filter)."""
    from graph_database_project_spark.operators.profiling import (
        BLOOM_K, BLOOM_M, q_join_bloom_prune)

    row = q_join_bloom_prune(spark, SF_ORACLE).collect()[0]
    assert row["n_missed"] == 0
    assert row["n_pass"] >= row["n_true"]
    fp_bound = (row["bits_set"] / BLOOM_M) ** BLOOM_K
    assert row["fp_rate_ppm"] / 1e6 <= 3 * fp_bound
    assert row["prune_ppm"] / 1e6 > 0.5


# --- grouped histogram-sketch quantiles --------------------------------------

def test_quantile_sketch_grouped_accuracy_and_mergeability(spark):
    """Two semantic contracts the oracle can't see:
    (a) per-day estimates track the exact per-day percentile within 2
        bin widths (interpolation can miss by at most a bin either side);
    (b) global bin edges make day histograms mergeable — the cell-wise
        sum of per-day (bin, c) counts equals the global histogram the
        ungrouped sketch builds, which is the whole point of sharing
        edges across groups (week/corpus rollups by addition)."""
    from graph_database_project_spark.operators.profiling import (
        QH_BINS, QHG_QS, q_quantile_sketch_grouped)

    ev = (load_table(spark, SF_ORACLE, "events")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day"),
                  F.col("value").alias("v")))
    lo, hi = ev.agg(F.min("v"), F.max("v")).first()
    w = (hi - lo) / QH_BINS
    exact = {(r.day, q): r[f"p{int(q * 100)}"]
             for r in ev.groupBy("day").agg(
                 *[F.expr(f"percentile(v, {q})").alias(f"p{int(q * 100)}")
                   for q in QHG_QS]).collect()
             for q in QHG_QS}
    rows = q_quantile_sketch_grouped(spark, SF_ORACLE).collect()
    assert len(rows) == len(exact)
    for r in rows:
        assert abs(r.est_value - exact[(r.day, r.q)]) <= 2 * w, (
            r, exact[(r.day, r.q)], w)

    # (b) merge-by-addition: day histograms sum to the global histogram
    binned = ev.select(
        F.least(F.floor((F.col("v") - F.lit(lo)) / F.lit(w)),
                F.lit(QH_BINS - 1)).cast("int").alias("bin"),
        "day")
    day_hist = binned.groupBy("day", "bin").count()
    merged = {r.bin: r.c for r in day_hist.groupBy("bin")
              .agg(F.sum("count").alias("c")).collect()}
    direct = {r.bin: r.c for r in binned.groupBy("bin")
              .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert merged == direct


# --- KMV / theta set-operation sketch ----------------------------------------

def test_theta_sketch_accuracy_and_sample_contract(spark):
    """Semantic contracts beyond the bit-exact oracle: (a) each estimate
    lands within ~3σ of its exact count (σ ≈ 1/√(K−1) ≈ 6.3%; the
    intersection inherits extra variance from the theta cut, wider band);
    (b) the two-phase distributed K-min equals the direct global K
    smallest distinct hashes — any global top-K survives per-salt-bucket
    top-K (the pigeonhole that makes phase 1 lossless)."""
    from pyspark.sql.window import Window as W

    from graph_database_project_spark.operators.profiling import (
        HLL_MUL1, HLL_MUL2, HLL_OFFSET, KMV_K, q_theta_sketch_setops)

    row = q_theta_sketch_setops(spark, SF_ORACLE).collect()[0]
    for est, exact, band in [
            (row.est_a_milli, row.exact_a, 0.20),
            (row.est_b_milli, row.exact_b, 0.20),
            (row.est_union_milli, row.exact_union, 0.20),
            (row.est_inter_milli, row.exact_inter, 0.30)]:
        assert abs(est / 1000 - exact) / exact <= band, (est, exact)

    # (b) phase-1+2 == direct K smallest distinct mixed hashes for set A
    ords = load_table(spark, SF_ORACLE, "orders")
    hs = (ords.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(F.col("o_orderkey").cast("long").alias("k"))
          .withColumn("h0", (F.col("k") % 2147483648 + HLL_OFFSET)
                      % 4294967296)
          .withColumn("h1", (F.expr("h0 ^ shiftright(h0, 16)")
                             * HLL_MUL1) % 4294967296)
          .withColumn("h2", (F.expr("h1 ^ shiftright(h1, 15)")
                             * HLL_MUL2) % 4294967296)
          .select(F.expr("h2 ^ shiftright(h2, 16)").alias("h"))
          .distinct())
    direct_kth = (hs.withColumn("rn", F.row_number().over(W.orderBy("h")))
                  .filter(F.col("rn") == KMV_K).collect()[0].h)
    # the query's theta_hash is min(kthA, kthB); recompute kthA two-phase
    salted = (hs.withColumn("rn", F.row_number().over(
        W.partitionBy(F.col("h") % 64).orderBy("h")))
        .filter(F.col("rn") <= KMV_K).drop("rn"))
    two_phase_kth = (salted.withColumn("rn", F.row_number().over(W.orderBy("h")))
                     .filter(F.col("rn") == KMV_K).collect()[0].h)
    assert two_phase_kth == direct_kth
    assert row.theta_hash <= direct_kth  # theta = min of the two sets' kths


# --- histogram drift audit ----------------------------------------------------

def test_drift_tv_contracts(spark):
    """Exact-arithmetic contracts: tv_ppm reproduces the definitional
    0.5*L1 between normalized histograms computed independently in
    Python; bounds hold (0 <= tv <= 1e6, worst bin within range, slice
    counts partition the corpus); and a self-drift (identical slices)
    is exactly zero."""
    from graph_database_project_spark.operators.profiling import (
        DRIFT_SPLIT_DAYS, QH_BINS, q_drift_histogram_tv)

    row = q_drift_histogram_tv(spark, SF_ORACLE).collect()[0]
    assert 0 <= row.tv_ppm <= 1_000_000
    assert 0 <= row.worst_bin < QH_BINS
    assert row.worst_bin_ppm <= 2 * row.tv_ppm  # one bin <= whole L1

    ev = (load_table(spark, SF_ORACLE, "events")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull()))
    n = ev.count()
    assert row.n_base + row.n_current == n

    # independent recomputation of TV from raw bin counts
    lo, hi, tsmin = ev.agg(F.min("value"), F.max("value"),
                           F.date_trunc("day", F.min("ts"))).first()
    import datetime
    split = tsmin + datetime.timedelta(days=DRIFT_SPLIT_DAYS)
    w = (hi - lo) / QH_BINS
    hist = {(r.bin, r.base): r.c for r in ev.select(
        F.least(F.floor((F.col("value") - F.lit(lo)) / F.lit(w)),
                F.lit(QH_BINS - 1)).cast("int").alias("bin"),
        (F.col("ts") < F.lit(split)).alias("base"))
        .groupBy("bin", "base").agg(F.count(F.lit(1)).alias("c")).collect()}
    tb = sum(c for (b, isb), c in hist.items() if isb)
    tc = n - tb
    sumdev = sum(abs(hist.get((b, True), 0) * tc - hist.get((b, False), 0) * tb)
                 for b in range(QH_BINS))
    assert row.tv_ppm == sumdev * 1_000_000 // (2 * tb * tc)


def test_cms_grouped_slice_merge_equals_whole(spark):
    """Grouped-CMS merge algebra: building per-slice keyed sketches and
    summing cells on (day, d, bucket) equals the whole-corpus keyed build
    — the property that lets per-batch day sketches roll up to any
    granularity without raw data."""
    from graph_database_project_spark.operators.profiling import (
        cms_sketch_grouped)

    ev = (load_table(spark, SF_ORACLE, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
          .select(F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day"),
                  F.col("user_id").cast("long").alias("k")))
    whole = {(r.day, r.d, r.bucket): r.c
             for r in cms_sketch_grouped(ev).collect()}
    s1 = cms_sketch_grouped(ev.filter(F.col("k") % 2 == 0))
    s2 = cms_sketch_grouped(ev.filter(F.col("k") % 2 != 0))
    merged = {}
    for r in s1.collect() + s2.collect():
        key = (r.day, r.d, r.bucket)
        merged[key] = merged.get(key, 0) + r.c
    assert merged == whole


def test_ppm_downshift_exact_and_overflow_safe(spark):
    """The drift audit's ppm downshift in its ACTIVE regime (the corpus
    tests only exercise divisor 1): for denominators in all four CASE
    branches, Spark and DuckDB produce identical ppm values, the result
    never overflows, and the approximation error vs exact rational ppm is
    within the documented 2^-26 relative bound."""
    import duckdb

    from graph_database_project_spark.operators.profiling import (
        _ppm_downshift_sql)

    cases = [  # (num, den) with num <= den, spanning every CASE branch
        (123_456, 1_000_000),                      # divisor 1 (exact)
        ((1 << 45) // 3, 1 << 45),                 # divisor 256
        ((1 << 53) // 7 * 2, 1 << 53),             # divisor 65536
        ((1 << 61) // 5 * 3, 1 << 61),             # divisor 2^24
        (9_100_000_000_000_000_000 // 2,
         9_100_000_000_000_000_000),               # near-2^63 den
    ]
    pd_expr = _ppm_downshift_sql("den")
    con = duckdb.connect()
    for num, den in cases:
        sp = spark.sql(
            f"SELECT (CAST({num} AS BIGINT) div {pd_expr}) * 1000000 "
            f"div (CAST({den} AS BIGINT) div {pd_expr}) AS ppm "
            f"FROM (SELECT CAST({num} AS BIGINT) AS num, "
            f"CAST({den} AS BIGINT) AS den)").collect()[0].ppm
        du = con.execute(
            f"SELECT (CAST({num} AS BIGINT) // {pd_expr}) * 1000000 "
            f"// (CAST({den} AS BIGINT) // {pd_expr}) AS ppm "
            f"FROM (SELECT CAST({num} AS BIGINT) AS num, "
            f"CAST({den} AS BIGINT) AS den)").fetchone()[0]
        assert sp == du, (num, den, sp, du)
        exact = num * 1_000_000 // den  # python ints don't overflow
        assert abs(sp - exact) <= max(1, exact >> 25), (sp, exact)
    con.close()


def test_markov_transitions_conservation(spark):
    """Exact-integer conservation: total transitions equal
    Σ_users (n_events_u − 1), and each row's probabilities floor-sum to
    within |types| ppm of exactly 1e6."""
    from graph_database_project_spark.operators.timeseries import (
        q_ts_markov_transitions)

    rows = q_ts_markov_transitions(spark, SF_ORACLE).collect()
    ev = (load_table(spark, SF_ORACLE, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                  & F.col("event_type").isNotNull()))
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    want_total = sum(r.n - 1 for r in per_user.collect())
    assert sum(r.n_trans for r in rows) == want_total

    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for ft, rs in by_from.items():
        total = rs[0].row_total
        assert sum(r.n_trans for r in rs) == total
        psum = sum(r.prob_ppm for r in rs)
        assert 1_000_000 - len(rs) <= psum <= 1_000_000, (ft, psum)
