"""Table profiling + data-quality expectation auditing — the ANALYZE /
expectations surface of the engine (reference parity: the ingest scripts
eyeball node/property completeness by hand, e.g. first-graph.py's ad-hoc
count prints; here it is a first-class operator pair).

Both queries run over a deterministically DIRTIED orders snapshot (negated
prices, nulled clerks, dangling customer keys, duplicated order keys — the
inject-then-operate pattern the multimodal codecs and mutation_table_diff
use), so every profile column and every audit rule has live violations to
find; a clean table would make half the assertions dead variation.

Scale notes in each docstring; the profiler is ONE pass over the table
(multi-distinct via Catalyst's Expand), the audit is one pass plus one
keyed anti-join for the FK rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

# Dirt injection moduli — chosen co-prime so rule populations overlap but
# never coincide (a row can be price-negative AND duplicated).
DIRT_NEG_PRICE = 97     # o_orderkey % 97 == 0 → negated price
DIRT_NULL_CLERK = 89    # → orderpriority nulled
DIRT_DANGLING_FK = 101  # → o_custkey shifted out of customer's key space
DIRT_DUP_KEY = 103      # → row duplicated (breaks key uniqueness)
_FK_SHIFT = 10_000_000


def dirty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mutated snapshot both queries audit."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    mutated = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % DIRT_DANGLING_FK == 0,
               F.col("o_custkey") + _FK_SHIFT)
         .otherwise(F.col("o_custkey")).alias("o_custkey"),
        "o_orderstatus",
        F.when(F.col("o_orderkey") % DIRT_NEG_PRICE == 0,
               -F.col("o_totalprice"))
         .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        F.when(F.col("o_orderkey") % DIRT_NULL_CLERK == 0, F.lit(None))
         .otherwise(F.col("o_orderpriority")).alias("o_orderpriority"),
    )
    # duplicate via explode-replication, not a union self-read: the source
    # is scanned ONCE (the union form re-scans the table — 2× I/O at 100 TB)
    copies = F.when(F.col("o_orderkey") % DIRT_DUP_KEY == 0, 2).otherwise(1)
    return mutated.select(
        "*", F.explode(F.sequence(F.lit(1), copies)).alias("_i")
    ).drop("_i")


_DIRTY_SQL = f"""
  mutated AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % {DIRT_DANGLING_FK} = 0
                THEN o_custkey + {_FK_SHIFT} ELSE o_custkey END AS o_custkey,
           o_orderstatus,
           CASE WHEN o_orderkey % {DIRT_NEG_PRICE} = 0
                THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
           o_orderdate,
           CASE WHEN o_orderkey % {DIRT_NULL_CLERK} = 0
                THEN NULL ELSE o_orderpriority END AS o_orderpriority
    FROM orders
  ), dirty AS (
    SELECT * FROM mutated
    UNION ALL
    SELECT * FROM mutated WHERE o_orderkey % {DIRT_DUP_KEY} = 0
  )
"""

# (column, stringify-kind) — doubles go through DECIMAL(18,2) so both
# engines print identical text; dates/ints cast straight to string.
_PROFILE_COLS = [
    ("o_orderkey", "plain"),
    ("o_custkey", "plain"),
    ("o_orderstatus", "plain"),
    ("o_totalprice", "money"),
    ("o_orderdate", "plain"),
    ("o_orderpriority", "plain"),
]


def _str_spark(col: str, kind: str, agg: str):
    e = F.min(col) if agg == "min" else F.max(col)
    if kind == "money":
        e = e.cast("decimal(18,2)")
    return e.cast("string")


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (null count, exact distinct count, min/max) of
    the dirty snapshot, computed in ONE table pass: every column's
    aggregates live in a single agg (multi-distinct handled by Catalyst's
    Expand), then the 1-row result unpivots to a row per column on the
    driver-free stack path. At 100 TB this is one scan + one small-key
    shuffle — the ANALYZE-statistics plan — versus a naive per-column loop
    (6 scans).
    """
    d = dirty_orders(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            _str_spark(c, kind, "min").alias(f"{c}__mn"),
            _str_spark(c, kind, "max").alias(f"{c}__mx"),
        ]
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c, _ in _PROFILE_COLS
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_null, n_distinct, min_value, max_value)",
    ).select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value"
    ).orderBy("col_name")


def _profile_col_sql(c: str, kind: str) -> str:
    mn, mx = f"min({c})", f"max({c})"
    if kind == "money":
        mn, mx = f"CAST({mn} AS DECIMAL(18,2))", f"CAST({mx} AS DECIMAL(18,2))"
    return (
        f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        f"count(DISTINCT {c}) AS n_distinct, "
        f"CAST({mn} AS VARCHAR) AS min_value, CAST({mx} AS VARCHAR) AS max_value "
        f"FROM dirty"
    )


Q_PROFILE_SQL = "WITH " + _DIRTY_SQL + "\n" + "\nUNION ALL\n".join(
    _profile_col_sql(c, k) for c, k in _PROFILE_COLS
) + "\nORDER BY col_name"


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite audit over the dirty snapshot: five rules
    (not-null, range, key-uniqueness, referential integrity, domain
    membership) each report checked/violation counts and a pass flag —
    the gate report a pipeline publishes before promoting a batch.

    Scale: the four row-local rules fold into ONE aggregation pass
    (conditional sums + one count-distinct); referential integrity is one
    left-anti join against the FK parent on its key. Nothing quadratic,
    nothing per-rule-scan.
    """
    d = dirty_orders(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"))

    one = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_orderpriority").isNull().cast("long")).alias("v_prio_null"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("v_price"),
        F.sum((~F.col("o_orderstatus").isin("F", "O", "P")).cast("long"))
         .alias("v_status"),
        (F.count("o_orderkey") - F.countDistinct("o_orderkey"))
         .alias("v_dupkey"),
    )
    fk_viol = d.join(cust, "o_custkey", "left_anti") \
        .agg(F.count(F.lit(1)).alias("v_fk"), F.count(F.lit(1)).alias("n2"))
    joined = one.crossJoin(fk_viol)  # 1×1 rows

    rules = [
        ("priority_not_null", "v_prio_null"),
        ("fk_custkey_exists", "v_fk"),
        ("orderkey_unique", "v_dupkey"),
        ("status_in_domain", "v_status"),
        ("totalprice_positive", "v_price"),
    ]
    stack_args = ", ".join(f"'{r}', {v}" for r, v in rules)
    return joined.selectExpr(
        "n",
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)",
    ).select(
        "rule",
        F.col("n").alias("n_checked"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passes"),
        F.round(1.0 - F.col("n_violations") / F.col("n"), 6).alias("pass_rate"),
    ).orderBy("rule")


Q_DQ_AUDIT_SQL = "WITH " + _DIRTY_SQL + f""",
agg AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS v_prio_null,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS v_price,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)
              AS BIGINT) AS v_status,
         count(o_orderkey) - count(DISTINCT o_orderkey) AS v_dupkey
  FROM dirty
), fk AS (
  SELECT CAST(count(*) AS BIGINT) AS v_fk
  FROM dirty d LEFT JOIN customer c ON c.c_custkey = d.o_custkey
  WHERE c.c_custkey IS NULL
), rules AS (
  SELECT 'priority_not_null' AS rule, n, v_prio_null AS n_violations FROM agg
  UNION ALL SELECT 'fk_custkey_exists', n, v_fk FROM agg, fk
  UNION ALL SELECT 'orderkey_unique', n, v_dupkey FROM agg
  UNION ALL SELECT 'status_in_domain', n, v_status FROM agg
  UNION ALL SELECT 'totalprice_positive', n, v_price FROM agg
)
SELECT rule, n AS n_checked, n_violations,
       n_violations = 0 AS passes,
       round(1.0 - n_violations * 1.0 / n, 6) AS pass_rate
FROM rules ORDER BY rule
"""


ZBUCKET_SHIFT = 24  # keep the top 8 of the 32 Morton bits → 256 buckets


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit: key every lineitem row by the
    interleaved bits of (l_partkey, l_suppkey), bucket on the top Morton
    byte — one bucket ≈ one file of a ZORDER BY write — and report each
    bucket's bounding box in both dimensions. Tight boxes (box_area ≪
    full_range²) are WHY z-ordering skips files for filters on either
    column; tests/test_zorder.py proves it on real written files.

    Scale: the Morton key is a zero-shuffle codegen projection (bounds
    ride a 1-row broadcast); the audit is one keyed aggregation.
    """
    from ..functions.zorder import zorder_value

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.min("l_partkey").alias("xmn"), F.max("l_partkey").alias("xmx"),
        F.min("l_suppkey").alias("ymn"), F.max("l_suppkey").alias("ymx"))
    keyed = li.crossJoin(F.broadcast(bounds)).withColumn(
        "z",
        zorder_value(F.col("l_partkey"), F.col("l_suppkey"),
                     F.col("xmn"), F.col("xmx"), F.col("ymn"), F.col("ymx")),
    )
    return (
        keyed.groupBy(F.shiftright("z", ZBUCKET_SHIFT).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_min"), F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"), F.max("l_suppkey").alias("sk_max"),
        )
        .withColumn(
            "box_area",
            ((F.col("pk_max") - F.col("pk_min") + 1)
             * (F.col("sk_max") - F.col("sk_min") + 1)).cast("long"),
        )
        .orderBy("zbucket")
    )


Q_ZORDER_SQL = f"""
WITH b AS (
  SELECT min(l_partkey) AS xmn, max(l_partkey) AS xmx,
         min(l_suppkey) AS ymn, max(l_suppkey) AS ymx
  FROM lineitem
), k AS (
  SELECT l_partkey, l_suppkey,
         -- list_sum returns DOUBLE/HUGEINT; pin BIGINT for dtype parity
         CAST(list_sum(list_transform(range(0, 16), i ->
           (((((l_partkey - xmn) * 65535) // greatest(xmx - xmn, 1)) >> i) & 1)
             * (CAST(1 AS BIGINT) << (2 * i))
           + (((((l_suppkey - ymn) * 65535) // greatest(ymx - ymn, 1)) >> i) & 1)
             * (CAST(1 AS BIGINT) << (2 * i + 1)))) AS BIGINT) AS z
  FROM lineitem, b
)
SELECT z >> {ZBUCKET_SHIFT} AS zbucket, count(*) AS n_rows,
       min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
       min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max,
       CAST((max(l_partkey) - min(l_partkey) + 1)
            * (max(l_suppkey) - min(l_suppkey) + 1) AS BIGINT) AS box_area
FROM k GROUP BY zbucket ORDER BY zbucket
"""


# -- count-min sketch heavy hitters -----------------------------------------
#
# The sketch is pure relational algebra (explode d hash rows → one keyed
# count aggregation), NOT a binary blob: the "sketch" is a (depth, bucket,
# c) TABLE of d×w rows regardless of corpus size, mergeable across slices /
# days / streams by summing c on (depth, bucket). Because the hash is plain
# modular arithmetic (no engine-specific hash function), DuckDB replicates
# the ENTIRE sketch bit-for-bit and the oracle value-checks the estimates
# themselves — a stronger check than an accuracy contract.
CMS_D = 4            # hash rows (depth)
# Width DELIBERATELY undersized for the test corpora (64 buckets vs
# 150-1500 distinct users) so hash collisions actually fire and the
# differential check exercises live overcounts — at sf0.01 the top-20
# report mixes zero- and positive-overcount rows. A deployment sizes
# w = ceil(e / eps) for target overestimate eps·N (w=2048 → eps≈0.13%).
CMS_W = 64
CMS_P = 2147483647   # Mersenne prime 2^31-1 for the universal-hash modulus
CMS_A = (1299721, 15485863, 32452843, 49979687)   # per-row hash multipliers
CMS_B = (104729, 224737, 350377, 479909)          # per-row hash offsets
CMS_TOPK = 20


def _cms_rows():
    """The d (depth, a, b) hash-parameter rows as an array-of-structs
    literal — exploded against keys to form (key, depth, bucket) tuples.
    ANSI-safe: a·key + b stays far below 2^63 for 32-bit keys."""
    return F.array(*[
        F.struct(F.lit(i).alias("d"),
                 F.lit(CMS_A[i]).alias("a"),
                 F.lit(CMS_B[i]).alias("b"))
        for i in range(CMS_D)
    ])


def _cms_bucket(key, a, b):
    return ((a * key + b) % CMS_P) % CMS_W


def cms_sketch(keys: DataFrame) -> DataFrame:
    """Build the count-min sketch TABLE (d, bucket, c) from a (k: long)
    relation. Mergeable: sketches of disjoint slices combine by summing c
    on (d, bucket) — tests/test_sketch.py proves slice-merge equals
    whole-corpus build exactly."""
    cells = keys.select("k", F.explode(_cms_rows()).alias("r")).select(
        F.col("r.d").alias("d"),
        _cms_bucket(F.col("k"), F.col("r.a"), F.col("r.b")).alias("bucket"),
    )
    return cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(sketch: DataFrame, probe_keys: DataFrame) -> DataFrame:
    """Point-query the sketch for (k, ...) probe rows: min cell count over
    the d hash rows. Probe side broadcasts (top-k keys × d rows)."""
    extra = [c for c in probe_keys.columns if c != "k"]
    probe = probe_keys.select("k", *extra, F.explode(_cms_rows()).alias("r")).select(
        "k", *extra,
        F.col("r.d").alias("d"),
        _cms_bucket(F.col("k"), F.col("r.a"), F.col("r.b")).alias("bucket"),
    )
    return (sketch.join(F.broadcast(probe), ["d", "bucket"])
            .groupBy("k", *extra)
            .agg(F.min("c").alias("est_n")))


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over ``events.user_id`` via a count-min sketch,
    differentially checked against exact counts.

    Build: explode each key into its d (depth, bucket) cells and count per
    cell — ONE partial-aggregated shuffle whose reduce side is at most d×w
    = 8192 rows at any corpus size (map-side combine collapses each scan
    partition to ≤ d×w cells before the wire). Probe: the exact top-k keys
    (the verification side) re-hash through the same d rows and take the
    min cell count — est_n ≥ exact_n always (counters only overcount), and
    E[overcount] ≤ N/w per cell, concentrated by the min over d rows.

    Scale: the sketch is THE way to track per-key frequencies when the key
    space (users, URLs, shingles) is too large to groupBy exactly — the
    sketch table is constant-size, mergeable by summing (depth, bucket)
    cells across ingest batches (same contract as rollup_partials), and
    the probe is a broadcast join against 8192 rows. The exact-count side
    here exists only as the differential oracle's ground truth.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .select(F.col("user_id").cast("long").alias("k")))
    sketch = cms_sketch(ev)
    exact = ev.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    topk = exact.orderBy(F.desc("exact_n"), F.asc("k")).limit(CMS_TOPK)
    est = cms_estimate(sketch, topk)
    return est.select(
        F.col("k").alias("user_id"),
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overcount"),
    )


Q_HEAVY_HITTERS_SQL = f"""
WITH params AS (
  SELECT * FROM (VALUES {", ".join(f"({i}, {CMS_A[i]}, {CMS_B[i]})" for i in range(CMS_D))})
         AS t(d, a, b)
), keys AS (
  SELECT user_id AS k FROM events WHERE user_id IS NOT NULL
), sketch AS (
  SELECT d, ((a * k + b) % {CMS_P}) % {CMS_W} AS bucket, count(*) AS c
  FROM keys CROSS JOIN params GROUP BY 1, 2
), exact AS (
  SELECT k, count(*) AS exact_n FROM keys GROUP BY 1
), topk AS (
  SELECT k, exact_n FROM exact ORDER BY exact_n DESC, k LIMIT {CMS_TOPK}
), probe AS (
  SELECT t.k, t.exact_n, p.d,
         ((p.a * t.k + p.b) % {CMS_P}) % {CMS_W} AS bucket
  FROM topk t CROSS JOIN params p
)
SELECT pr.k AS user_id,
       CAST(pr.exact_n AS BIGINT) AS exact_n,
       CAST(min(s.c) AS BIGINT)   AS est_n,
       CAST(min(s.c) - pr.exact_n AS BIGINT) AS overcount
FROM probe pr JOIN sketch s USING (d, bucket)
GROUP BY pr.k, pr.exact_n
"""


CMS_GROUP_TOPK = 3   # per-group report size (|days| × 3 output rows)


def cms_sketch_grouped(keys: DataFrame, group: str = "day") -> DataFrame:
    """Keyed CMS build: (group, k) relation → (group, d, bucket, c) cells
    — |groups|×d×w rows, map-side combined like the global build, and
    mergeable across slices by summing c on (group, d, bucket). Completes
    the grouped-mergeable-sketch family (HLL ✓, histogram quantiles ✓,
    CMS here)."""
    cells = keys.select(group, "k", F.explode(_cms_rows()).alias("r")).select(
        group,
        F.col("r.d").alias("d"),
        _cms_bucket(F.col("k"), F.col("r.a"), F.col("r.b")).alias("bucket"),
    )
    return cells.groupBy(group, "d", "bucket").agg(
        F.count(F.lit(1)).alias("c"))


def q_heavy_hitters_cms_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DAY heavy hitters via keyed count-min sketches — daily top
    talkers, the grouped form of ``heavy_hitters_cms`` and the shape a
    100 TB profile stores per partition (per-day sketches merge into
    weekly/monthly ones by cell addition, so the report can be re-run at
    any granularity without raw data).

    Scale: one keyed shuffle to |days|×d×w cells (bounded by config ×
    calendar, not data); the exact side exists only as the differential
    ground truth and its per-day top-k rides a (day)-partitioned
    row_number window. est ≥ exact always (counters only overcount).
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
          .select(F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day"),
                  F.col("user_id").cast("long").alias("k")))
    sketch = cms_sketch_grouped(ev, group="day")
    from pyspark.sql.window import Window as W
    exact = ev.groupBy("day", "k").agg(F.count(F.lit(1)).alias("exact_n"))
    topk = (exact.withColumn("rn", F.row_number().over(
        W.partitionBy("day").orderBy(F.desc("exact_n"), F.asc("k"))))
        .filter(F.col("rn") <= CMS_GROUP_TOPK).drop("rn"))
    probe = (topk.select("day", "k", "exact_n",
                         F.explode(_cms_rows()).alias("r"))
             .select("day", "k", "exact_n",
                     F.col("r.d").alias("d"),
                     _cms_bucket(F.col("k"), F.col("r.a"),
                                 F.col("r.b")).alias("bucket")))
    est = (sketch.join(F.broadcast(probe), ["day", "d", "bucket"])
           .groupBy("day", "k", "exact_n")
           .agg(F.min("c").alias("est_n")))
    return (est.select(
        "day",
        F.col("k").alias("user_id"),
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overcount"))
        .orderBy("day", F.desc("exact_n"), "user_id"))


Q_HEAVY_HITTERS_GROUPED_SQL = f"""
WITH params AS (
  SELECT * FROM (VALUES {", ".join(f"({i}, {CMS_A[i]}, {CMS_B[i]})" for i in range(CMS_D))})
         AS t(d, a, b)
), keys AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id AS k
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), sketch AS (
  SELECT day, d, ((a * k + b) % {CMS_P}) % {CMS_W} AS bucket, count(*) AS c
  FROM keys CROSS JOIN params GROUP BY 1, 2, 3
), exact AS (
  SELECT day, k, count(*) AS exact_n FROM keys GROUP BY 1, 2
), topk AS (
  SELECT day, k, exact_n FROM (
    SELECT day, k, exact_n,
           row_number() OVER (PARTITION BY day
                              ORDER BY exact_n DESC, k) AS rn
    FROM exact)
  WHERE rn <= {CMS_GROUP_TOPK}
), probe AS (
  SELECT t.day, t.k, t.exact_n, p.d,
         ((p.a * t.k + p.b) % {CMS_P}) % {CMS_W} AS bucket
  FROM topk t CROSS JOIN params p
)
SELECT pr.day, pr.k AS user_id,
       CAST(pr.exact_n AS BIGINT) AS exact_n,
       CAST(min(s.c) AS BIGINT)   AS est_n,
       CAST(min(s.c) - pr.exact_n AS BIGINT) AS overcount
FROM probe pr JOIN sketch s USING (day, d, bucket)
GROUP BY pr.day, pr.k, pr.exact_n
ORDER BY pr.day, exact_n DESC, user_id
"""


# -- CMS inner product: pre-execution join-size estimation ------------------
# The optimizer-facing sketch application (AMS/CMS classic): |A ⋈_k B| =
# Σ_k cntA(k)·cntB(k), estimated WITHOUT touching the join by the inner
# product of the two sides' sketches — Σ_bucket cA(d,b)·cB(d,b) per hash
# row, min over rows. Never undercounts (hash collisions only ADD cross
# terms), so it is a safe upper bound for join planning: at 100 TB the
# two d×w sketches are maintained as table statistics and the estimate
# costs O(d·w), not a pass over either table.
#
# Width is sized to the job: the inner-product error bound is
# (e/w)·||a||₁·||b||₁, so the frequency-sketch width (CMS_W = 64, sized
# for heavy-hitter point queries) would drown a 6e5-row join under ~4e7
# of collision cross-terms (measured 30× overestimate). JS_W = 1024
# keeps the cross-terms the same order as the true size (2.1× measured
# at the sf0.01 oracle — deliberately NOT so wide that collisions go
# dead at test scale) while the sketch stays d×1k cells —
# statistics-sized.
JS_W = 1024


def _js_bucket(key, a, b):
    return ((a * key + b) % CMS_P) % JS_W


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate |lineitem ⋈ returned-lineitems on l_partkey| from CMS
    sketches of the two key multisets, next to the exact answer computed
    the honest way (per-key count join) — overestimate ratio and the
    no-undercount contract are the value-checked output."""
    li = load_table(spark, sf_dir, "lineitem")
    # four consumers (two sketch builds + two exact count sides) — one
    # narrow materialized base instead of four lineitem scans (the
    # per-reference re-derivation rule); at 100 TB the sketches are
    # precomputed table statistics and this query is pure sketch math
    base = li.select(F.col("l_partkey").cast("long").alias("k"),
                     (F.col("l_returnflag") == "R").alias("r")) \
        .localCheckpoint(eager=True)
    keys_a = base.select("k")
    keys_b = base.filter(F.col("r")).select("k")
    def sketch(keys, out):
        cells = keys.select("k", F.explode(_cms_rows()).alias("r")).select(
            F.col("r.d").alias("d"),
            _js_bucket(F.col("k"), F.col("r.a"), F.col("r.b")).alias("bucket"))
        return cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias(out))

    sk_a = sketch(keys_a, "ca")
    sk_b = sketch(keys_b, "cb")
    est = (sk_a.join(sk_b, ["d", "bucket"])  # absent cells contribute 0
           .groupBy("d").agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
           .agg(F.min("ip").alias("est_join_size")))
    ca = keys_a.groupBy("k").agg(F.count(F.lit(1)).alias("na"))
    cb = keys_b.groupBy("k").agg(F.count(F.lit(1)).alias("nb"))
    exact = (ca.join(cb, "k")
             .agg(F.sum(F.col("na") * F.col("nb")).alias("exact_join_size")))
    return (est.crossJoin(F.broadcast(exact)).select(
        "exact_join_size",
        "est_join_size",
        (F.col("est_join_size") >= F.col("exact_join_size"))
        .alias("never_undercounts"),
        F.round(F.col("est_join_size") / F.col("exact_join_size"), 6)
        .alias("overestimate_ratio"),
    ))


Q_JOIN_SIZE_SQL = f"""
WITH params AS (
  SELECT * FROM (VALUES {", ".join(f"({i}, {CMS_A[i]}, {CMS_B[i]})" for i in range(CMS_D))})
         AS t(d, a, b)
), keys_a AS (
  SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem
), keys_b AS (
  SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem WHERE l_returnflag = 'R'
), sk_a AS (
  SELECT d, ((a * k + b) % {CMS_P}) % {JS_W} AS bucket, count(*) AS ca
  FROM keys_a CROSS JOIN params GROUP BY 1, 2
), sk_b AS (
  SELECT d, ((a * k + b) % {CMS_P}) % {JS_W} AS bucket, count(*) AS cb
  FROM keys_b CROSS JOIN params GROUP BY 1, 2
), est AS (
  SELECT min(ip) AS est_join_size FROM (
    SELECT sa.d, sum(sa.ca * sb.cb) AS ip
    FROM sk_a sa JOIN sk_b sb USING (d, bucket)
    GROUP BY sa.d)
), exact AS (
  SELECT CAST(sum(na * nb) AS BIGINT) AS exact_join_size FROM (
    SELECT a.k, count(*) AS na FROM keys_a a GROUP BY a.k) ca
  JOIN (
    SELECT b.k, count(*) AS nb FROM keys_b b GROUP BY b.k) cb
  USING (k)
)
SELECT exact_join_size,
       CAST(est_join_size AS BIGINT) AS est_join_size,
       est_join_size >= exact_join_size AS never_undercounts,
       round(est_join_size * 1.0 / exact_join_size, 6) AS overestimate_ratio
FROM est CROSS JOIN exact
"""


# -- HyperLogLog cardinality, from scratch as relational algebra ------------
#
# Like the count-min sketch above, the HLL register table is a CONSTANT-SIZE
# mergeable relation (m rows; slices merge by max(register) per bucket) and
# every step is pinned integer/dyadic arithmetic so DuckDB rebuilds the
# IDENTICAL registers and the estimate itself is value-checked:
#   * hash = universal modular hash (no engine-specific hash function);
#   * rank = trailing-zero count via the lowest-set-bit TRICK (rest & -rest)
#     resolved through a 27-row broadcast lookup dim — no float log2, whose
#     libm rounding could differ between JVM and DuckDB;
#   * harmonic sum Σ 2^-reg is a sum of dyadic rationals with exponents
#     ≥ -(HLL_W+1) over m=64 buckets — exactly representable in a double at
#     every intermediate, hence order-independent and bit-identical;
#   * the final α·m²/S is one correctly-rounded IEEE multiply+divide.
# Spark's own approx_count_distinct (HLL++, engine-internal hash) is covered
# separately by agg_approx_distinct's accuracy-contract oracle; this one
# exposes the register-table mechanics a 100 TB pipeline would persist and
# merge across ingest batches.
HLL_M = 64     # buckets (2^6); raw-estimate relative error ≈ 1.04/√m ≈ 13 %
HLL_W = 26     # bits of hash left after the bucket index (32-bit hash, m=2^6)
# 32-bit avalanche mix: golden-ratio offset, then two xorshift+odd-multiply
# rounds (structure and constants after Wellons' public lowbias32 family,
# multipliers chosen < 2^31 so every intermediate stays below 2^63 and
# ANSI-mode BIGINT arithmetic never overflows in either engine). Two
# design points measured on this corpus: (a) a plain linear-congruential
# hash biased the trailing-zero statistic enough to overestimate
# cardinality 2× — consecutive integer keys stay correlated through one
# multiply; (b) without the additive offset, user_id = 0 is a fixed point
# of any multiplicative mix (h = 0 → rest = 0 → a permanently saturated
# rank-27 register). With offset + 2 rounds the estimates land inside the
# ~1.04/√m theoretical band (sf0.01: +6.7 %, sf0.1: −2.8 %).
HLL_OFFSET = 2654435769   # 2^32 / φ, the golden-ratio constant
HLL_MUL1 = 2146121005     # 0x7feb352d
HLL_MUL2 = 1935748503     # 0x735a2d97
# alpha_m = 0.7213 / (1 + 1.079/m) — the standard bias constant, evaluated
# here so both engines consume the same decimal literal
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# α·m² precomputed in Python so BOTH engines consume one identical double
# literal (DuckDB parses bare decimal literals as DECIMAL, which overflows
# when multiplied out in-query — and two engines multiplying separately is
# two chances to disagree)
HLL_ALPHA_MM = HLL_ALPHA * HLL_M * HLL_M
_HLL_A, _HLL_B = CMS_A[0], CMS_B[0]  # reuse a universal-hash row


def mix32(df: DataFrame, key: str = "k", out: str = "h") -> DataFrame:
    """THE shared 32-bit avalanche pipeline (golden-ratio offset + two
    xorshift-odd-multiply rounds) behind every sketch family — one
    definition so operators and engines can never desync (the constants'
    correctness is load-bearing: see the LCG-bias and zero-fixed-point
    incidents documented at HLL_OFFSET). ``key`` must already be reduced
    to the < 2^31 domain by the caller; all other columns pass through."""
    return (df
            .withColumn("_m0", (F.col(key) + HLL_OFFSET) % 4294967296)
            .withColumn("_m1", (F.expr("_m0 ^ shiftright(_m0, 16)")
                                * HLL_MUL1) % 4294967296)
            .withColumn("_m2", (F.expr("_m1 ^ shiftright(_m1, 15)")
                                * HLL_MUL2) % 4294967296)
            .withColumn(out, F.expr("_m2 ^ shiftright(_m2, 16)"))
            .drop("_m0", "_m1", "_m2"))


def mix32_sql(src: str, key: str, carry: tuple = ()) -> str:
    """DuckDB twin of ``mix32``: ``SELECT <carry...>, h FROM <src>`` with
    the identical pipeline as nested selects. ``key`` is an expression
    already reduced to < 2^31; ``src`` a table/CTE name or parenthesized
    subquery."""
    c = "".join(f"{col}, " for col in carry)
    return (f"SELECT {c}xor(m2, m2 >> 16) AS h FROM (\n"
            f"    SELECT {c}(xor(m1, m1 >> 15) * {HLL_MUL2}) % 4294967296 AS m2 FROM (\n"
            f"      SELECT {c}(xor(m0, m0 >> 16) * {HLL_MUL1}) % 4294967296 AS m1 FROM (\n"
            f"        SELECT {c}({key} + {HLL_OFFSET}) % 4294967296 AS m0 FROM {src})))")


def hll_registers(keys: DataFrame) -> DataFrame:
    """Build the dense m-row HLL register table (bucket, reg) from a
    (k: long) relation, k < 2^31. Mergeable: register tables of disjoint
    (or overlapping — HLL is insertion-idempotent) slices combine by
    max(reg) per bucket; tests/test_sketch.py proves slice-merge equals
    whole-corpus build exactly."""
    spark = keys.sparkSession
    mixed = mix32(keys)
    hashed = mixed.select(
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("rest"),
    )
    lowbit = hashed.select(
        "bucket", F.expr("rest & -rest").alias("lowbit"))
    # rank dim: lowest set bit 2^j → rank j+1; rest == 0 (lowbit 0) → W+1
    rank_dim = spark.createDataFrame(
        [(1 << j, j + 1) for j in range(HLL_W)] + [(0, HLL_W + 1)],
        "lowbit long, rank int")
    ranked = lowbit.join(F.broadcast(rank_dim), "lowbit")
    regs = ranked.groupBy("bucket").agg(F.max("rank").alias("reg"))
    spine = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    # regs is ≤ m rows BY CONSTRUCTION but Catalyst can't see that through
    # the aggregate (no stats → it planned a sort-merge join here); the
    # explicit hint keeps the spine fill a broadcast hash join
    return (spine.join(F.broadcast(regs), "bucket", "left")
            .select("bucket", F.coalesce("reg", F.lit(0)).alias("reg")))


def q_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimate over ``events`` via a from-scratch HLL
    register table, reported next to the exact count (the differential
    ground truth) and the register-table diagnostics.

    Plan: keys are NOT pre-deduplicated — HLL registers are max-
    aggregates, so duplicate keys land on identical (bucket, rank) pairs
    and the max absorbs them; the build is ONE partial-aggregated shuffle
    to m=64 rows (each scan partition emits ≤ m partial maxima — this
    map-side max collapse is exactly why HLL beats exact countDistinct at
    scale: no key-space-sized shuffle ever happens). The exact count here
    exists only as the oracle's ground truth; the spine/rank dims are
    broadcast literals.

    Small-range linear-counting correction is deliberately omitted: it
    needs ln(m/V), and libm log rounding is not guaranteed identical
    across engines — the raw estimator is closed-form deterministic.
    The output pins est_raw, the zero-register count, and the relative
    error vs exact, all to 4 decimals.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .select((F.col("user_id").cast("long") % 2147483648).alias("k")))
    full = hll_registers(ev)
    summary = full.agg(
        F.sum(F.lit(1.0)
              / F.expr("cast(shiftleft(cast(1 as bigint), reg) as double)")
              ).alias("_s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).alias("zero_registers"),
        F.max("reg").alias("max_register"),
    )
    exact = ev.agg(F.countDistinct("k").alias("exact_distinct"))
    return (summary.crossJoin(F.broadcast(exact)).select(
        "exact_distinct",
        F.round(F.lit(HLL_ALPHA_MM) / F.col("_s"), 4).alias("est_raw"),
        F.col("zero_registers").cast("long").alias("zero_registers"),
        F.col("max_register").cast("long").alias("max_register"),
        F.round((F.lit(HLL_ALPHA_MM) / F.col("_s")
                 - F.col("exact_distinct")) / F.col("exact_distinct"),
                4).alias("rel_error"),
    ))


_HLL_RANK_ROWS = ", ".join(
    f"({1 << j}, {j + 1})" for j in range(HLL_W)) + f", (0, {HLL_W + 1})"

Q_CARDINALITY_HLL_SQL = f"""
WITH keys AS (
  SELECT DISTINCT user_id % 2147483648 AS k FROM events WHERE user_id IS NOT NULL
), mixed AS (
  {mix32_sql("keys", "k")}
), hashed AS (
  SELECT h % {HLL_M} AS bucket, h // {HLL_M} AS rest FROM mixed
), rank_dim AS (
  SELECT CAST(lowbit AS BIGINT) AS lowbit, CAST(rank AS INT) AS rank
  FROM (VALUES {_HLL_RANK_ROWS}) AS t(lowbit, rank)
), ranked AS (
  SELECT h.bucket, d.rank
  FROM hashed h JOIN rank_dim d ON d.lowbit = (h.rest & -h.rest)
), regs AS (
  SELECT s.bucket, COALESCE(max(r.rank), 0) AS reg
  FROM (SELECT unnest(range(0, {HLL_M})) AS bucket) s
  LEFT JOIN ranked r ON r.bucket = s.bucket
  GROUP BY s.bucket
), summary AS (
  SELECT sum(1.0 / CAST(1 << reg AS DOUBLE)) AS s,
         sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zero_registers,
         max(reg) AS max_register
  FROM regs
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM keys) AS exact_distinct,
       round(CAST({HLL_ALPHA_MM!r} AS DOUBLE) / s, 4) AS est_raw,
       CAST(zero_registers AS BIGINT) AS zero_registers,
       CAST(max_register AS BIGINT) AS max_register,
       round((CAST({HLL_ALPHA_MM!r} AS DOUBLE) / s
              - (SELECT count(*) FROM keys))
             / (SELECT count(*) FROM keys), 4) AS rel_error
FROM summary
"""


def hll_registers_grouped(keys: DataFrame, group: str = "day") -> DataFrame:
    """Keyed HLL build: (group, k) relation → dense |groups|×m register
    table (group, bucket, reg). Same hash/rank pipeline as the global
    ``hll_registers``; the spine covers the groups PRESENT in ``keys``
    (missing groups = absent rows), which is exactly what makes per-slice
    register tables fold across slices by max(reg) — the streaming day-HLL
    store relies on that (streaming/sketch.py)."""
    spark = keys.sparkSession
    mixed = mix32(keys)
    hashed = mixed.select(
        group,
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("rest"),
    )
    rank_dim = spark.createDataFrame(
        [(1 << j, j + 1) for j in range(HLL_W)] + [(0, HLL_W + 1)],
        "lowbit long, rank int")
    ranked = (hashed.select(group, "bucket",
                            F.expr("rest & -rest").alias("lowbit"))
              .join(F.broadcast(rank_dim), "lowbit"))
    # regs is |groups|×(≤m) rows BY CONSTRUCTION — materialize it once:
    # it feeds both the spine's group list and the left join, and every
    # key contributes a register row (rank ≥ 1 always), so groups(regs) ==
    # groups(keys) — deriving the spine from regs saves a second full pass
    # over the keys relation (code-review finding, r06)
    regs = (ranked.groupBy(group, "bucket").agg(F.max("rank").alias("reg"))
            .localCheckpoint(eager=True))
    # dense |groups|×m spine so zero-registers count correctly per group;
    # both relations are groups-bounded → broadcast, never a shuffle join
    spine = regs.select(group).distinct().crossJoin(
        spark.range(HLL_M).select(F.col("id").alias("bucket")))
    return (spine.join(F.broadcast(regs), [group, "bucket"], "left")
            .select(group, "bucket",
                    F.coalesce("reg", F.lit(0)).alias("reg")))


def q_cardinality_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP distinct-user estimates via keyed HLL register tables —
    here daily active users, the form a 100 TB profile actually runs
    (distinct users per day / domain / shard) — and the proof that the
    mergeable-state shape
    survives a group key: state is |groups|×m rows, the build is ONE
    partial-aggregated shuffle keyed (group, bucket), and per-partition
    map-side max still collapses each scan task to ≤ |groups|×m partial
    rows before the exchange. Register sums Σ 1/2^reg are sums of
    dyadic terms (each exactly representable, magnitudes bounded), so
    the estimator is bit-exact on both engines regardless of summation
    order — no float-parity caveat at all.

    Same raw estimator as ``cardinality_hll`` (linear-counting correction
    omitted for cross-engine determinism, documented there); exact
    per-group counts ride along as the differential ground truth.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
          .select(F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day"),
                  (F.col("user_id").cast("long") % 2147483648).alias("k")))
    dense = hll_registers_grouped(ev, group="day")
    summary = dense.groupBy("day").agg(
        F.sum(F.lit(1.0)
              / F.expr("cast(shiftleft(cast(1 as bigint), reg) as double)")
              ).alias("_s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).alias("zero_registers"),
        F.max("reg").alias("max_register"),
    )
    exact = ev.groupBy("day").agg(
        F.countDistinct("k").alias("exact_distinct"))
    # integer outputs per the r06 ppm discipline: _s is an exact dyadic
    # sum, so ALPHA_MM/_s is bit-identical on both engines and floor() of
    # it is too — whereas round(x, 4) crosses each engine's decimal-
    # rounding code (the r05 bloom hash-fail class)
    est = F.lit(HLL_ALPHA_MM) / F.col("_s")
    return (summary.join(F.broadcast(exact), "day").select(
        "day", "exact_distinct",
        F.floor(est * 1000).cast("long").alias("est_milli"),
        F.col("zero_registers").cast("long").alias("zero_registers"),
        F.col("max_register").cast("long").alias("max_register"),
        F.floor((est - F.col("exact_distinct")) / F.col("exact_distinct")
                * 1000000).cast("long").alias("rel_error_ppm"),
    ).orderBy("day"))


Q_CARDINALITY_HLL_GROUPED_SQL = f"""
WITH keys AS (
  SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                  user_id % 2147483648 AS k
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), mixed AS (
  {mix32_sql("keys", "k", carry=("day",))}
), hashed AS (
  SELECT day, h % {HLL_M} AS bucket, h // {HLL_M} AS rest FROM mixed
), rank_dim AS (
  SELECT CAST(lowbit AS BIGINT) AS lowbit, CAST(rank AS INT) AS rank
  FROM (VALUES {_HLL_RANK_ROWS}) AS t(lowbit, rank)
), ranked AS (
  SELECT h.day, h.bucket, d.rank
  FROM hashed h JOIN rank_dim d ON d.lowbit = (h.rest & -h.rest)
), spine AS (
  SELECT t.day, s.bucket
  FROM (SELECT DISTINCT day FROM keys) t
  CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS bucket) s
), regs AS (
  SELECT sp.day, sp.bucket, COALESCE(max(r.rank), 0) AS reg
  FROM spine sp
  LEFT JOIN ranked r ON r.day = sp.day AND r.bucket = sp.bucket
  GROUP BY sp.day, sp.bucket
), summary AS (
  SELECT day,
         sum(1.0 / CAST(1 << reg AS DOUBLE)) AS s,
         sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zero_registers,
         max(reg) AS max_register
  FROM regs GROUP BY day
), exact AS (
  SELECT day, CAST(count(*) AS BIGINT) AS exact_distinct
  FROM keys GROUP BY day
)
SELECT s.day, e.exact_distinct,
       CAST(floor(CAST({HLL_ALPHA_MM!r} AS DOUBLE) / s.s * 1000) AS BIGINT)
         AS est_milli,
       CAST(s.zero_registers AS BIGINT) AS zero_registers,
       CAST(s.max_register AS BIGINT) AS max_register,
       CAST(floor((CAST({HLL_ALPHA_MM!r} AS DOUBLE) / s.s - e.exact_distinct)
                  / e.exact_distinct * 1000000) AS BIGINT) AS rel_error_ppm
FROM summary s JOIN exact e USING (day)
ORDER BY s.day
"""


# -- mergeable quantile sketch: fixed-bin histogram -------------------------
#
# The fourth mergeable-state primitive (SCALE.md §7b) after moments
# (ts_rollup_incremental), frequencies (heavy_hitters_cms), and
# cardinality (cardinality_hll): quantiles over a stream too large to
# sort. The sketch is a B-row bin-count TABLE over a fixed domain; slices
# merge by adding counts per bin (proven in-query: the histogram below is
# built from two watermark slices and merged, and the oracle computes the
# one-shot build — the hash check IS the merge-equivalence proof).
# Quantile estimates interpolate within the hit bin; error is bounded by
# the bin width, not by corpus size. Spark's own percentile()/
# approx_percentile cover the built-in path (agg_quantiles); this is the
# explicit mergeable-table form whose arithmetic DuckDB replicates
# bit-for-bit. The EXACT quantile is deliberately NOT part of the query:
# exact percentile aggregates buffer every value (the unbounded-group
# pattern the IVF M-step was purged of); the test supplies ground truth.
QH_BINS = 128
QH_QS = (0.5, 0.9, 0.99)


def q_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles over ``events.value``, built
    incrementally: the corpus splits at the last-day watermark, each
    slice bins independently (one small-keyed partial aggregation per
    slice — B=128 distinct keys, so the reduce side is bounded by config),
    and the merged sketch answers q ∈ {0.5, 0.9, 0.99}.

    Scale: bounds are a 1-row broadcast (domain discovery is one pass; a
    deployment fixes the domain a priori and skips it); each slice's
    histogram collapses map-side to ≤ B rows; the cumulative walk and
    interpolation run over the B-row sketch (broadcast joins). The raw
    values never sort and never cross a corpus-sized shuffle.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("ts", F.col("value").alias("v")))
    # DataFrame plans re-expand a subtree per reference (no CTE sharing):
    # bounds feeds both the binning pass and the scoring math, and would
    # cost one full events scan PER reference — six scans in the first
    # formulation. Materialize the 1-row bounds once; the remaining lazy
    # plan reads events exactly once (plan assert).
    bounds = ev.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.date_trunc("day", F.max("ts")).cast("timestamp_ntz").alias("_wm"),
    ).localCheckpoint(eager=True)
    tagged = ev.crossJoin(F.broadcast(bounds))
    width = (F.col("hi") - F.col("lo")) / QH_BINS
    binned = tagged.select(
        F.least(F.floor((F.col("v") - F.col("lo")) / width),
                F.lit(QH_BINS - 1)).cast("int").alias("bin"),
        # null-safe slice tag: a NULL ts must still land in A slice (the
        # delta, like any not-yet-watermarked row) — a bare `ts < _wm`
        # yields NULL and the row would vanish from BOTH conditional sums
        # while still being counted in n, skewing every quantile against
        # the ts-agnostic oracle
        F.coalesce(F.col("ts") < F.col("_wm"), F.lit(False)).alias("_base"))
    # per-slice partial counts in ONE scan + ONE keyed shuffle (conditional
    # sums), merged by adding the slice columns — the same merge-by-
    # addition contract as a two-scan union build, without the second
    # corpus pass (an earlier two-filter formulation scanned events once
    # per slice)
    hist = (binned.groupBy("bin").agg(
        F.sum(F.when(F.col("_base"), 1).otherwise(0)).alias("c_base"),
        F.sum(F.when(~F.col("_base"), 1).otherwise(0)).alias("c_delta"))
        .select("bin", (F.col("c_base") + F.col("c_delta")).alias("c")))
    from pyspark.sql.window import Window as W
    # B-row sketch: the single-partition cumulative window is over ≤128
    # rows by construction, never corpus-sized
    cum = hist.withColumn("cum", F.sum("c").over(
        W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)))
    qs = spark.createDataFrame([(q,) for q in QH_QS], "q double")
    # single reference to the sketch: the hit bin's (c, cum) ride along
    # via min_by, so the scoring never re-expands the histogram subtree
    est = (qs.crossJoin(F.broadcast(bounds.select("lo", "hi", "n")))
           .join(F.broadcast(cum), F.col("cum") >= F.col("q") * F.col("n"))
           .groupBy("q", "lo", "hi", "n")
           .agg(F.min("bin").alias("qbin"),
                F.min_by(F.struct("c", "cum"), "bin").alias("bc")))
    w = (F.col("hi") - F.col("lo")) / QH_BINS
    est_value = (F.col("lo") + w * (
        F.col("qbin")
        + (F.col("q") * F.col("n") - (F.col("bc.cum") - F.col("bc.c")))
        / F.col("bc.c")))
    # exact-integer companions (r08 verdict #1: defuse the round(double)
    # hash-risk class): qbin/cum/c/n are BIGINT and, with the raw-parquet
    # lo/hi, fully determine est_value — a future last-ulp hash flake on
    # est_value downgrades to dropping that one column, not an incident
    return est.select(
        "q",
        F.col("qbin").cast("long").alias("qbin"),
        F.col("bc.cum").cast("long").alias("cum_at_bin"),
        F.col("bc.c").cast("long").alias("c_at_bin"),
        F.col("lo"),
        F.col("hi"),
        F.round(est_value, 4).alias("est_value"),
        F.col("n").alias("n_total"),
    ).orderBy("q")


Q_QUANTILE_SKETCH_SQL = f"""
WITH vals AS (
  SELECT value AS v FROM events WHERE value IS NOT NULL
), bounds AS (
  SELECT min(v) AS lo, max(v) AS hi, count(*) AS n FROM vals
), binned AS (
  SELECT CAST(least(floor((v - lo) / ((hi - lo) / {QH_BINS})),
                    {QH_BINS - 1}) AS INT) AS bin
  FROM vals CROSS JOIN bounds
), hist AS (
  SELECT bin, count(*) AS c FROM binned GROUP BY bin
), cum AS (
  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum FROM hist
), qs AS (
  SELECT unnest([{", ".join(f"CAST({q!r} AS DOUBLE)" for q in QH_QS)}]) AS q
), qbin AS (
  SELECT q, min(bin) AS qbin
  FROM qs CROSS JOIN cum CROSS JOIN bounds
  WHERE cum >= q * n
  GROUP BY q
)
SELECT qb.q,
       CAST(qb.qbin AS BIGINT) AS qbin,
       CAST(cm.cum AS BIGINT) AS cum_at_bin,
       CAST(cm.c AS BIGINT) AS c_at_bin,
       b.lo, b.hi,
       round(b.lo + (b.hi - b.lo) / {QH_BINS}
             * (qb.qbin + (qb.q * b.n - (cm.cum - cm.c)) / cm.c), 4)
         AS est_value,
       CAST(b.n AS BIGINT) AS n_total
FROM qbin qb
JOIN cum cm ON cm.bin = qb.qbin
CROSS JOIN bounds b
ORDER BY q
"""


QHG_QS = (0.5, 0.9)   # per-group quantiles (fewer than the global op —
#                       |days|×|qs| output rows)


def q_quantile_sketch_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DAY histogram-sketch quantiles over ``events.value`` — the
    keyed form of ``quantile_sketch_merge``, completing the grouped-
    mergeable-sketch family alongside ``cardinality_hll_grouped`` (daily
    p50/p90 of a metric is the profile a 100 TB pipeline actually stores
    per partition).

    Bin edges are GLOBAL (one 1-row broadcast bounds pass), deliberately
    shared across groups: identical edges are what make per-day
    histograms mergeable ACROSS days (week rollup = cell-wise sum of day
    histograms; proven in tests/test_sketch.py) — per-day edges would
    trade that for marginally tighter bins and lose the rollup algebra.

    Scale: ONE events scan feeds the (day, bin) counts (map-side combine
    collapses each task to ≤ |days|×B partial rows before the single
    keyed shuffle); per-day n comes from the B-row histograms, never a
    second scan; cumulative walk + interpolation run on |days|×B rows
    (windows over ≤ B rows per partition key; scoring joins broadcast).
    Raw values never sort and never cross a corpus-sized shuffle — group
    key or not.

    ACCEPTED RISK (r08 advisor note, shared with quantile_sketch_merge):
    ``est_value`` is round(double, 4) — the output shape the r05
    bloom-prune incident flagged as a last-ulp divergence class under the
    bit-exact driver hash. It is kept here because (a) both engines
    evaluate the IDENTICAL expression tree (lo + w*(qbin + (q*n − cumprev)
    / c)) over identical doubles in the same order, i.e. the
    "identical strict fold" safe class, and (b) the alternative — an
    integer floor-ppm encoding — must still floor a computed DOUBLE
    (events.value is float data; the interpolation cannot be rationalized),
    and floor AMPLIFIES a last-ulp difference to ±1 near bin boundaries,
    which is strictly worse than round's half-ulp window. Driver-green
    (bit-exact) r07. Since r09 the exact-integer companions
    (qbin/cum_at_bin/c_at_bin/n) and raw-parquet lo/hi ship IN the
    output, so a future hash-fail is a one-line est_value column drop.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day"),
                  F.col("value").alias("v")))
    bounds = ev.agg(F.min("v").alias("lo"), F.max("v").alias("hi")) \
        .localCheckpoint(eager=True)
    width = (F.col("hi") - F.col("lo")) / QH_BINS
    # |days|×B relation, referenced three times (cum walk, per-day n,
    # scoring join) — checkpoint so the events scan runs exactly once
    hist = (ev.crossJoin(F.broadcast(bounds))
            .select("day",
                    F.least(F.floor((F.col("v") - F.col("lo")) / width),
                            F.lit(QH_BINS - 1)).cast("int").alias("bin"))
            .groupBy("day", "bin").agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=True))
    from pyspark.sql.window import Window as W
    cum = (hist.withColumn("cum", F.sum("c").over(
        W.partitionBy("day").orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .select(F.col("day").alias("cday"), "bin", "c", "cum"))
    nd = hist.groupBy("day").agg(F.sum("c").alias("n"))
    qs = spark.createDataFrame([(q,) for q in QHG_QS], "q double")
    est = (qs.crossJoin(F.broadcast(nd))
           .join(F.broadcast(cum),
                 (F.col("cday") == F.col("day"))
                 & (F.col("cum") >= F.col("q") * F.col("n")))
           .groupBy("day", "q", "n")
           .agg(F.min("bin").alias("qbin"),
                F.min_by(F.struct("c", "cum"), "bin").alias("bc"))
           .crossJoin(F.broadcast(bounds)))
    w = (F.col("hi") - F.col("lo")) / QH_BINS
    est_value = (F.col("lo") + w * (
        F.col("qbin")
        + (F.col("q") * F.col("n") - (F.col("bc.cum") - F.col("bc.c")))
        / F.col("bc.c")))
    # exact-integer companions — same contract as quantile_sketch_merge:
    # (qbin, cum, c, n) + raw-parquet (lo, hi) determine est_value exactly
    return est.select(
        "day", "q",
        F.col("qbin").cast("long").alias("qbin"),
        F.col("bc.cum").cast("long").alias("cum_at_bin"),
        F.col("bc.c").cast("long").alias("c_at_bin"),
        F.col("lo"),
        F.col("hi"),
        F.round(est_value, 4).alias("est_value"),
        F.col("n").alias("n_day"),
    ).orderBy("day", "q")


Q_QUANTILE_SKETCH_GROUPED_SQL = f"""
WITH vals AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
), bounds AS (
  SELECT min(v) AS lo, max(v) AS hi FROM vals
), hist AS MATERIALIZED (
  SELECT day, CAST(least(floor((v - lo) / ((hi - lo) / {QH_BINS})),
                         {QH_BINS - 1}) AS INT) AS bin, count(*) AS c
  FROM vals CROSS JOIN bounds GROUP BY 1, 2
), cum AS (
  SELECT day AS cday, bin, c,
         sum(c) OVER (PARTITION BY day ORDER BY bin) AS cum
  FROM hist
), nd AS (
  SELECT day, sum(c) AS n FROM hist GROUP BY day
), qs AS (
  SELECT unnest([{", ".join(f"CAST({q!r} AS DOUBLE)" for q in QHG_QS)}]) AS q
), qbin AS (
  SELECT day, q, min(bin) AS qbin, any_value(n) AS n
  FROM qs CROSS JOIN nd JOIN cum ON cday = day AND cum >= q * n
  GROUP BY day, q
)
SELECT qb.day, qb.q,
       CAST(qb.qbin AS BIGINT) AS qbin,
       CAST(cm.cum AS BIGINT) AS cum_at_bin,
       CAST(cm.c AS BIGINT) AS c_at_bin,
       b.lo, b.hi,
       round(b.lo + (b.hi - b.lo) / {QH_BINS}
             * (qb.qbin + (qb.q * qb.n - (cm.cum - cm.c)) / cm.c), 4)
         AS est_value,
       CAST(qb.n AS BIGINT) AS n_day
FROM qbin qb
JOIN cum cm ON cm.cday = qb.day AND cm.bin = qb.qbin
CROSS JOIN bounds b
ORDER BY day, q
"""


# --- histogram drift audit: total-variation distance between slices ---------
# The data-drift gate a production pipeline runs before promoting a new
# ingest slice: bin BOTH slices on the SAME global edges and compare the
# distributions. Distance is TOTAL VARIATION (half the L1 between the
# normalized histograms) rather than PSI/KL because TV needs no logarithm —
# cross-multiplying the per-bin counts (|n_base·N_cur − n_cur·N_base|)
# keeps every intermediate an exact BIGINT, so both engines agree to the
# last bit with no float caveat. Overflow: per-bin products n·T stay < 2^63
# while slice counts stay < ~3e9 rows, but the ppm SCALING step (Σdev·1e6,
# with Σdev ≤ 2·tb·tc) would overflow ~1000× sooner — so the ppm divisions
# first downshift numerator and denominator by a COMMON power-of-two
# divisor chosen by a deterministic CASE on the denominator's magnitude
# (``_ppm_downshift_sql``). The divisor is 1 (exact) at every realistic
# scale and degrades to a ≤2^-26-relative floor approximation — identically
# on both engines, since both run the same integer CASE + div — only past
# tb·tc ≈ 2^41 (code-review finding, r07).
DRIFT_SPLIT_DAYS = 15   # base slice = first 15 days from the corpus min


def _ppm_downshift_sql(den: str) -> str:
    """Common power-of-two divisor keeping ``(num div d) * 1000000`` under
    2^62 for any num ≤ den: den div d < 2^42 by construction. Engine-
    portable (pure integer CASE + floor-div, identical semantics in Spark
    and DuckDB)."""
    return (f"(CASE WHEN {den} < {1 << 42} THEN 1 "
            f"WHEN {den} < {1 << 50} THEN 256 "
            f"WHEN {den} < {1 << 58} THEN 65536 ELSE 16777216 END)")


def q_drift_histogram_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the first-``DRIFT_SPLIT_DAYS`` slice and
    the rest of ``events.value``: shared-edge histograms, exact-integer
    total-variation distance in ppm, plus the worst-deviating bin.

    Scale: ONE corpus scan builds both slice histograms (conditional sums
    keyed by bin — map-side combined to ≤ B partial rows per task); the
    1-row bounds/watermark aggregate is a broadcast; every downstream
    relation is B rows. Shared global edges are what make the comparison
    meaningful AND mergeable (per-shard slice histograms add cell-wise
    before the audit — same algebra as quantile_sketch_grouped).
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select("ts", F.col("value").alias("v")))
    bounds = ev.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.date_add(F.date_trunc("day", F.min("ts")).cast("date"),
                   DRIFT_SPLIT_DAYS).alias("_split"),
    ).localCheckpoint(eager=True)
    width = (F.col("hi") - F.col("lo")) / QH_BINS
    hist = (ev.crossJoin(F.broadcast(bounds))
            .select(F.least(F.floor((F.col("v") - F.col("lo")) / width),
                            F.lit(QH_BINS - 1)).cast("int").alias("bin"),
                    (F.col("ts") < F.col("_split").cast("timestamp_ntz"))
                    .alias("_base"))
            .groupBy("bin").agg(
                F.sum(F.when(F.col("_base"), 1).otherwise(0)).alias("nb"),
                F.sum(F.when(~F.col("_base"), 1).otherwise(0)).alias("nc"))
            .localCheckpoint(eager=True))
    tot = hist.agg(F.sum("nb").alias("tb"), F.sum("nc").alias("tc"))
    dev = (hist.crossJoin(F.broadcast(tot))
           .select("bin", "nb", "nc", "tb", "tc",
                   F.abs(F.col("nb") * F.col("tc")
                         - F.col("nc") * F.col("tb")).alias("dev")))
    agg = (dev.groupBy("tb", "tc")
           .agg(F.sum("dev").alias("sumdev"),
                F.max(F.struct(F.col("dev"), (-F.col("bin")).alias("nb")))
                .alias("worst")))
    pd_tv = _ppm_downshift_sql(d_tv := "(2 * tb * tc)")
    pd_wb = _ppm_downshift_sql(d_wb := "(tb * tc)")
    return agg.select(
        F.col("tb").cast("long").alias("n_base"),
        F.col("tc").cast("long").alias("n_current"),
        F.expr(f"(sumdev div {pd_tv}) * 1000000 div ({d_tv} div {pd_tv})")
        .alias("tv_ppm"),
        (-F.col("worst.nb")).cast("long").alias("worst_bin"),
        F.expr(f"(worst.dev div {pd_wb}) * 1000000 div ({d_wb} div {pd_wb})")
        .alias("worst_bin_ppm"),
    )


Q_DRIFT_TV_SQL = f"""
WITH vals AS (
  SELECT ts, value AS v FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
), bounds AS (
  SELECT min(v) AS lo, max(v) AS hi,
         date_trunc('day', min(ts)) + INTERVAL {DRIFT_SPLIT_DAYS} DAY AS split
  FROM vals
), hist AS (
  SELECT CAST(least(floor((v - lo) / ((hi - lo) / {QH_BINS})),
                    {QH_BINS - 1}) AS INT) AS bin,
         sum(CASE WHEN ts < split THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN ts >= split THEN 1 ELSE 0 END) AS nc
  FROM vals CROSS JOIN bounds GROUP BY 1
), tot AS (
  SELECT CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc FROM hist
), dev AS MATERIALIZED (
  SELECT bin, abs(CAST(nb AS BIGINT) * tc - CAST(nc AS BIGINT) * tb) AS dev
  FROM hist CROSS JOIN tot
), mx AS (SELECT max(dev) AS mdev FROM dev)
SELECT tb AS n_base, tc AS n_current,
       ((SELECT CAST(sum(dev) AS BIGINT) FROM dev) // {_ppm_downshift_sql("(2 * tb * tc)")})
         * 1000000 // ((2 * tb * tc) // {_ppm_downshift_sql("(2 * tb * tc)")}) AS tv_ppm,
       (SELECT CAST(min(bin) AS BIGINT) FROM dev, mx WHERE dev = mdev)
         AS worst_bin,
       ((SELECT CAST(mdev AS BIGINT) FROM mx) // {_ppm_downshift_sql("(tb * tc)")})
         * 1000000 // ((tb * tc) // {_ppm_downshift_sql("(tb * tc)")}) AS worst_bin_ppm
FROM tot
"""


# --- KMV / theta sketch: distinct sketches that support SET OPERATIONS ------
# HLL registers merge by max (union only); a KMV ("k minimum values" /
# theta) sketch — the K smallest distinct hash values of a set — supports
# INTERSECTION and arbitrary set expressions: keep each set's K-min sample,
# cut both at theta = min(theta_A, theta_B), and the common survivors form a
# uniform sample of A∩B at rate theta/M. That's the audience-overlap
# estimate (users in both cohorts, docs in both snapshots) a 100 TB profile
# cannot compute exactly and an HLL structurally cannot answer.
# All arithmetic is INTEGER: hashes are the shared avalanche mix, the K-th
# minimum is an exact order statistic, and the estimators are BIGINT
# floor-divisions ((K-1)·M·1000 // h_(K)) — no float anywhere, so
# cross-engine parity is unconditional.
KMV_K = 256            # sketch size; relative error ~ 1/sqrt(K-1) ≈ 6.3 %
KMV_M = 4294967296     # hash space (the mix is 32-bit)
_KMV_SALTS = 64        # phase-1 salt buckets for the distributed K-min
_KMV_EST_NUM = (KMV_K - 1) * KMV_M * 1000   # (K-1)·M·1000 ≈ 1.1e15 < 2^63


def q_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta sketches over two order cohorts — A = urgent/high
    priority, B = high-value (> 150k) — estimating |A|, |B|, |A∩B| and
    |A∪B| next to their exact counts.

    Distributed K-min is TWO bounded windows, not one global sort: phase
    1 ranks within (set, h % {salts}) salt buckets and keeps K per bucket
    (balanced partitions, any global top-K necessarily survives its
    bucket's top-K), phase 2 ranks the ≤ sets×salts×K survivors — a
    relation bounded by CONFIG, not by data — to the final K. Survivors
    are checkpointed once; every sketch output (thresholds, intersection
    count, union sketch) derives from that ≤ 32k-row state, so the final
    plan touches parquet only for the exact-count ground truth (plan
    bound: 1 scan).

    Estimators (all BIGINT): est(S) = (K−1)·M·1000 // h_(K);
    est(A∩B) = |{h ∈ sk_A ∩ sk_B : h < θ}|·M·1000 // θ with
    θ = min(h_(K)^A, h_(K)^B); union via the K smallest of the merged
    samples. Accuracy band (~1/√(K−1)) asserted in tests/test_sketch.py.
    """
    from pyspark.sql.window import Window as W

    ords = load_table(spark, sf_dir, "orders")
    base = ords.select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("in_a"),
        (F.col("o_totalprice") > 150000.0).alias("in_b"))
    mixed = mix32(base.withColumn("_kr", F.col("k") % 2147483648), key="_kr") \
        .drop("_kr")
    tagged = (mixed
              .select("h", F.explode(F.array(
                  F.when(F.col("in_a"), F.lit("a")),
                  F.when(F.col("in_b"), F.lit("b")))).alias("s"))
              .filter(F.col("s").isNotNull())
              .select("s", "h").distinct())
    w1 = W.partitionBy("s", F.col("h") % _KMV_SALTS).orderBy("h")
    surv = (tagged.withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") <= KMV_K).drop("rn"))
    w2 = W.partitionBy("s").orderBy("h")
    # checkpoint the FINAL ≤ sets×K sketch, not the phase-1 survivors: the
    # sketch feeds six consumers (two thresholds, both intersection sides,
    # the union merge twice) and Catalyst re-expands the window chain per
    # reference — materializing 512 rows once keeps the whole set-algebra
    # tail on sketch-sized relations (scan-multiplicity discipline)
    sk = (surv.withColumn("rn", F.row_number().over(w2))
          .filter(F.col("rn") <= KMV_K).drop("rn")
          .localCheckpoint(eager=True))
    ska, skb = sk.filter(F.col("s") == "a"), sk.filter(F.col("s") == "b")
    tha = ska.agg(F.max("h").alias("tha"))
    thb = skb.agg(F.max("h").alias("thb"))
    theta = (tha.crossJoin(F.broadcast(thb))
             .select("tha", "thb", F.least("tha", "thb").alias("theta")))
    common = (ska.select("h").join(skb.select("h"), "h")
              .crossJoin(F.broadcast(theta.select("theta")))
              .filter(F.col("h") < F.col("theta"))
              .agg(F.count(F.lit(1)).alias("n_common")))
    sku = (ska.select("h").union(skb.select("h")).distinct()
           .withColumn("rn", F.row_number().over(W.orderBy("h")))
           .filter(F.col("rn") <= KMV_K))
    thu = sku.agg(F.max("h").alias("thu"))
    exact = base.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("exact_a"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).alias("exact_b"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
        .alias("exact_inter"),
        F.sum(F.when(F.col("in_a") | F.col("in_b"), 1).otherwise(0))
        .alias("exact_union"))
    return (exact
            .crossJoin(F.broadcast(theta))
            .crossJoin(F.broadcast(common))
            .crossJoin(F.broadcast(thu))
            .select(
                F.col("exact_a").cast("long").alias("exact_a"),
                F.col("exact_b").cast("long").alias("exact_b"),
                F.col("exact_inter").cast("long").alias("exact_inter"),
                F.col("exact_union").cast("long").alias("exact_union"),
                F.expr(f"{_KMV_EST_NUM} div tha").alias("est_a_milli"),
                F.expr(f"{_KMV_EST_NUM} div thb").alias("est_b_milli"),
                F.expr(f"cast(n_common * {KMV_M} as bigint) * 1000 div theta")
                .alias("est_inter_milli"),
                F.expr(f"{_KMV_EST_NUM} div thu").alias("est_union_milli"),
                F.col("theta").cast("long").alias("theta_hash")))


Q_THETA_SKETCH_SQL = f"""
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         o_orderpriority IN ('1-URGENT', '2-HIGH') AS in_a,
         o_totalprice > 150000.0 AS in_b
  FROM orders
), mixed AS (
  {mix32_sql("base", "(k % 2147483648)", carry=("in_a", "in_b"))}
), tagged AS (
  SELECT DISTINCT s, h FROM (
    SELECT h, unnest([CASE WHEN in_a THEN 'a' END,
                      CASE WHEN in_b THEN 'b' END]) AS s
    FROM mixed)
  WHERE s IS NOT NULL
), sk AS MATERIALIZED (
  SELECT s, h FROM (
    SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rn
    FROM tagged)
  WHERE rn <= {KMV_K}
), tha AS (SELECT max(h) AS tha FROM sk WHERE s = 'a'),
thb AS (SELECT max(h) AS thb FROM sk WHERE s = 'b'),
theta AS (SELECT tha, thb, least(tha, thb) AS theta FROM tha, thb),
common AS (
  SELECT count(*) AS n_common
  FROM (SELECT h FROM sk WHERE s = 'a') a
  JOIN (SELECT h FROM sk WHERE s = 'b') b USING (h)
  CROSS JOIN theta
  WHERE h < theta
), sku AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM sk))
  WHERE rn <= {KMV_K}
), thu AS (SELECT max(h) AS thu FROM sku),
exact AS (
  SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS exact_a,
         CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS exact_b,
         CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter,
         CAST(sum(CASE WHEN in_a OR in_b THEN 1 ELSE 0 END) AS BIGINT) AS exact_union
  FROM base
)
SELECT exact_a, exact_b, exact_inter, exact_union,
       {_KMV_EST_NUM} // tha AS est_a_milli,
       {_KMV_EST_NUM} // thb AS est_b_milli,
       CAST(n_common * {KMV_M} AS BIGINT) * 1000 // theta AS est_inter_milli,
       {_KMV_EST_NUM} // thu AS est_union_milli,
       CAST(theta AS BIGINT) AS theta_hash
FROM exact, theta, common, thu
"""


# --- Bloom-filter runtime join pruning --------------------------------------
# The runtime-filter / semi-join-reduction pattern: build a fixed-size bloom
# filter from the FILTERED dim-key set, broadcast it, and gate fact rows
# before they ever reach the join shuffle. At 100 TB this is the difference
# between shuffling the whole fact table and shuffling the ~segment-sized
# slice of it — Spark's own runtime filters (spark.sql.optimizer.
# runtimeFilter.bloomFilter.enabled) do exactly this inside Catalyst; the
# operator exposes the mechanics (and proves zero false negatives) with
# engine-portable arithmetic so DuckDB rebuilds the identical filter.
BLOOM_M = 1024          # filter bits (16 BIGINT words) — fixed size, mergeable
BLOOM_WORDS = -(-BLOOM_M // 63)  # 63 payload bits per word: bit 63 is
# never set, because DuckDB raises on the signed-overflow shift 1<<63
BLOOM_K = 3             # hash functions
# universal-hash rows ((a*k + b) % P) % M, same family as the CMS above;
# multipliers < 2^31 keep a*key below 2^63 for any 32-bit key (ANSI-safe)
BLOOM_A = (1610612741, 805306457, 402653189)
BLOOM_B = (15485867, 32452867, 49979693)
# dim predicate: BUILDING-segment customers with high balance (~2% of the
# dim) — selective enough that bloom pruning visibly shrinks the fact side
BLOOM_SEG = "BUILDING"
BLOOM_BAL = 7500.0


def _bloom_rows():
    return F.array(*[
        F.struct(F.lit(BLOOM_A[i]).alias("a"), F.lit(BLOOM_B[i]).alias("b"))
        for i in range(BLOOM_K)
    ])


def _bloom_pos(key, a, b):
    return ((a * key + b) % CMS_P) % BLOOM_M


def q_join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated semi-join reduction of ``orders`` against a filtered
    ``customer`` slice, reported as a 1-row pruning audit.

    Build: filtered dim keys × K hash rows → bit positions → bit_or into
    BLOOM_WORDS 64-bit words (a constant-size, mergeable partial agg — the
    same map-side-combine shape as the CMS/HLL register builds), assembled
    into ONE array row and broadcast. Probe: each fact row tests its K
    positions against the broadcast words — scan-local, no shuffle, no
    explode. The true-match flag comes from a broadcast left join against
    the dim keys, so one pass over the fact side yields both flags and the
    audit aggregates them.

    Output proves the filter contract: ``n_missed`` (true matches that
    failed the bloom gate) is structurally 0 — a bloom filter has no false
    negatives — and ``fp_rate_ppm`` lands near the (1-e^{-kn/m})^k
    textbook rate. At 100 TB the gate precedes the join shuffle, so
    ``prune_ppm`` of the fact bytes never leave the mappers. Both ratios
    are integer parts-per-million (BIGINT floor division) so the driver's
    bit-exact canonicalizer sees identical cells on both engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders", widen=True)
    # referenced 3× (filter build, n_keys, true-match join) — materialize
    # the tiny filtered slice once or each reference re-scans customer
    dimkeys = (cust.filter((F.col("c_mktsegment") == BLOOM_SEG)
                           & (F.col("c_acctbal") > BLOOM_BAL))
               .select(F.col("c_custkey").alias("k")).distinct()
               .localCheckpoint(eager=True))
    pos = (dimkeys.select(F.explode(_bloom_rows()).alias("r"), "k")
           .select(_bloom_pos(F.col("k"), F.col("r.a"), F.col("r.b")).alias("pos"))
           .distinct())
    words = (pos.groupBy(F.expr("pos div 63").alias("word_idx"))
             .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT)))")
                  .alias("word")))
    spine = spark.range(BLOOM_WORDS).select(F.col("id").alias("word_idx"))
    dense = (spine.join(F.broadcast(words), "word_idx", "left")
             .select("word_idx", F.coalesce("word", F.lit(0).cast("long")).alias("word")))
    filt = dense.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("word_idx", "word"))),
                    lambda s: s["word"]).alias("bloom"),
        F.sum(F.bit_count("word")).alias("bits_set"),
    )
    n_keys = dimkeys.agg(F.count(F.lit(1)).alias("n_keys"))

    # membership test: ((bloom[pos div 63 + 1] >> (pos % 63)) & 1) = 1 for
    # every hash row — expressed once per row via expr so the shift amount
    # can be a column
    probe = orders.crossJoin(F.broadcast(filt))
    passed = F.lit(True)
    for i in range(BLOOM_K):
        p = _bloom_pos(F.col("o_custkey"), F.lit(BLOOM_A[i]), F.lit(BLOOM_B[i]))
        probe = probe.withColumn(f"_p{i}", p)
        passed = passed & (
            F.expr(f"(element_at(bloom, CAST(_p{i} div 63 AS INT) + 1) "
                   f">> CAST(_p{i} % 63 AS INT)) & 1") == 1)
    flagged = (probe.withColumn("pass_bloom", passed)
               .join(F.broadcast(dimkeys),
                     F.col("o_custkey") == F.col("k"), "left")
               .withColumn("is_true", F.col("k").isNotNull()))
    audit = flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("pass_bloom").cast("long")).alias("n_pass"),
        F.sum(F.col("is_true").cast("long")).alias("n_true"),
        F.sum((F.col("pass_bloom") & ~F.col("is_true")).cast("long")).alias("n_false_pos"),
        F.sum((F.col("is_true") & ~F.col("pass_bloom")).cast("long")).alias("n_missed"),
        F.max("bits_set").alias("bits_set"),
    )
    return (audit.crossJoin(F.broadcast(n_keys)).select(
        F.lit(BLOOM_M).alias("m_bits"),
        F.lit(BLOOM_K).alias("k_hashes"),
        "n_keys", "bits_set", "n_probe", "n_pass", "n_true",
        "n_false_pos", "n_missed",
        # ratios as integer parts-per-million via BIGINT floor division —
        # r05 driver hash-fail was a last-ulp double divergence between
        # Spark's and DuckDB's round(); integer arithmetic is bit-exact on
        # both engines by construction (CLAUDE.md float-parity discipline)
        F.expr("(n_false_pos * 1000000L) div greatest(n_probe - n_true, 1L)")
        .alias("fp_rate_ppm"),
        F.expr("((n_probe - n_pass) * 1000000L) div n_probe")
        .alias("prune_ppm"),
    ))


def _bloom_sql() -> str:
    params = ", ".join(f"({BLOOM_A[i]}, {BLOOM_B[i]})" for i in range(BLOOM_K))
    return f"""
WITH dimkeys AS (
  SELECT DISTINCT c_custkey AS k FROM customer
  WHERE c_mktsegment = '{BLOOM_SEG}' AND c_acctbal > {BLOOM_BAL}
), params AS (
  SELECT * FROM (VALUES {params}) t(a, b)
), pos AS (
  SELECT DISTINCT ((a * k + b) % {CMS_P}) % {BLOOM_M} AS pos
  FROM dimkeys CROSS JOIN params
), words AS (
  SELECT pos // 63 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word
  FROM pos GROUP BY 1
), probe_pos AS (
  SELECT o.o_orderkey AS rid, o.o_custkey,
         ((p.a * o.o_custkey + p.b) % {CMS_P}) % {BLOOM_M} AS pos
  FROM orders o CROSS JOIN params p
), checks AS (
  SELECT pp.rid, pp.o_custkey,
         bool_and((coalesce(w.word, 0) >> CAST(pp.pos % 63 AS INT)) & 1 = 1)
           AS pass_bloom
  FROM probe_pos pp
  LEFT JOIN words w ON w.word_idx = pp.pos // 63
  GROUP BY pp.rid, pp.o_custkey
), flagged AS (
  SELECT o_custkey, pass_bloom,
         o_custkey IN (SELECT k FROM dimkeys) AS is_true
  FROM checks
)
SELECT {BLOOM_M} AS m_bits,
       {BLOOM_K} AS k_hashes,
       (SELECT count(*) FROM dimkeys) AS n_keys,
       (SELECT CAST(sum(bit_count(word)) AS BIGINT) FROM words) AS bits_set,
       count(*) AS n_probe,
       CAST(sum(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN pass_bloom AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(sum(CASE WHEN is_true AND NOT pass_bloom THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
       CAST(sum(CASE WHEN pass_bloom AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // greatest(count(*) - CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT), 1) AS fp_rate_ppm,
       (count(*) - CAST(sum(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT)) * 1000000
             // count(*) AS prune_ppm
FROM flagged
"""


QUERIES = {
    "profile_columns": q_profile_columns,
    "dq_audit": q_dq_audit,
    "zorder_layout": q_zorder_layout,
    "heavy_hitters_cms": q_heavy_hitters_cms,
    "heavy_hitters_cms_grouped": q_heavy_hitters_cms_grouped,
    "cardinality_hll": q_cardinality_hll,
    "cardinality_hll_grouped": q_cardinality_hll_grouped,
    "quantile_sketch_merge": q_quantile_sketch_merge,
    "quantile_sketch_grouped": q_quantile_sketch_grouped,
    "theta_sketch_setops": q_theta_sketch_setops,
    "drift_histogram_tv": q_drift_histogram_tv,
    "join_bloom_prune": q_join_bloom_prune,
    "join_size_estimate": q_join_size_estimate,
}

ORACLE = {
    "profile_columns": Q_PROFILE_SQL,
    "dq_audit": Q_DQ_AUDIT_SQL,
    "zorder_layout": Q_ZORDER_SQL,
    "heavy_hitters_cms": Q_HEAVY_HITTERS_SQL,
    "heavy_hitters_cms_grouped": Q_HEAVY_HITTERS_GROUPED_SQL,
    "cardinality_hll": Q_CARDINALITY_HLL_SQL,
    "cardinality_hll_grouped": Q_CARDINALITY_HLL_GROUPED_SQL,
    "quantile_sketch_merge": Q_QUANTILE_SKETCH_SQL,
    "quantile_sketch_grouped": Q_QUANTILE_SKETCH_GROUPED_SQL,
    "theta_sketch_setops": Q_THETA_SKETCH_SQL,
    "drift_histogram_tv": Q_DRIFT_TV_SQL,
    "join_bloom_prune": _bloom_sql(),
    "join_size_estimate": Q_JOIN_SIZE_SQL,
}
