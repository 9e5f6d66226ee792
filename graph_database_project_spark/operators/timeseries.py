"""Time-series operators over the ``events`` hypertable: multi-resolution
rollup and gap-fill with forward-fill interpolation.

These are the batch "hypertable" operations (continuous-aggregate rollup,
time_bucket_gapfill + locf in TimescaleDB terms) a telemetry or
training-data pipeline runs over an append-only event stream. The reference
has no time-series surface (its Neo4j graph is static bulletins); these
extend the engine the same way the dedup/similarity family does — Spark
built-ins only, no UDFs.

Parity discipline follows operators/relational.py: identical aliases both
sides, stringified timestamps, rounded doubles, BIGINT casts for DuckDB
integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table

BUCKET_S = 900  # 15-minute base resolution


def _b15(ts_col: str = "ts"):
    """Epoch-aligned 15-minute bucket as timestamp_ntz (matches the
    oracle's make_timestamp(floor(epoch/900)*900) arithmetic exactly)."""
    return F.timestamp_seconds(
        (F.floor(F.unix_timestamp(ts_col) / BUCKET_S) * BUCKET_S).cast("long")
    ).cast("timestamp_ntz")


def q_ts_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: per event_type counts and
    value sums at 15-minute, hourly, daily, and per-type-total resolution —
    in ONE aggregation.

    The naive cascade (agg 15-min, re-agg to hour, re-agg to day) plans the
    finer level once per resolution (or needs an explicit persist barrier);
    expressed as ``GROUP BY event_type, ROLLUP(d, h, b15)`` (grouping sets)
    Catalyst plans a single Expand + ONE partial-aggregated shuffle that
    produces every level at once — the declarative form of the
    continuous-aggregate cascade.

    Scale: one shuffle keyed by the grouping-set tuple; Expand multiplies
    rows 4x BEFORE the partial aggregate, but map-side combine collapses
    them within each scan partition, so what crosses the wire is ~4x the
    distinct bucket count, not 4x the event count. At 100 TB the hourly and
    daily levels would additionally be persisted as materialized rollups
    refreshed per ingest batch; the query shape stays this one.
    """
    ev = load_table(spark, sf_dir, "events")
    buck = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("d"),
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"),
        _b15().alias("b15"),
        "value",
    )
    agg = buck.groupingSets(
        [
            ["event_type", "d", "h", "b15"],
            ["event_type", "d", "h"],
            ["event_type", "d"],
            ["event_type"],
        ],
        "event_type", "d", "h", "b15",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.grouping("b15").alias("_gb"),
        F.grouping("h").alias("_gh"),
        F.grouping("d").alias("_gd"),
    )
    resolution = (
        F.when(F.col("_gb") == 0, F.lit("15m"))
        .when(F.col("_gh") == 0, F.lit("1h"))
        .when(F.col("_gd") == 0, F.lit("1d"))
        .otherwise(F.lit("total"))
    )
    bucket_start = F.date_format(
        F.coalesce("b15", "h", "d"), "yyyy-MM-dd HH:mm:ss")
    return agg.select(
        resolution.alias("resolution"),
        F.col("event_type"),
        bucket_start.alias("bucket_start"),  # NULL on the 'total' level
        F.col("n_events"),
        F.col("sum_value"),
    )


Q_TS_ROLLUP_SQL = f"""
WITH buck AS (
  SELECT event_type,
         date_trunc('day', ts)  AS d,
         date_trunc('hour', ts) AS h,
         make_timestamp(CAST(floor(epoch(ts) / {BUCKET_S}) * {BUCKET_S} AS BIGINT)
                        * 1000000) AS b15,
         value
  FROM events
)
SELECT CASE WHEN grouping(b15) = 0 THEN '15m'
            WHEN grouping(h)   = 0 THEN '1h'
            WHEN grouping(d)   = 0 THEN '1d'
            ELSE 'total' END AS resolution,
       event_type,
       strftime(coalesce(b15, h, d), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       CAST(count(*) AS BIGINT)    AS n_events,
       round(sum(value), 6)        AS sum_value
FROM buck
GROUP BY event_type, ROLLUP(d, h, b15)
"""


def q_ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + LOCF: a dense hourly grid per event_type over the
    corpus's [min, max] hour span, empty buckets zero-filled for counts and
    forward-filled (last observation carried forward) for the value metric
    — TimescaleDB's ``time_bucket_gapfill`` + ``locf`` as DataFrame ops.

    Plan shape: ONE tiny metadata aggregate (min/max hour + collect_set of
    the low-cardinality event types, a single events pass) feeds a double
    explode producing the grid — rows ≈ hours x types, always tiny next to
    the events table, computed without any driver-side collect. The hourly
    aggregate is the only other events scan; the LOCF is one window
    partitioned by event_type over the bounded grid (state = grid rows,
    not event rows, so the window never sees corpus-sized partitions at
    any corpus scale).
    """
    ev = load_table(spark, sf_dir, "events")
    meta = ev.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("hi"),
        F.collect_set("event_type").alias("types"),
    )
    grid = meta.select(
        F.explode("types").alias("event_type"), "lo", "hi",
    ).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"),
    )
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("av"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("av", ignorenulls=True).over(w).alias("value_locf"),
            F.col("n").isNull().alias("gap_filled"),
        )
    )


Q_TS_GAPFILL_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM events
), grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
              FROM bounds) g
), hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         count(*) AS n, round(avg(value), 6) AS av
  FROM events GROUP BY 1, 2
)
SELECT g.event_type,
       strftime(g.h, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       CAST(coalesce(n, 0) AS BIGINT) AS n_events,
       last_value(av IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
       n IS NULL AS gap_filled
FROM grid g
LEFT JOIN hourly USING (event_type, h)
"""


def q_ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: per event_type hourly counts scored
    against a baseline of the 24 most recent ACTIVE hours (a 24-ROW frame
    before the current row — for a type with empty hours this spans more
    than 24 wall-clock hours, deliberately: empty buckets produce no rows
    and would otherwise zero-drag the baseline; compose with
    ts_gapfill_locf first if strict wall-clock windows are wanted). The
    current hour never contaminates its own baseline; rows with |z| ≥ 2
    after ≥ 12 baseline rows are flagged. This is the alerting query a
    telemetry pipeline runs on the same hypertable the rollups serve.

    Scale: one partial-aggregated shuffle to hourly grain (rows ≈ hours ×
    types, tiny at any corpus scale), then one window over that bounded
    frame — the raw event stream never enters the window state. The
    threshold compares the ROUNDED z both here and in the oracle, so a
    1-ulp stddev difference between engines cannot flip a row across the
    boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    scored = hourly.select(
        "event_type", "h", "n",
        F.count("n").over(w).alias("n_prior"),
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
    ).filter((F.col("n_prior") >= 12) & (F.col("sigma") > 0)) \
     .withColumn("z", F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4))
    return scored.filter(F.abs(F.col("z")) >= 2.0).select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n",
        F.round("mu", 4).alias("mu"),
        F.round("sigma", 4).alias("sigma"),
        "z",
    )


Q_TS_ANOMALY_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, h, n,
         count(n)       OVER w AS n_prior,
         avg(n)         OVER w AS mu,
         stddev_samp(n) OVER w AS sigma
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       CAST(n AS BIGINT) AS n,
       round(mu, 4)    AS mu,
       round(sigma, 4) AS sigma,
       round((n - mu) / sigma, 4) AS z
FROM scored
WHERE n_prior >= 12 AND sigma > 0
  AND abs(round((n - mu) / sigma, 4)) >= 2.0
"""


EWMA_ALPHA = 0.3  # decay factor; weight of the k-th-newest bucket ∝ 0.7^k
EWMA_SPAN = 24    # finite horizon: trailing 24 active hourly buckets


def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of hourly event volume per
    type — the smoothing curve a monitoring dashboard draws next to the
    raw series. Finite-horizon form (the 24 most recent active buckets;
    weight of the k-th-newest ∝ (1-α)^k, normalized), so every value is a
    closed-form dot product both engines compute identically.

    Scale: one partial-aggregated shuffle to hourly grain, then one
    bounded-frame window over rows ≈ hours × types — the raw stream never
    enters window state. The per-row dot product is a 24-element
    higher-order-function fold inside codegen, not a UDF.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("h").rowsBetween(-(EWMA_SPAN - 1), 0)
    # collect_list over an ORDER BY frame is frame-ordered: oldest first
    vals = F.collect_list(F.col("n").cast("double")).over(w)
    d = hourly.withColumn("_vals", vals).withColumn("m", F.size("_vals"))
    decay = F.lit(1.0 - EWMA_ALPHA)
    # element k (oldest-first) has age m-1-k → weight (1-α)^(m-1-k)
    wts = F.transform(
        F.sequence(F.lit(0), F.col("m") - 1),
        lambda k: F.pow(decay, (F.col("m") - 1 - k).cast("double")),
    )
    num = F.aggregate(
        F.zip_with(F.col("_vals"), wts, lambda v, wt: v * wt),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    den = F.aggregate(wts, F.lit(0.0), lambda acc, x: acc + x)
    return d.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n",
        F.col("m").alias("n_window"),
        F.round(num / den, 4).alias("ewma"),
        F.round(F.col("n") - num / den, 4).alias("deviation"),
    )


Q_TS_EWMA_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1, 2
), framed AS (
  SELECT event_type, h, n,
         list(CAST(n AS DOUBLE)) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM hourly
), scored AS (
  SELECT event_type, h, n, len(vals) AS m,
         list_dot_product(
           vals,
           list_transform(range(0, len(vals)),
                          k -> pow({1.0 - EWMA_ALPHA}, len(vals) - 1 - k)))
         / list_sum(list_transform(range(0, len(vals)),
                          k -> pow({1.0 - EWMA_ALPHA}, len(vals) - 1 - k))) AS ewma
  FROM framed
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       CAST(n AS BIGINT) AS n,
       CAST(m AS INT) AS n_window,
       round(ewma, 4) AS ewma,
       round(n - ewma, 4) AS deviation
FROM scored
"""


# -- incremental continuous-aggregate maintenance ---------------------------
#
# The materialized-rollup contract: a stored hourly aggregate is kept as
# MERGEABLE PARTIALS (count, sum, sum-of-squares, min, max) rather than as
# finished values, so refreshing it after an ingest batch is
# ``merge_partials(stored, rollup_partials(delta))`` — one aggregation over
# the delta plus one keyed merge whose input size is bounded by the bucket
# count, never a rescan of the history. avg and stddev are DERIVED from the
# merged moments at read time (they are algebraic: not directly mergeable as
# finished values, exactly mergeable as (n, s, s2)). This is TimescaleDB's
# continuous-aggregate / Spark's partial-aggregation contract surfaced as an
# explicit API.

def rollup_partials(ev: DataFrame) -> DataFrame:
    """Hourly per-type mergeable partials over an event slice. One
    partial-aggregated shuffle; output rows ≈ hours × types."""
    return ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # nv = null-aware value count: avg/stddev must divide by it, not
        # by n — SQL's avg(value)/stddev_samp(value) skip NULL values
        # while count(*) does not, and the two diverge the moment a
        # bucket carries a NULL value
        F.count("value").alias("nv"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )


def merge_partials(*parts: DataFrame) -> DataFrame:
    """Merge partial-aggregate slices keyed on (event_type, h). Counts and
    moments add; min/max combine; the merge shuffles only bucket-count-sized
    relations regardless of corpus size."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("event_type", "h").agg(
        F.sum("n").alias("n"),
        F.sum("nv").alias("nv"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finish_partials(merged: DataFrame) -> DataFrame:
    """Finished read-time view of a partials table: derive avg/stddev from
    the moments. stddev_samp from (n, s, s2) is sqrt((s2 - s²/n)/(n-1)),
    clamped at 0 against floating-point negativity, NULL for n=1 (matching
    SQL stddev_samp)."""
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("nv")) / (F.col("nv") - 1)
    return merged.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        F.col("n").alias("n_events"),
        F.round("s", 6).alias("sum_value"),
        F.when(F.col("nv") > 0,
               F.round(F.col("s") / F.col("nv"), 6)).alias("avg_value"),
        F.round("mn", 6).alias("min_value"),
        F.round("mx", 6).alias("max_value"),
        F.when(F.col("nv") > 1,
               F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 4)
               ).alias("stddev_value"),
    )


def q_ts_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental continuous-aggregate refresh, proven against full
    recompute: the corpus is split at a watermark (midnight of the last
    day — the stored rollup covers everything before it, the newest ingest
    batch everything after), each side is reduced to mergeable partials
    independently, and the merge is finished into the exact hourly rollup
    a from-scratch aggregation would produce. The oracle IS the full
    recompute, so the driver's hash check verifies merge-equivalence.

    Scale: the delta aggregation scans only the new batch; the merge
    shuffles two bucket-count-sized relations (rows ≈ hours × types, tiny
    at any corpus scale). History is never rescanned — that is the entire
    point of storing partials instead of finished averages.
    """
    ev = load_table(spark, sf_dir, "events")
    # 1-row watermark feeds both slice filters — materialize once or
    # each reference re-runs the max-scan (multiply-referenced-subtree
    # rule); slice predicates are NULL-SAFE: a NULL ts satisfies neither
    # bare comparison and the row would vanish from both slices while the
    # recompute oracle keeps it (NULL-hour bucket) — route it to delta
    watermark = ev.agg(
        F.date_trunc("day", F.max("ts")).cast("timestamp_ntz").alias("_wm")) \
        .localCheckpoint(eager=True)
    tagged = ev.crossJoin(F.broadcast(watermark))
    stored = rollup_partials(
        tagged.filter(F.coalesce(F.col("ts") < F.col("_wm"), F.lit(False))))
    delta = rollup_partials(
        tagged.filter(F.coalesce(F.col("ts") >= F.col("_wm"), F.lit(True))))
    return finish_partials(merge_partials(stored, delta))


Q_TS_ROLLUP_INCREMENTAL_SQL = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       CAST(count(*) AS BIGINT)      AS n_events,
       round(sum(value), 6)          AS sum_value,
       round(avg(value), 6)          AS avg_value,
       round(min(value), 6)          AS min_value,
       round(max(value), 6)          AS max_value,
       round(stddev_samp(value), 4)  AS stddev_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


LTTB_BUCKET_MS = 6 * 3600 * 1000  # 6-hour buckets ≈ 120 per 30-day series


def _lttb_area2(ax, ay, cx, cy, x, y):
    """Twice the triangle area of (A, P, C) via the cross product
    |(P−A)×(C−A)| = |(ax−cx)(y−ay) − (ax−x)(cy−ay)|. Kept as a named
    function with a closed-form unit test (tests/test_lttb.py) because the
    r06 first draft shipped a sign-flipped second factor — (ay−cy) instead
    of (cy−ay) — which is NOT an area (it has a stray −2·ax·ay term and
    picks the wrong point whenever the anchors are not level) and which the
    parity gate was structurally blind to: the oracle mirrored the same
    wrong formula. Differential testing proves Spark ≡ DuckDB, never that
    the formula means what the docstring says — closed-form tests do that."""
    return F.abs((ax - cx).cast("double") * (y - ay)
                 - (ax - x).cast("double") * (cy - ay))


def q_ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) of
    each event_type's (ts, value) series — the shape-preserving reduction
    a dashboard runs before plotting millions of points.

    Deterministic PARALLEL variant: true LTTB anchors each bucket's
    triangle on the PREVIOUSLY SELECTED point (a sequential dependency no
    parallel engine should serialize); here the anchors are the FIRST
    point of the previous bucket and the first point of the next bucket —
    raw data points, not float averages, so every triangle area is a
    fixed IEEE expression over parquet-identical inputs and the arg-max
    winner is bit-reproducible on both engines (a bucket-average anchor
    would inject order-dependent float summation). First/last buckets
    keep their first/last raw point, matching LTTB's keep-the-endpoints
    contract. Tie-breaks are branch-specific and mirrored exactly by the
    oracle: interior buckets break equal areas on SMALLEST event_id; the
    last bucket orders by (x, event_id) DESC, so equal-x ties keep the
    LARGEST event_id. A bucket whose prev/next neighbor is EMPTY (a gap
    in the series) has a NULL anchor on that side and degrades to the
    first/last-bucket endpoint rule for that bucket — anchors never
    reach across gaps to the nearest non-empty bucket.

    Scale: one keyed aggregation for bucket firsts (map-side combined),
    two 1-to-1 equi-joins of the tiny firsts relation back onto the
    events scan (broadcast at any corpus size: |firsts| ≈ buckets ×
    types), one row_number window partitioned by (type, bucket) — no
    global sort, no all-pairs anything; output ≈ bucket count.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type", "event_id", "ts", "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("x"),
    ).withColumn("b", F.expr(f"x div {LTTB_BUCKET_MS}"))
    # first/last raw point per (type, bucket): min/max on (x, event_id)
    firsts = (pts.groupBy("event_type", "b")
              .agg(F.min(F.struct("x", "event_id", "value")).alias("f"))
              .select("event_type", "b", F.col("f.x").alias("fx"),
                      F.col("f.value").alias("fy"))
              .localCheckpoint(eager=True))
    prev = firsts.select(F.col("event_type").alias("pt"), (F.col("b") + 1).alias("pb"),
                         F.col("fx").alias("ax"), F.col("fy").alias("ay"))
    nxt = firsts.select(F.col("event_type").alias("nt"), (F.col("b") - 1).alias("nb"),
                        F.col("fx").alias("cx"), F.col("fy").alias("cy"))
    joined = (pts
              .join(F.broadcast(prev),
                    (F.col("event_type") == F.col("pt")) & (F.col("b") == F.col("pb")),
                    "left")
              .join(F.broadcast(nxt),
                    (F.col("event_type") == F.col("nt")) & (F.col("b") == F.col("nb")),
                    "left"))
    # middle buckets: max triangle area vs (prev-first, next-first);
    # first bucket (no prev): keep first point; last (no next): last point
    area2 = _lttb_area2(F.col("ax"), F.col("ay"), F.col("cx"), F.col("cy"),
                        F.col("x"), F.col("value"))
    ranked = joined.withColumn(
        "rk",
        F.when(F.col("ax").isNull(),   # first bucket (or only) → earliest point
               F.struct(F.lit(0.0).alias("a"),
                        (-F.col("x")).cast("double").alias("t"),
                        (-F.col("event_id")).cast("double").alias("e")))
        .when(F.col("cx").isNull(),   # last bucket → latest point
              F.struct(F.lit(0.0).alias("a"),
                       F.col("x").cast("double").alias("t"),
                       F.col("event_id").cast("double").alias("e")))
        .otherwise(F.struct(area2.alias("a"),
                            F.lit(0.0).alias("t"),
                            (-F.col("event_id")).cast("double").alias("e"))))
    w = W.partitionBy("event_type", "b").orderBy(F.col("rk").desc())
    # n_in_bucket rides the SAME window partitioning as the rank — a
    # separate groupBy+join would scan the events relation a second time
    kept = (ranked
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n_in_bucket",
                        F.count(F.lit(1)).over(W.partitionBy("event_type", "b")))
            .filter(F.col("rn") == 1))
    return (kept
            .select("event_type",
                    F.date_format(
                        F.timestamp_seconds(
                            (F.col("b") * (LTTB_BUCKET_MS // 1000))).cast("timestamp_ntz"),
                        "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
                    "event_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                    "value", "n_in_bucket"))


Q_TS_LTTB_SQL = f"""
WITH pts AS (
  SELECT event_type, event_id, ts, value,
         epoch_ms(ts) AS x, epoch_ms(ts) // {LTTB_BUCKET_MS} AS b
  FROM events
), firsts AS (
  SELECT event_type, b,
         min(struct_pack(x := x, event_id := event_id, value := value)) AS f
  FROM pts GROUP BY 1, 2
), anchors AS (
  SELECT event_type, b, f.x AS fx, f.value AS fy FROM firsts
), joined AS (
  SELECT p.*, a.fx AS ax, a.fy AS ay, c.fx AS cx, c.fy AS cy
  FROM pts p
  LEFT JOIN anchors a ON a.event_type = p.event_type AND a.b = p.b - 1
  LEFT JOIN anchors c ON c.event_type = p.event_type AND c.b = p.b + 1
), ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY event_type, b
           ORDER BY CASE
             WHEN ax IS NULL THEN
               struct_pack(a := 0.0, t := CAST(-x AS DOUBLE),
                           e := CAST(-event_id AS DOUBLE))
             WHEN cx IS NULL THEN
               struct_pack(a := 0.0, t := CAST(x AS DOUBLE),
                           e := CAST(event_id AS DOUBLE))
             ELSE
               struct_pack(
                 a := abs(CAST(ax - cx AS DOUBLE) * (value - ay)
                          - CAST(ax - x AS DOUBLE) * (cy - ay)),
                 t := 0.0, e := CAST(-event_id AS DOUBLE))
           END DESC) AS rn,
         count(*) OVER (PARTITION BY event_type, b) AS n_in_bucket
  FROM joined
)
SELECT event_type,
       strftime(make_timestamp(b * {LTTB_BUCKET_MS} * 1000),
                '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       value,
       CAST(n_in_bucket AS BIGINT) AS n_in_bucket
FROM ranked
WHERE rn = 1
"""


def q_ts_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event-type
    sequence — the next-event model a product-analytics pipeline ships
    (what follows a 'view'? how sticky is 'purchase'?), and the input to
    sequence-anomaly scoring.

    Determinism: each user's sequence is totally ordered by (ts,
    event_id) — unique — so the lag pairing is identical on both
    engines; probabilities are floor-ppm over exact integer row totals.

    Scale: ONE window pass partitioned by user (the per-user sequence is
    the unit of state, bounded by a user's own history, never global)
    feeding a |types|²-row aggregation with map-side combine; the
    row-normalizing total rides a window over the 25-row matrix. The raw
    stream crosses exactly one keyed shuffle (user partitioning).
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                  & F.col("event_type").isNotNull()))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"))
        .filter(F.col("from_type").isNotNull()))
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans"))
    tot = W.partitionBy("from_type")
    return (counts
            .withColumn("row_total", F.sum("n_trans").over(tot))
            .select("from_type", "to_type", "n_trans",
                    F.col("row_total").cast("long").alias("row_total"),
                    F.expr("n_trans * 1000000 div row_total")
                    .alias("prob_ppm"))
            .orderBy("from_type", "to_type"))


Q_TS_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), counts AS (
  SELECT from_type, event_type AS to_type, count(*) AS n_trans
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type,
       CAST(n_trans AS BIGINT) AS n_trans,
       CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
       CAST(n_trans AS BIGINT) * 1000000
         // CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
         AS prob_ppm
FROM counts
ORDER BY from_type, to_type
"""


def q_ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily event-volume series:
    cumulative sum of deviations from the global mean, peak |S| marks the
    most likely level-shift day (Page's test, two-sided, known-mean form).

    Exact-integer algebra: with D days, N total events, x_k the day-k
    count, the mean-centered partial sum scaled by D is
    ``S_k = D·cum_k − k·N`` (every term integer — no float mean, no
    rounding class, bit-exact under the driver hash). The change point is
    argmax |S_k| with earliest-day tie-break.

    Scale: one partial-aggregated shuffle collapses the corpus to day
    grain (≤ calendar days rows — bounded at any corpus size); the
    windows, peak scan, and flag join all run on that bounded series.
    The raw event stream never enters window state (same discipline as
    ts_anomaly_zscore). Overflow: |S_k| ≤ D·N, fine past 10^5 days of
    10^13 events.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (ev.groupBy(F.date_format(F.date_trunc("day", F.col("ts")),
                                      "yyyy-MM-dd").alias("day"))
             .agg(F.count(F.lit(1)).alias("x_cnt")))
    return cusum_over_daily(daily)


def cusum_over_daily(daily: DataFrame) -> DataFrame:
    """CUSUM core over a (day, x_cnt) frame — factored out so the
    planted-shift test can drive it without parquet."""
    daily = daily.localCheckpoint(eager=True)  # feeds tot AND series: one scan
    tot = daily.agg(F.sum("x_cnt").alias("n_total"),
                    F.count(F.lit(1)).alias("n_days"))
    w = W.orderBy("day")
    ser = (daily.crossJoin(F.broadcast(tot))
           .withColumn("k", F.row_number().over(w))
           .withColumn("cum", F.sum("x_cnt").over(
               w.rowsBetween(W.unboundedPreceding, W.currentRow)))
           .select("day", "x_cnt",
                   (F.col("n_days") * F.col("cum")
                    - F.col("k") * F.col("n_total")).alias("cusum"))
           .localCheckpoint(eager=True))  # referenced by peak scan + output
    amax = ser.agg(F.max(F.abs(F.col("cusum"))).alias("amax"))
    cday = (ser.crossJoin(F.broadcast(amax))
            .filter(F.abs(F.col("cusum")) == F.col("amax"))
            .agg(F.min("day").alias("cday")))
    return (ser.crossJoin(F.broadcast(cday))
            .select("day", "x_cnt", "cusum",
                    (F.col("day") == F.col("cday")).alias("is_change_point"))
            .orderBy("day"))


Q_TS_CUSUM_SQL = """
WITH daily AS MATERIALIZED (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, count(*) AS x_cnt
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), tot AS (SELECT sum(x_cnt) AS n_total, count(*) AS n_days FROM daily),
ser AS MATERIALIZED (
  SELECT day, x_cnt,
         CAST(n_days * sum(x_cnt) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - row_number() OVER (ORDER BY day) * n_total AS BIGINT) AS cusum
  FROM daily CROSS JOIN tot
), mx AS (SELECT max(abs(cusum)) AS amax FROM ser),
cd AS (SELECT min(day) AS cday FROM ser, mx WHERE abs(cusum) = amax)
SELECT day, CAST(x_cnt AS BIGINT) AS x_cnt, cusum,
       (day = cday) AS is_change_point
FROM ser, cd ORDER BY day
"""


# --- exact-integer autocorrelation of the daily-count series (r09) -----------
ACF_MAX_LAG = 7


def q_ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7 — the
    seasonality detector (a weekly cycle shows as a lag-7 peak) that
    complements CUSUM (level shifts) and the z-score (outliers).

    EXACT-INTEGER form: with x_t the daily counts, n days and S = Σx,
    scale the mean out by n — X_t = n·x_t − S is a BIGINT, and

        num_k = Σ_{t≤n−k} X_t·X_{t+k},   den = Σ_t X_t²

    are exact in both engines (num_k/den is textbook ACF with the
    full-series mean). |num_k| ≤ den (Cauchy–Schwarz), so the ppm output
    downshifts num and den by the shared power-of-two divisor
    (profiling._ppm_downshift_sql) before the ×10^6, and NEGATIVE
    numerators go through sign·(|num|·10^6 div den): Spark's ``div``
    truncates toward zero while DuckDB's ``//`` floors, so a signed
    floor-div would disagree on negative lags — abs first, then re-sign
    (both engines agree on non-negative operands).

    Scale: one events scan → |days| rows; the lag join and both rollups
    run on the day-grain series (≤ calendar-sized). Companion num/den
    BIGINTs ride along, so acf_ppm is redundant under the driver hash.
    """
    from .profiling import _ppm_downshift_sql

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("ts").isNotNull())
          .select(F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day")))
    daily = (ev.groupBy("day").agg(F.count(F.lit(1)).alias("x"))
             .withColumn("t", F.row_number().over(W.orderBy("day")))
             .localCheckpoint(eager=True))  # |days| rows, referenced 4x
    stats = daily.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("x").cast("long").alias("s"))
    xs = (daily.crossJoin(F.broadcast(stats))
          .select("t", (F.col("n") * F.col("x") - F.col("s"))
                  .cast("long").alias("xc")))
    den = xs.agg(F.sum(F.col("xc") * F.col("xc")).cast("long").alias("den"))
    lags = spark.createDataFrame([(k,) for k in range(1, ACF_MAX_LAG + 1)],
                                 "lag int")
    b = xs.select((F.col("t")).alias("tb"), F.col("xc").alias("xb"))
    num = (lags.join(xs, how="cross")
           .join(b, F.col("tb") == F.col("t") + F.col("lag"))
           .groupBy("lag")
           .agg(F.count(F.lit(1)).alias("n_overlap"),
                F.sum(F.col("xc") * F.col("xb")).cast("long").alias("num")))
    d = _ppm_downshift_sql("den")
    return (num.crossJoin(F.broadcast(den))
            .withColumn("acf_ppm", F.expr(
                f"CAST(sign(num) AS BIGINT) * "
                f"((abs(num) div {d}) * 1000000L div (den div {d}))"))
            .select(F.col("lag").cast("long").alias("lag"),
                    "n_overlap", "num", "den", "acf_ppm")
            .orderBy("lag"))


def _ts_acf_sql() -> str:
    from .profiling import _ppm_downshift_sql
    d = _ppm_downshift_sql("den")
    return f"""
WITH daily AS MATERIALIZED (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), ser AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY day) AS t,
         CAST((SELECT count(*) FROM daily) * x
              - (SELECT sum(x) FROM daily) AS BIGINT) AS xc
  FROM daily
), dn AS (SELECT CAST(sum(xc * xc) AS BIGINT) AS den FROM ser),
lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag),
nums AS (
  SELECT l.lag, count(*) AS n_overlap,
         CAST(sum(a.xc * b.xc) AS BIGINT) AS num
  FROM lags l
  JOIN ser a ON TRUE
  JOIN ser b ON b.t = a.t + l.lag
  GROUP BY l.lag
)
SELECT CAST(lag AS BIGINT) AS lag, n_overlap, num, den,
       CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END
            * ((abs(num) // {d}) * 1000000 // (den // {d})) AS BIGINT)
         AS acf_ppm
FROM nums CROSS JOIN dn
ORDER BY lag
"""


def q_ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition of the daily event-count series by
    day-of-week profile — the structural sibling of ts_autocorrelation
    (which DETECTS the weekly cycle; this one REMOVES it): per day,
    the dow-group seasonal level and the residual deviation from it,
    the series an anomaly monitor actually thresholds after
    deseasonalizing.

    EXACT-INTEGER form: dow = (days-since-epoch) mod 7 (identical
    arithmetic both engines — named-weekday functions differ in origin
    between Spark and DuckDB); the seasonal level rides as companion
    BIGINTs (dow_sum, n_days) plus a milli rendering
    ``dow_sum·1000 div n_days``; the residual is the signed integer
    ``n_days·cnt − dow_sum`` and its ppm ratio goes through the
    abs-then-resign discipline (Spark ``div`` truncates, DuckDB ``//``
    floors — they agree only on non-negative operands). Overflow bound:
    |resid|·10⁶ ≤ n_days·cnt·10⁶ — safe below ~10¹² events/day, far
    past the 100 TB shape, so no downshift is needed (contrast the
    Σdev·10⁶ case in profiling._ppm_downshift_sql).

    Scale: one events scan → |days| rows; the dow profile is 7 rows and
    broadcasts; everything after the first aggregate is calendar-sized.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("ts").isNotNull())
          .select(F.date_trunc("day", F.col("ts")).cast("date").alias("d")))
    # daily feeds BOTH the profile and the join — materialize the
    # |days|-row relation once or each reference re-scans events
    # (the r05 multi-consumer rule; audit showed 2 scans unchecked)
    daily = (ev.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
             .withColumn("dow", (F.datediff(
                 F.col("d"), F.lit("1970-01-01").cast("date")) % 7)
                 .cast("long"))
             .localCheckpoint(eager=True))
    prof = daily.groupBy("dow").agg(
        F.sum("cnt").cast("long").alias("dow_sum"),
        F.count(F.lit(1)).cast("long").alias("n_days"))
    return (daily.join(F.broadcast(prof), "dow")
            .withColumn("resid_num",
                        (F.col("n_days") * F.col("cnt") - F.col("dow_sum"))
                        .cast("long"))
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                    "dow", "cnt", "dow_sum", "n_days",
                    F.expr("dow_sum * 1000L div n_days")
                    .alias("seasonal_milli"),
                    F.expr("CAST(sign(resid_num) AS BIGINT) * "
                           "(abs(resid_num) * 1000000L div dow_sum)")
                    .alias("dev_ppm"))
            .orderBy("day"))


Q_TS_SEASONAL_SQL = """
WITH daily AS MATERIALIZED (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), dd AS MATERIALIZED (
  SELECT d, cnt,
         CAST(date_diff('day', DATE '1970-01-01', d) % 7 AS BIGINT) AS dow
  FROM daily
), prof AS MATERIALIZED (
  SELECT dow, CAST(sum(cnt) AS BIGINT) AS dow_sum,
         CAST(count(*) AS BIGINT) AS n_days
  FROM dd GROUP BY dow
)
SELECT strftime(dd.d, '%Y-%m-%d') AS day, dd.dow, dd.cnt,
       p.dow_sum, p.n_days,
       CAST(p.dow_sum * 1000 // p.n_days AS BIGINT) AS seasonal_milli,
       CAST(CAST(sign(p.n_days * dd.cnt - p.dow_sum) AS BIGINT)
            * (abs(p.n_days * dd.cnt - p.dow_sum) * 1000000 // p.dow_sum)
            AS BIGINT) AS dev_ppm
FROM dd JOIN prof p USING (dow)
ORDER BY day
"""


QUERIES = {
    "ts_rollup_multires": q_ts_rollup_multires,
    "ts_autocorrelation": q_ts_autocorrelation,
    "ts_markov_transitions": q_ts_markov_transitions,
    "ts_lttb_downsample": q_ts_lttb_downsample,
    "ts_gapfill_locf": q_ts_gapfill_locf,
    "ts_anomaly_zscore": q_ts_anomaly_zscore,
    "ts_ewma": q_ts_ewma,
    "ts_rollup_incremental": q_ts_rollup_incremental,
    "ts_cusum_changepoint": q_ts_cusum_changepoint,
    "ts_seasonal_decompose": q_ts_seasonal_decompose,
}
ORACLE = {
    "ts_cusum_changepoint": Q_TS_CUSUM_SQL,
    "ts_seasonal_decompose": Q_TS_SEASONAL_SQL,
    "ts_autocorrelation": _ts_acf_sql(),
    "ts_rollup_incremental": Q_TS_ROLLUP_INCREMENTAL_SQL,
    "ts_markov_transitions": Q_TS_MARKOV_SQL,
    "ts_lttb_downsample": Q_TS_LTTB_SQL,
    "ts_rollup_multires": Q_TS_ROLLUP_SQL,
    "ts_gapfill_locf": Q_TS_GAPFILL_SQL,
    "ts_anomaly_zscore": Q_TS_ANOMALY_SQL,
    "ts_ewma": Q_TS_EWMA_SQL,
}
