"""Composed pipelines — the operators working together, the way an actual
LLM training-data job or product-analytics job would chain them. Each stage
is an operator already covered individually (COVERAGE.md); these queries
prove the compositions stay oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io import load_table

QUALITY_MIN_WORDS = 20
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def q_pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation pipeline: language filter → quality gate →
    exact dedup (canonical fingerprint, keep lowest doc_id) → per-source
    token budget rollup.

    Scale: filter+score are scan-local; dedup is one shuffle on the
    fingerprint; the rollup is dim-sized. This is the shape of a corpus
    curation job at 100 TB — everything before the dedup shuffle prunes.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    stop_ratio = (
        F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
        / F.greatest(F.size(words), F.lit(1))
    )
    scored = (
        docs.filter(F.col("lang") == "en")
        .withColumn("n_words", F.size(words))
        .withColumn("stop_ratio", stop_ratio)
        .filter((F.col("n_words") >= QUALITY_MIN_WORDS) & (F.col("stop_ratio") < 0.5))
        .withColumn("fp", F.md5(F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))))
    )
    deduped = (
        scored.groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("source", "doc_id").alias("source"),
            F.min_by("n_words", "doc_id").alias("n_words"),
        )
    )
    return (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_tokens"),
        )
        .orderBy("source")
    )


Q_PIPELINE_SQL = f"""
WITH scored AS (
  SELECT doc_id, source, text,
         len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_words,
         len(list_filter(string_split(lower(text), ' '),
             w -> w IN ({",".join("'" + w + "'" for w in STOPWORDS)}))) * 1.0
           / greatest(len(list_filter(string_split(lower(text), ' '), w -> w <> '')), 1) AS stop_ratio
  FROM documents WHERE lang = 'en'
), gated AS (
  SELECT *, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM scored WHERE n_words >= {QUALITY_MIN_WORDS} AND stop_ratio < 0.5
), deduped AS (
  SELECT fp, min(doc_id) AS doc_id,
         arg_min(source, doc_id) AS source,
         arg_min(n_words, doc_id) AS n_words
  FROM gated GROUP BY fp
)
SELECT source, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS total_tokens
FROM deduped GROUP BY source ORDER BY source
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics funnel over the event stream: per user, first
    signup → first purchase strictly after it; conversion rate and median
    lag per event cohort would follow the same shape.

    Scale: two filtered pre-aggregations on user_id (shared shuffle key) +
    one join — no window over the raw stream needed for first-touch
    funnels; min() per user is a partial aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min(ts).alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", ts.alias("p_ts"))
    first_conv = (
        signups.join(purchases, "user_id", "left")
        .withColumn("p_after", F.when(F.col("p_ts") > F.col("signup_ts"), F.col("p_ts")))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_after").alias("first_purchase_ts"))
    )
    return first_conv.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("first_purchase_ts").alias("n_converted"),
        F.round(
            F.avg(
                (F.col("first_purchase_ts").cast("double") - F.col("signup_ts").cast("double")) / 60.0
            ), 2,
        ).alias("avg_minutes_to_convert"),
    )


Q_FUNNEL_SQL = """
WITH signups AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT s.user_id, s.signup_ts, min(p.ts) AS first_purchase_ts
  FROM signups s
  LEFT JOIN events p
    ON p.user_id = s.user_id AND p.event_type = 'purchase' AND p.ts > s.signup_ts
  GROUP BY s.user_id, s.signup_ts
)
SELECT count(*)                 AS n_signup_users,
       count(first_purchase_ts) AS n_converted,
       round(avg(epoch(first_purchase_ts) - epoch(signup_ts)) / 60.0, 2)
                                AS avg_minutes_to_convert
FROM conv
"""


def q_funnel_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the week of their
    first event; each later week's distinct-active count is reported as a
    retention rate against the cohort's size — the standard product-
    analytics triangle chart, and the engagement-decay view a data-flywheel
    pipeline monitors.

    Scale: activity distinct + per-user min share the user_id shuffle key;
    the cohort-size table (rows = #weeks) joins back as a broadcast. The
    raw stream collapses to (user, week) pairs at the first aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    # activity feeds three consumers (cohorts → base, and the grid join)
    # and cohorts two — a DataFrame plan re-expands per reference, so the
    # events scan + the (user, week) distinct shuffle re-ran 3x and the
    # per-user min agg 2x (r15: 3 events scans / 6 exchanges → 1 / 3).
    # Both relations are collapsed far below the raw stream (pairs /
    # users), so materializing them is the cheap side of the trade.
    # r16: LAZY localCheckpoints — same one-computation sharing, but the
    # RDDs compute inside the one consuming action instead of two serial
    # driver jobs at construction (the motif/shred A/B family).
    activity = (ev.select("user_id", wk.alias("week")).distinct()
                .localCheckpoint(eager=False))
    cohorts = (activity.groupBy("user_id")
               .agg(F.min("week").alias("cohort_week"))
               .localCheckpoint(eager=False))
    base = cohorts.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size"))
    return (
        activity.join(cohorts, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(base), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset", "n_active", "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


Q_RETENTION_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
), cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY user_id
), base AS (
  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
  FROM cohorts GROUP BY cohort_week
), grid AS (
  SELECT c.cohort_week,
         CAST(date_diff('day', c.cohort_week, a.week) / 7 AS INTEGER) AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN cohorts c USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(g.cohort_week, '%Y-%m-%d') AS cohort_week,
       g.week_offset, g.n_active, b.cohort_size,
       round(g.n_active * 1.0 / b.cohort_size, 6) AS retention
FROM grid g JOIN base b USING (cohort_week)
ORDER BY cohort_week, week_offset
"""


PATH_TOPK = 20


def q_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path mining: the top-20 event-type TRIGRAMS across
    per-user daily journeys — the n-step generalization of
    ``ts_markov_transitions`` (1-step) and the exploratory sibling of the
    fixed-order funnel (funnel_conversion asks "did they follow THE
    path"; this asks "which paths do they actually follow").

    Journey order within (user, day) is (ts, event_id) — the event_id
    tie-break makes the sequence total in BOTH engines (equal-ts rows
    would otherwise order nondeterministically and flip trigram counts).
    Trigrams come from ``lead(event_type, 1/2)`` over the SAME
    (user, day) journey window — one keyed shuffle establishes the
    partitioning and both leads ride it (the pack_sequences window-reuse
    pattern); the r09 two-self-join form paid two extra keyed shuffles
    for the identical relation (r09 verdict finding 2). BIGINT counts,
    no arrays in the hashed output; top-20 is total-ordered
    (n desc, path asc).

    Scale: ONE keyed window over (user, day) partitions (journey-sized,
    never corpus-wide); the trigram rollup collapses map-side to
    ≤ |event_types|³ groups.
    """
    from pyspark.sql.window import Window as W

    # event_type must be null-filtered (the ts_markov/graphq discipline):
    # Spark's concat_ws SKIPS a NULL while DuckDB's || yields NULL — a
    # single NULL-typed row would silently produce different group keys
    # on the two engines (r09 review finding)
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                  & F.col("event_type").isNotNull())
          .select("user_id",
                  F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day"),
                  "ts", "event_id", "event_type"))
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    tri = (ev
           .withColumn("t2", F.lead("event_type", 1).over(w))
           .withColumn("t3", F.lead("event_type", 2).over(w))
           .filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
           .select(F.concat_ws(">", "event_type", "t2", "t3").alias("path")))
    return (tri.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("path")).limit(PATH_TOPK))


Q_PATH_TRIGRAMS_SQL = f"""
WITH seq AS MATERIALIZED (
  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn,
         event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT a.event_type || '>' || b.event_type || '>' || c.event_type AS path,
       count(*) AS n
FROM seq a
JOIN seq b ON b.user_id = a.user_id AND b.day = a.day AND b.rn = a.rn + 1
JOIN seq c ON c.user_id = a.user_id AND c.day = a.day AND c.rn = a.rn + 2
GROUP BY 1
ORDER BY n DESC, path
LIMIT {PATH_TOPK}
"""


ATTR_LOOKBACK_MS = 7 * 24 * 3600 * 1000  # 7-day attribution window


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution — the marketing-analytics sibling
    of the funnel pair: every purchase's value is split EQUALLY across
    the user's click/view touches in the 7-day lookback window, the
    integer remainder going to the LATEST touch, purchases with no touch
    landing whole in the '(organic)' bucket. Per-channel rollup.

    Exact integer conservation is the operator's contract (and what the
    oracle's value hash effectively checks): value → cents via one
    engine-identical IEEE op (floor(value·100), the accepted
    single-op float class), then cents = Σ(cents div n) + remainder by
    construction — the attributed total equals the purchase total to
    the cent, per purchase. The remainder's recipient is chosen by
    (t_ms, touch_type) descending; ties beyond that are absorbed by the
    channel rollup (identical keys → identical channel).

    CORPUS ASSUMPTION (ADVICE r11): purchase ``value`` must be
    NON-NEGATIVE. ``cents div n_touch`` / ``cents % n_touch`` sit on the
    documented signed-division divergence (Spark ``div`` truncates
    toward zero, DuckDB ``//`` floors — they agree only for non-negative
    operands), so refund-shaped rows (value < 0) would break bit-exact
    parity. The testdata generator guarantees value >= 0.01 and
    tests/test_pipeline_attribution.py asserts the corpus invariant; a
    refund-capable variant would need the abs-then-resign discipline
    (see ts_autocorrelation).

    Scale: the touch expansion is a USER-keyed equi-join with the time
    range as a residual predicate — per-user event lists are bounded,
    so the join is hash-shaped and skew-safe; one window pass per
    purchase id for the count/rank; rollup is |channels|-sized. No
    window over the raw stream, no cross join.
    """
    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("p_user"),
                     F.col("event_id").alias("p_id"),
                     ms.alias("p_ms"),
                     F.floor(F.col("value") * F.lit(100.0)).cast("long")
                     .alias("cents")))
    touch = (ev.filter(F.col("event_type").isin("click", "view"))
             .select(F.col("user_id").alias("t_user"),
                     ms.alias("t_ms"),
                     F.col("event_type").alias("touch_type")))
    j = purch.join(
        touch,
        (purch.p_user == touch.t_user)
        & (touch.t_ms <= purch.p_ms)
        & (touch.t_ms >= purch.p_ms - ATTR_LOOKBACK_MS),
        "left")
    w = W.partitionBy("p_id")
    wo = w.orderBy(F.col("t_ms").desc(), F.col("touch_type").desc())
    per = j.select(
        "p_id", "cents", "touch_type",
        F.count("t_ms").over(w).alias("n_touch"),
        F.row_number().over(wo).alias("rn"))
    attributed = per.select(
        F.coalesce("touch_type", F.lit("(organic)")).alias("channel"),
        F.when(F.col("n_touch") == 0, F.col("cents"))
         .otherwise(F.expr("cents div n_touch")
                    + F.when(F.col("rn") == 1,
                             F.col("cents") % F.col("n_touch"))
                       .otherwise(F.lit(0))).alias("attr_cents"),
        "p_id")
    return (attributed.groupBy("channel")
            .agg(F.sum("attr_cents").alias("attributed_cents"),
                 F.countDistinct("p_id").alias("n_purchases"),
                 F.count(F.lit(1)).alias("n_rows"))
            .orderBy("channel"))


Q_ATTRIBUTION_SQL = f"""
WITH purch AS (
  SELECT user_id AS p_user, event_id AS p_id, epoch_ms(ts) AS p_ms,
         CAST(floor(value * CAST(100 AS DOUBLE)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id AS t_user, epoch_ms(ts) AS t_ms, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
), j AS (
  SELECT p.p_id, p.cents, t.touch_type, t.t_ms
  FROM purch p LEFT JOIN touch t
    ON t.t_user = p.p_user AND t.t_ms <= p.p_ms
   AND t.t_ms >= p.p_ms - {ATTR_LOOKBACK_MS}
), per AS (
  SELECT p_id, cents, touch_type,
         count(t_ms) OVER (PARTITION BY p_id) AS n_touch,
         row_number() OVER (PARTITION BY p_id
                            ORDER BY t_ms DESC, touch_type DESC) AS rn
  FROM j
), attributed AS (
  SELECT COALESCE(touch_type, '(organic)') AS channel,
         CASE WHEN n_touch = 0 THEN cents
              ELSE cents // n_touch
                   + CASE WHEN rn = 1 THEN cents % n_touch ELSE 0 END
         END AS attr_cents,
         p_id
  FROM per
)
SELECT channel,
       CAST(sum(attr_cents) AS BIGINT) AS attributed_cents,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
       CAST(count(*) AS BIGINT) AS n_rows
FROM attributed GROUP BY channel ORDER BY channel
"""


QUERIES = {
    "pipeline_training_data": q_pipeline_training_data,
    "path_trigrams": q_path_trigrams,
    "funnel_conversion": q_funnel_conversion,
    "funnel_retention_cohorts": q_funnel_retention_cohorts,
    "attribution_linear": q_attribution_linear,
}

ORACLE = {
    "pipeline_training_data": Q_PIPELINE_SQL,
    "path_trigrams": Q_PATH_TRIGRAMS_SQL,
    "funnel_conversion": Q_FUNNEL_SQL,
    "funnel_retention_cohorts": Q_RETENTION_SQL,
    "attribution_linear": Q_ATTRIBUTION_SQL,
}
