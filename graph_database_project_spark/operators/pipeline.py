"""Composed pipelines — the operators working together, the way an actual
LLM training-data job or product-analytics job would chain them. Each stage
is an operator already covered individually (COVERAGE.md); these queries
prove the compositions stay oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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


QUERIES = {
    "pipeline_training_data": q_pipeline_training_data,
    "funnel_conversion": q_funnel_conversion,
}

ORACLE = {
    "pipeline_training_data": Q_PIPELINE_SQL,
    "funnel_conversion": Q_FUNNEL_SQL,
}
