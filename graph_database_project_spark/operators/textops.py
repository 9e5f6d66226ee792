"""Text-analysis operators for LLM training-data pipelines (north-star
extensions; SURVEY.md §2.B "LLM-pipeline"): quality stats, language-ID
heuristic, token counting, document fingerprinting.

Everything is built from JVM-side built-ins (no Python in the hot path) and
is deterministic, so each query carries a full DuckDB oracle. Higher-order
array functions (``transform``/``filter``/``aggregate``) keep the per-doc
token work inside whole-stage codegen instead of exploding rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

# Marker-word lists for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "de", "y"],
    "fr": ["le", "la", "du", "et"],
}


def _words(col):
    return F.filter(F.split(F.lower(col), " "), lambda w: w != "")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: length validation, word stats,
    punctuation & stopword ratios, and a composite quality score."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    avg_word_len = (
        F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / F.greatest(n_words, F.lit(1))
    )
    stop_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    punct = F.length(F.regexp_replace("text", "[^.,;:!?]", ""))
    quality = (
        F.lit(0.4) * F.least(n_words / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3) * F.least(avg_word_len / F.lit(8.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        (F.length("text") == F.col("n_chars")).alias("n_chars_ok"),
        n_words.alias("n_words"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        punct.alias("punct_count"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


Q_TEXT_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, text, n_chars,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), m AS (
  SELECT doc_id, text, n_chars, words,
         len(words) AS n_words,
         len(list_filter(words, w -> w IN ({",".join("'" + w + "'" for w in STOPWORDS)}))) AS stop_hits,
         list_sum(list_transform(words, w -> CAST(length(w) AS BIGINT)))
           / greatest(len(words), 1) AS avg_word_len,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_count
  FROM base
)
SELECT doc_id,
       length(text) = n_chars AS n_chars_ok,
       n_words,
       round(avg_word_len, 4) AS avg_word_len,
       punct_count,
       round(stop_hits * 1.0 / greatest(n_words, 1), 6) AS stopword_ratio,
       round(0.4 * least(n_words / 100.0, 1.0)
           + 0.3 * (1.0 - stop_hits * 1.0 / greatest(n_words, 1))
           + 0.3 * least(avg_word_len / 8.0, 1.0), 6) AS quality_score
FROM m
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic with a fixed argmax tie-break
    order (en > de > es > fr). The corpus text is synthetic so accuracy is
    incidental; the contract is deterministic scoring."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    def marker_hits(markers):
        # NB: the lambda must take exactly one arg — a second (even
        # defaulted) parameter makes PySpark pass the element *index*.
        return F.size(F.filter(words, lambda w: w.isin(markers)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    s = {k: F.col(f"s_{k}") for k in LANG_MARKERS}
    predicted = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return (
        docs.select(
            "doc_id", "lang",
            *[scores[k].alias(f"s_{k}") for k in LANG_MARKERS],
        )
        .select(
            "doc_id", "lang", "s_en", "s_de", "s_es", "s_fr",
            predicted.alias("predicted_lang"),
        )
        .withColumn("is_match", F.col("predicted_lang") == F.col("lang"))
    )


def _markers_sql(lang: str) -> str:
    return ",".join(f"'{w}'" for w in LANG_MARKERS[lang])


Q_LANG_ID_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(words, w -> w IN ({_markers_sql('en')}))) AS s_en,
         len(list_filter(words, w -> w IN ({_markers_sql('de')}))) AS s_de,
         len(list_filter(words, w -> w IN ({_markers_sql('es')}))) AS s_es,
         len(list_filter(words, w -> w IN ({_markers_sql('fr')}))) AS s_fr
  FROM (SELECT doc_id, lang,
               list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
        FROM documents)
)
SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS predicted_lang,
       (CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr' END) = lang AS is_match
FROM scored
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace tokens, BPE-ish regex tokens
    (word pieces + standalone punctuation), chars/4 subword estimate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("ws_tokens"),
        F.regexp_count("text", F.lit("\\w+|[^\\w\\s]")).alias("regex_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("subword_est"),
    )


Q_TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS ws_tokens,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))                AS regex_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT)                       AS subword_est
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (reference 2.A#24 dedups on exact name+content strings; this is the
    canonicalized version used as a dedup key at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


Q_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


TFIDF_TOP_N = 3


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top terms per document: tokenize → term frequency →
    document frequency → ln(N/df) weighting → top-3 terms by score.

    Scale: the explode fans each doc into its tokens once; TF and DF are
    partial-aggregating groupBys; DF is vocabulary-sized → broadcast back.
    ln and rounding computed identically on both engines; rank ties broken
    on the term string so the top-3 is total-ordered.
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    n_docs = docs.count()  # scalar dimension of the corpus, fixed per sf
    tokens = docs.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("term")
    ).filter(~F.col("term").isin(STOPWORDS))
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tokens.select("doc_id", "term").distinct() \
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window as W
    scored = (
        tf.join(F.broadcast(df_), "term")
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_N)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


Q_TFIDF_SQL = f"""
WITH tokens AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                        w -> w <> '' AND w NOT IN ({",".join("'" + w + "'" for w in STOPWORDS)}))) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, tfidf, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored)
WHERE rank <= {TFIDF_TOP_N}
"""


def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% systematic sample of lineitem via an md5 hash-mod
    gate on the row key — the engine-portable form of TABLESAMPLE (builtin
    sample() seeds don't reproduce across engines or partitionings).
    At 100 TB the same predicate pushes into the scan filter and the sample
    is stable across retries — the property training-data subsampling needs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    gate = F.conv(F.substring(F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")), 1, 4), 16, 10) \
        .cast("long") % 100
    return (
        li.filter(gate < 5)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("l_extendedprice"), 2).alias("sampled_revenue"),
        )
        .orderBy("l_returnflag")
    )


Q_SAMPLE_SQL = """
SELECT l_returnflag, count(*) AS n_sampled,
       round(sum(l_extendedprice), 2) AS sampled_revenue
FROM lineitem
WHERE CAST(('0x' || substr(md5(l_orderkey || '|' || l_linenumber), 1, 4)) AS BIGINT) % 100 < 5
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family): a doc
    whose mass concentrates in few distinct words/bigrams is boilerplate or
    spam, not prose. Pure higher-order array math per row — no shuffle, no
    explode; the duplicate-fraction trick is 1 - distinct/total.

    Columns: dup_word_ratio, dup_bigram_ratio (fraction of tokens that are
    repeats), top_word_dominance (mass of the single most frequent word).
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    words = _words(F.col("text"))
    n_words = F.size(words)
    # n-1 bigrams via an index sequence (sequence(1,0) would count DOWN, so
    # guard the <2-word case); one-arg lambda only — see module invariant
    bigrams = F.when(
        n_words >= 2,
        F.transform(
            F.sequence(F.lit(1), n_words - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    top_freq = F.array_max(
        F.transform(F.array_distinct(words),
                    lambda w: F.size(F.filter(words, lambda x: x == w)))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(words))
                / F.greatest(n_words, F.lit(1)), 6).alias("dup_word_ratio"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(bigrams))
                / F.greatest(n_bi, F.lit(1)), 6).alias("dup_bigram_ratio"),
        F.round(top_freq / F.greatest(n_words, F.lit(1)), 6)
        .alias("top_word_dominance"),
    )


Q_TEXT_REPETITION_SQL = """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), m AS (
  SELECT doc_id, words, len(words) AS n_words,
         list_transform(range(1, greatest(len(words), 1)),
                        i -> words[i] || ' ' || words[i + 1]) AS bigrams
  FROM base
)
SELECT doc_id,
       n_words,
       round(1.0 - len(list_distinct(words)) * 1.0 / greatest(n_words, 1), 6)
         AS dup_word_ratio,
       round(1.0 - len(list_distinct(bigrams)) * 1.0 / greatest(len(bigrams), 1), 6)
         AS dup_bigram_ratio,
       round(list_max(list_transform(list_distinct(words),
                      w -> len(list_filter(words, x -> x = w))))
             * 1.0 / greatest(n_words, 1), 6) AS top_word_dominance
FROM m
"""


BENCHMARK_MOD = 50  # doc_id % 50 == 0 → the held-out "benchmark" slice


def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    3-word shingle with a held-out benchmark set (here: doc_id % 50 == 0,
    standing in for an eval suite) — the n-gram-overlap rule LLM pipelines
    run before training.

    Shape: inverted-index equi-join on the shingle value between the
    (small) benchmark shingle relation and the corpus shingle relation —
    never a document cross join; cost is bounded by shingle selectivity ×
    benchmark size. At 100 TB the benchmark side is broadcast.
    """
    from .dedup import _shingles

    docs = load_table(spark, sf_dir, "documents", widen=True)
    sh = docs.select("doc_id", F.explode(_shingles(F.col("text"))).alias("s"))
    bench = sh.filter(F.col("doc_id") % BENCHMARK_MOD == 0) \
        .select(F.col("doc_id").alias("bench_id"), "s").distinct()
    train = sh.filter(F.col("doc_id") % BENCHMARK_MOD != 0)
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


def _decontaminate_sql() -> str:
    from .dedup import _SHINGLES_SQL, _WORDS_SQL

    return Q_TEXT_DECONTAMINATE_TEMPLATE.format(
        shingles=_SHINGLES_SQL, words=_WORDS_SQL)


Q_TEXT_DECONTAMINATE_TEMPLATE = f"""
WITH sh AS (
  SELECT doc_id, unnest({{shingles}}) AS s
  FROM (SELECT doc_id, {{words}} AS words FROM documents)
), bench AS (
  SELECT DISTINCT doc_id AS bench_id, s FROM sh WHERE doc_id % {BENCHMARK_MOD} = 0
), train AS (
  SELECT doc_id, s FROM sh WHERE doc_id % {BENCHMARK_MOD} <> 0
)
SELECT t.doc_id,
       count(DISTINCT t.s)        AS n_shared_shingles,
       count(DISTINCT b.bench_id) AS n_benchmark_docs
FROM train t JOIN bench b ON t.s = b.s
GROUP BY t.doc_id
"""


STRATUM_TARGET = 50  # per-language sample budget


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: cap every language at STRATUM_TARGET docs with
    a per-stratum deterministic hash gate — the balanced-mixture step of a
    corpus build (English can't drown the tail languages).

    rate_g = min(1, target / |g|); keep doc iff md5-hash(doc_id) % 1e6 <
    rate_g * 1e6. Per-group counts are a tiny aggregate broadcast back
    onto the corpus — one shuffle for the counts, zero for the gate.
    Output is per-language totals (stable, small) rather than the sampled
    rows themselves.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    gate = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10) \
        .cast("long") % 1_000_000
    rate = F.least(F.lit(1.0), F.lit(float(STRATUM_TARGET)) / F.col("n_docs"))
    return (
        docs.join(F.broadcast(counts), "lang")
        .withColumn("_keep", gate < (rate * 1_000_000).cast("long"))
        .groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.sum(F.col("_keep").cast("long")).alias("n_sampled"),
            F.round(F.max(rate), 6).alias("rate"),
        )
        .orderBy("lang")
    )


Q_SAMPLE_STRATIFIED_SQL = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
), gated AS (
  SELECT d.lang, c.n_docs,
         least(1.0, {STRATUM_TARGET}.0 / c.n_docs) AS rate,
         CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 1000000
                   < CAST(floor(least(1.0, {STRATUM_TARGET}.0 / c.n_docs) * 1000000) AS BIGINT)
              THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN counts c USING (lang)
)
SELECT lang, max(n_docs) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_sampled,
       round(max(rate), 6) AS rate
FROM gated GROUP BY lang ORDER BY lang
"""


QUERIES = {
    "text_stats": q_text_stats,
    "text_lang_id": q_lang_id,
    "text_token_count": q_token_count,
    "text_fingerprint": q_fingerprint,
    "text_tfidf_top_terms": q_tfidf_top_terms,
    "text_repetition": q_text_repetition,
    "text_decontaminate": q_text_decontaminate,
    "sample_systematic": q_sample_systematic,
    "sample_stratified": q_sample_stratified,
}

ORACLE = {
    "text_stats": Q_TEXT_STATS_SQL,
    "text_lang_id": Q_LANG_ID_SQL,
    "text_token_count": Q_TOKEN_COUNT_SQL,
    "text_fingerprint": Q_FINGERPRINT_SQL,
    "text_tfidf_top_terms": Q_TFIDF_SQL,
    "text_repetition": Q_TEXT_REPETITION_SQL,
    "text_decontaminate": _decontaminate_sql(),
    "sample_systematic": Q_SAMPLE_SQL,
    "sample_stratified": Q_SAMPLE_STRATIFIED_SQL,
}
