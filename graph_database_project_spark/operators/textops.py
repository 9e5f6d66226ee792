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
    partial-aggregating groupBys; DF is vocabulary-sized — unbounded at
    corpus scale, so its join carries no forced broadcast hint (AQE
    broadcasts it locally; a 100 TB vocabulary shuffles keyed).
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
        tf.join(df_, "term")
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


# --- co-occurrence PMI -------------------------------------------------------
PMI_TOP_N = 20
PMI_MIN_PAIR_DOCS = 5   # support floor: pairs below this are noise
PMI_MAX_DOC_TERMS = 16  # scale cap on distinct terms paired per doc -- SMALLER
# than this corpus vocabulary (~31), so the slice is exercised, not dead


def q_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level term co-occurrence PMI: for term pairs (a < b)
    appearing together in ≥ ``PMI_MIN_PAIR_DOCS`` documents, report
    pmi = ln(N · docs(a,b) / (docs(a) · docs(b))) — the association-mining
    signal behind collocation extraction and embedding-evaluation suites.

    Scale shape: per-doc DISTINCT terms (array_distinct, in-codegen, capped
    at ``PMI_MAX_DOC_TERMS`` by slicing the sorted term array — the cap is
    what bounds the O(m²) pair fan-out per document at 100 TB); pairs come
    from one posexplode×element loop expressed as a self-join of the
    exploded (doc, term) relation on doc_id with a < b, which Catalyst
    executes as a single shuffle on doc_id reused by both sides; unigram
    doc-frequencies are vocabulary-sized (hint-free: stats decide the
    join strategy — vocabularies grow with the corpus). Top-N is
    TakeOrderedAndProject on (pmi desc, a, b).
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    n_docs = docs.count()  # corpus-size scalar, fixed per sf
    terms = docs.select(
        "doc_id",
        F.slice(F.array_sort(F.array_distinct(_words(F.col("text")))),
                1, PMI_MAX_DOC_TERMS).alias("terms"),
    )
    # tok is referenced 3× (df counts + both self-join sides) and each
    # reference re-expands the tokenize→sort→slice subtree into its own
    # corpus scan (4 scans measured) — materialize once, the same
    # "tokenize once, reuse across the family" move as dedup._shingle_rel;
    # at cluster scale this relation is the persisted tokenized table
    tok = (terms.select("doc_id", F.explode("terms").alias("t"))
           .localCheckpoint(eager=True))
    dfreq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    a = tok.select("doc_id", F.col("t").alias("a"))
    b = tok.select("doc_id", F.col("t").alias("b"))
    pairs = (a.join(b, "doc_id").filter(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("pair_docs"))
             .filter(F.col("pair_docs") >= PMI_MIN_PAIR_DOCS))
    scored = (
        pairs
        .join(dfreq.select(F.col("t").alias("a"),
                            F.col("df").alias("df_a")), "a")
        .join(dfreq.select(F.col("t").alias("b"),
                            F.col("df").alias("df_b")), "b")
        .withColumn("pmi_raw",
                    F.log(F.lit(float(n_docs)) * F.col("pair_docs")
                          / (F.col("df_a") * F.col("df_b"))))
    )
    return (scored.orderBy(F.desc("pmi_raw"), "a", "b").limit(PMI_TOP_N)
            .select("a", "b", "pair_docs", "df_a", "df_b",
                    F.round("pmi_raw", 6).alias("pmi")))


Q_COOCCUR_PMI_SQL = f"""
WITH terms AS (
  SELECT doc_id,
         list_slice(list_sort(list_distinct(
           list_filter(string_split(lower(text), ' '), w -> w <> ''))),
           1, {PMI_MAX_DOC_TERMS}) AS terms
  FROM documents
), tok AS (
  SELECT doc_id, unnest(terms) AS t FROM terms
), dfreq AS (
  SELECT t, count(*) AS df FROM tok GROUP BY t
), pairs AS (
  SELECT x.t AS a, y.t AS b, count(*) AS pair_docs
  FROM tok x JOIN tok y ON x.doc_id = y.doc_id AND x.t < y.t
  GROUP BY x.t, y.t
  HAVING count(*) >= {PMI_MIN_PAIR_DOCS}
), scored AS (
  SELECT p.a, p.b, p.pair_docs, da.df AS df_a, db.df AS df_b,
         ln((SELECT count(*) FROM documents) * 1.0 * p.pair_docs
            / (da.df * db.df)) AS pmi_raw
  FROM pairs p
  JOIN dfreq da ON da.t = p.a
  JOIN dfreq db ON db.t = p.b
)
SELECT a, b, pair_docs, df_a, df_b, round(pmi_raw, 6) AS pmi
FROM scored
ORDER BY pmi_raw DESC, a, b
LIMIT {PMI_TOP_N}
"""


# --- BM25 keyword search -----------------------------------------------------
# Fixed query terms (the serving-path shape: terms arrive with the request
# and are a broadcast-sized constant; the corpus is the big side). Okapi
# parameters are the textbook defaults.
BM25_TERMS = ["vector", "join", "stream"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_N = 15


def _term_tf(words, term: str):
    # one-arg lambda ONLY: a second parameter (even a defaulted `t=t`
    # closure hack) makes PySpark pass the element INDEX as that argument
    return F.size(F.filter(words, lambda w: w == F.lit(term)))


def bm25_arm(spark: SparkSession, sf_dir: str, cand: int,
             exclude_doc: int | None = None) -> DataFrame:
    """Shared Okapi BM25 scoring arm (used by q_bm25_search and the hybrid
    RRF fusion — factored per the r08 advisor so the two call-sites cannot
    drift). Returns the top-``cand`` positive-scoring docs as
    (doc_id, dl, tf_*, bm25_raw), total-ordered (score desc, doc_id).

    Scale shape: per-doc term frequencies come from higher-order array
    functions over the tokenized text — no explode, no per-term shuffle, the
    scan stays in whole-stage codegen. The only aggregation is the 1-row
    corpus-stats relation (N, avgdl, per-term df — a fixed-width partial
    agg), broadcast back onto the scan; ranking is a TakeOrderedAndProject.
    At 100 TB: one pass over documents + a driver-sized broadcast — the same
    plan, with the df sidecar optionally precomputed as a tiny stats table.

    idf uses the non-negative Okapi variant ln(1 + (N - df + .5)/(df + .5)).
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    if exclude_doc is not None:
        docs = docs.filter(F.col("doc_id") != exclude_doc)
    words = _words(F.col("text"))
    # per feeds BOTH the stats aggregate and the scoring pass; without
    # materialization each reference re-tokenizes the raw text (2 corpus
    # scans measured). The checkpointed relation is NARROW (5 numeric
    # columns, no text) — at cluster scale it is the per-doc tf sidecar
    # you'd persist, read twice cheaply instead of tokenizing twice.
    per = docs.select(
        "doc_id",
        F.size(words).alias("dl"),
        *[_term_tf(words, t).alias(f"tf_{t}") for t in BM25_TERMS],
    ).localCheckpoint(eager=True)
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
          for t in BM25_TERMS],
    )
    k1, b = F.lit(float(BM25_K1)), F.lit(float(BM25_B))
    contrib = [
        F.log(F.lit(1.0) + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
              / (F.col(f"df_{t}") + F.lit(0.5)))
        * (F.col(f"tf_{t}") * (k1 + F.lit(1.0)))
        / (F.col(f"tf_{t}") + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl")))
        for t in BM25_TERMS
    ]
    score = sum(contrib[1:], contrib[0])
    # full-precision score drives the ordering; rounding (if any) happens in
    # the caller's final select (lateral-alias trap: never round-then-reuse)
    return (per.crossJoin(F.broadcast(stats))
            .withColumn("bm25_raw", score)
            .filter(F.col("bm25_raw") > 0)
            .orderBy(F.desc("bm25_raw"), F.asc("doc_id"))
            .limit(cand)
            .select("doc_id", "dl", *[f"tf_{t}" for t in BM25_TERMS],
                    "bm25_raw"))


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 keyword search: score every document against a fixed
    query-term set and return the top-``BM25_TOP_N`` hits (reference
    2.A#7/#12 answers content questions over stored documents; this is the
    ranked-retrieval form an LLM-data pipeline uses for corpus search and
    RAG-candidate generation). Scoring plan: see bm25_arm.

    Ties (score, doc_id) are total-ordered; score rounded AFTER ranking so
    the order matches the full-precision oracle rank.
    """
    ranked = bm25_arm(spark, sf_dir, BM25_TOP_N)
    return ranked.select(
        "doc_id", "dl",
        *[f"tf_{t}" for t in BM25_TERMS],
        F.round("bm25_raw", 6).alias("bm25"),
    )


def _bm25_sql() -> str:
    k1 = f"CAST({float(BM25_K1)!r} AS DOUBLE)"
    b = f"CAST({float(BM25_B)!r} AS DOUBLE)"
    tf_cols = ",\n         ".join(
        f"len(list_filter(words, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS)
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS)
    contrib = " + ".join(
        f"ln(1 + (n_docs - df_{t} + CAST(0.5 AS DOUBLE)) / (df_{t} + CAST(0.5 AS DOUBLE)))"
        f" * (tf_{t} * ({k1} + 1.0))"
        f" / (tf_{t} + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        for t in BM25_TERMS)
    tf_list = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
), per AS (
  SELECT doc_id, len(words) AS dl,
         {tf_cols}
  FROM w
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         {df_cols}
  FROM per
), scored AS (
  SELECT per.*, {contrib} AS bm25_raw
  FROM per CROSS JOIN stats
)
SELECT doc_id, dl, {tf_list}, round(bm25_raw, 6) AS bm25
FROM scored
WHERE bm25_raw > 0
ORDER BY bm25_raw DESC, doc_id
LIMIT {BM25_TOP_N}
"""


# --- hybrid retrieval fusion (BM25 ⊕ embedding cosine, RRF) ------------------
# The RAG serving-path shape: a lexical arm and a semantic arm each nominate
# top-RRF_CAND candidates, fused by reciprocal-rank fusion
# score(d) = Σ_arms 1/(K + rank_arm(d)) (Cormack, Clarke & Buettcher 2009,
# K = 60 the standard constant). Ranks are exact integers, so the fused
# score is emitted as ALL-INTEGER ppm via floor division — bit-exact under
# the driver hash with no float caveat. documents.doc_id and
# embeddings.vec_id share the 0..N-1 id space (one embedding per document,
# TESTDATA.md); doc 0 is the pinned query (its text terms are BM25_TERMS'
# corpus-side twin, its vector is the cosine probe), excluded from both
# arms as the self-hit.
RRF_K = 60
RRF_CAND = 50     # per-arm candidate cap (the broadcast-sized serving bound)
RRF_TOP_N = 15


def q_text_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid BM25 ⊕ cosine retrieval with reciprocal-rank fusion.

    Scale shape: each arm is the already-proven scale plan — BM25 is one
    documents pass + a 1-row broadcast stats relation + TakeOrdered to
    ``RRF_CAND`` (see q_bm25_search); the cosine arm is one embeddings
    pass against a 1-row broadcast query vector + TakeOrdered. Ranks are
    then assigned by a row_number window over the ≤``RRF_CAND``-row arm
    results (constant-bounded — the global window never sees the corpus),
    and the fusion join is tiny×tiny. At 100 TB both arms stay
    single-pass + driver-sized reductions; nothing corpus-sized shuffles.

    Determinism: arm ranks are total-ordered (full-precision score desc,
    id) — the same full-precision-order-then-round discipline both arm
    flagships are bit-exact-green under; fused output is integer ppm.
    """
    from pyspark.sql import Window as W

    from .similarity import cosine_arm  # function-level: keeps module graphs acyclic

    bm_top = bm25_arm(spark, sf_dir, RRF_CAND, exclude_doc=0)
    bm = bm_top.select(
        "doc_id",
        F.row_number().over(
            W.orderBy(F.desc("bm25_raw"), F.asc("doc_id")))
        .cast("long").alias("bm25_rank"))
    cs = cosine_arm(spark, sf_dir, RRF_CAND)
    # rrf_ppm via withColumn over the RAW nullable ranks BEFORE the
    # coalesced aliases exist — a coalesce alias named bm25_rank in the
    # same select would lateral-shadow the input and hand a missing arm
    # 1000000 div 60 instead of 0 (CLAUDE.md lateral-alias trap), while
    # DuckDB's NULL-propagating div correctly yields 0.
    joined = (bm.join(cs, "doc_id", "full_outer")
              .withColumn(
                  "rrf_ppm",
                  (F.coalesce(F.expr(f"1000000 div ({RRF_K} + bm25_rank)"),
                              F.lit(0))
                   + F.coalesce(F.expr(f"1000000 div ({RRF_K} + cos_rank)"),
                                F.lit(0))).cast("long")))
    fused = joined.select(
        "doc_id",
        F.coalesce("bm25_rank", F.lit(0)).cast("long").alias("bm25_rank"),
        F.coalesce("cos_rank", F.lit(0)).cast("long").alias("cos_rank"),
        "rrf_ppm")
    return (fused.orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
            .limit(RRF_TOP_N))


def _hybrid_rrf_sql() -> str:
    k1 = f"CAST({float(BM25_K1)!r} AS DOUBLE)"
    b = f"CAST({float(BM25_B)!r} AS DOUBLE)"
    tf_cols = ",\n         ".join(
        f"len(list_filter(words, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS)
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS)
    contrib = " + ".join(
        f"ln(1 + (n_docs - df_{t} + CAST(0.5 AS DOUBLE)) / (df_{t} + CAST(0.5 AS DOUBLE)))"
        f" * (tf_{t} * ({k1} + 1.0))"
        f" / (tf_{t} + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        for t in BM25_TERMS)
    from .similarity import EMBED_DIM
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents WHERE doc_id <> 0
), per AS (
  SELECT doc_id, len(words) AS dl,
         {tf_cols}
  FROM w
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         {df_cols}
  FROM per
), bmtop AS (
  SELECT doc_id, {contrib} AS bm25_raw
  FROM per CROSS JOIN stats
  WHERE {contrib} > 0
  ORDER BY bm25_raw DESC, doc_id
  LIMIT {RRF_CAND}
), bm AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25_raw DESC, doc_id) AS bm25_rank
  FROM bmtop
), q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), cstop AS (
  SELECT e.vec_id AS doc_id,
         list_sum(list_transform(range(1, {EMBED_DIM} + 1),
                  i -> CAST(e.embedding AS DOUBLE[])[i] * q.qv[i]))
         / (sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
  ORDER BY cos_raw DESC, doc_id
  LIMIT {RRF_CAND}
), cs AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cos_raw DESC, doc_id) AS cos_rank
  FROM cstop
), fused AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         CAST(COALESCE(b.bm25_rank, 0) AS BIGINT) AS bm25_rank,
         CAST(COALESCE(c.cos_rank, 0) AS BIGINT) AS cos_rank,
         CAST(COALESCE(1000000 // ({RRF_K} + b.bm25_rank), 0)
              + COALESCE(1000000 // ({RRF_K} + c.cos_rank), 0) AS BIGINT)
           AS rrf_ppm
  FROM bm b FULL OUTER JOIN cs c ON b.doc_id = c.doc_id
)
SELECT doc_id, bm25_rank, cos_rank, rrf_ppm
FROM fused
ORDER BY rrf_ppm DESC, doc_id
LIMIT {RRF_TOP_N}
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


# --- PII redaction -----------------------------------------------------------
# The synthetic corpus carries no PII, so the query deterministically injects
# it first (emails/phones/IPs derived from doc_id — the same
# augment-then-operate pattern the multimodal codecs use) and then runs the
# real scrubber over the augmented text. Patterns are kept to the syntax
# subset Java regex and RE2 (DuckDB) agree on: character classes, +, {n}.
PII_EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
PII_PHONE_RE = r"555-[0-9]{4}"
PII_IP_RE = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus: count and redact emails, phone
    numbers, and IPv4 addresses (the minimum a training-data pipeline
    scrubs before anything ships). Injection varies on doc_id % 3/4/7 so
    every combination of hit-counts (including zero) is exercised.

    Scale: pure per-row projection — no shuffle, no UDF; regexp work stays
    inside whole-stage codegen, so this runs at scan speed at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit(" call 555-"),
                        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
               ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
                        F.lit("."), (F.col("doc_id") % 100).cast("string"))
               ).otherwise(F.lit("")),
    )
    d = docs.withColumn("_aug", aug)
    n_emails = F.size(F.regexp_extract_all("_aug", F.lit(PII_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all("_aug", F.lit(PII_PHONE_RE), 0))
    n_ips = F.size(F.regexp_extract_all("_aug", F.lit(PII_IP_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("_aug", PII_EMAIL_RE, "[EMAIL]"),
            PII_IP_RE, "[IP]"),
        PII_PHONE_RE, "[PHONE]")
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        (n_emails + n_phones + n_ips).alias("n_pii"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_hash"),
    )


Q_PII_REDACT_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 100 AS VARCHAR)
                 ELSE '' END AS t
  FROM documents
), red AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS n_phones,
         len(regexp_extract_all(t, '{PII_IP_RE}'))    AS n_ips,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
             '{PII_IP_RE}', '[IP]', 'g'),
           '{PII_PHONE_RE}', '[PHONE]', 'g') AS redacted
  FROM aug
)
SELECT doc_id, n_emails, n_phones, n_ips,
       n_emails + n_phones + n_ips AS n_pii,
       length(redacted) AS redacted_len,
       md5(redacted) AS redacted_hash
FROM red
"""


# --- Gopher-style quality filter battery -------------------------------------
# Rule thresholds are tuned so every rule actually splits THIS corpus (word
# counts span 10-99, mean word length 3.7-5.3, stopword ratio 0-0.22,
# distinct-word ratio 0.28-1.0 at sf0.01) — a rule no document can fail is
# dead, untested variation (same trap as the multimodal dims formulas).


def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic filter battery: each document gets a
    boolean per rule plus a comma-joined ``fail_reasons`` audit column —
    the reject-with-reason shape a curation pipeline logs so filter drift
    is debuggable. Pure projection, no shuffle, codegen-friendly.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    mwl = (
        F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / F.greatest(n_words, F.lit(1))
    )
    sr = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))) / F.greatest(n_words, F.lit(1))
    dr = F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1))
    d = (
        docs.withColumn("n_words", n_words)
        .withColumn("_mwl", mwl).withColumn("_sr", sr).withColumn("_dr", dr)
    )
    r_wc = F.col("n_words").between(30, 90)
    r_mwl = F.col("_mwl").between(4.0, 5.0)
    r_sr = F.col("_sr") >= 0.03
    r_dr = F.col("_dr") >= 0.35
    reasons = F.concat_ws(
        ",",
        F.when(~r_wc, F.lit("word_count")),
        F.when(~r_mwl, F.lit("mean_word_len")),
        F.when(~r_sr, F.lit("stopword_ratio")),
        F.when(~r_dr, F.lit("distinct_ratio")),
    )
    return d.select(
        "doc_id",
        "n_words",
        F.round("_mwl", 4).alias("mean_word_len"),
        F.round("_sr", 6).alias("stopword_ratio"),
        F.round("_dr", 6).alias("distinct_ratio"),
        (r_wc & r_mwl & r_sr & r_dr).alias("passes"),
        reasons.alias("fail_reasons"),
    )


Q_QUALITY_GOPHER_SQL = f"""
WITH m AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), s AS (
  SELECT doc_id,
         len(words) AS n_words,
         list_sum(list_transform(words, w -> CAST(length(w) AS BIGINT)))
           * 1.0 / greatest(len(words), 1) AS mwl,
         len(list_filter(words, w -> w IN ({",".join("'" + w + "'" for w in STOPWORDS)})))
           * 1.0 / greatest(len(words), 1) AS sr,
         len(list_distinct(words)) * 1.0 / greatest(len(words), 1) AS dr
  FROM m
)
SELECT doc_id, n_words,
       round(mwl, 4) AS mean_word_len,
       round(sr, 6) AS stopword_ratio,
       round(dr, 6) AS distinct_ratio,
       (n_words BETWEEN 30 AND 90) AND (mwl BETWEEN 4.0 AND 5.0)
         AND sr >= 0.03 AND dr >= 0.35 AS passes,
       concat_ws(',',
         CASE WHEN NOT (n_words BETWEEN 30 AND 90) THEN 'word_count' END,
         CASE WHEN NOT (mwl BETWEEN 4.0 AND 5.0) THEN 'mean_word_len' END,
         CASE WHEN NOT (sr >= 0.03) THEN 'stopword_ratio' END,
         CASE WHEN NOT (dr >= 0.35) THEN 'distinct_ratio' END) AS fail_reasons
FROM s
"""


# --- Cross-corpus span-level dedup -------------------------------------------
SPAN_WORDS = 3  # chunk width; 3 gives ~19% duplicate chunks on this corpus


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (sub-document) deduplication: split every document into
    fixed-width word chunks, keep only the globally-first occurrence of
    each chunk (first = smallest (doc_id, chunk_idx)), and report per-doc
    kept/dropped counts — the paragraph-dedup step of RefinedWeb/Dolma
    pipelines, expressed over this corpus's word-soup granularity.

    Scale: chunks shuffle ONCE on their content hash (the dedup window),
    then once more back to doc grain — both keyed, no all-pairs anywhere.
    At 100 TB the md5 keys are uniform so the window partitioning has no
    skew; the heavy text column never crosses a shuffle (only 32-char
    hashes and ids do).
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_chunks = F.ceil(F.size(words) / F.lit(float(SPAN_WORDS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * SPAN_WORDS + 1, SPAN_WORDS), " "),
    )
    exploded = (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        # only the 32-char hash + ids cross the shuffle, never the text
        .select("doc_id", "chunk_idx", F.md5("chunk").alias("h"))
    )
    w = W.partitionBy("h").orderBy("doc_id", "chunk_idx")
    flagged = exploded.withColumn("rn", F.row_number().over(w))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_dropped"),
        )
        .withColumn("drop_ratio", F.round(F.col("n_dropped") / F.col("n_chunks"), 6))
    )


Q_SPAN_DEDUP_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
), sized AS (
  SELECT doc_id, words,
         CAST(ceil(len(words) / {SPAN_WORDS}.0) AS INT) AS nch
  FROM w
), c AS (
  -- two same-length unnests in one SELECT zip together
  SELECT doc_id,
         unnest(range(0, nch)) AS chunk_idx,
         unnest(list_transform(range(0, nch),
                i -> md5(array_to_string(
                       list_slice(words, CAST(i AS INT) * {SPAN_WORDS} + 1,
                                  CAST(i AS INT) * {SPAN_WORDS} + {SPAN_WORDS}), ' ')))) AS h
  FROM sized
), flagged AS (
  SELECT doc_id, chunk_idx,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
  FROM c
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS drop_ratio
FROM flagged
GROUP BY doc_id
"""


# --- Python UDTF seam --------------------------------------------------------
try:  # pyspark >= 4: table-valued Python functions
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="idx: int, bigram: string")
    class _BigramUDTF:
        """Row-at-a-time table function: one input row → (n_words - 1)
        output rows. Same word semantics as _words (lower, split on
        space, drop empties)."""

        def eval(self, text: str):
            words = [w for w in (text or "").lower().split(" ") if w]
            for i in range(len(words) - 1):
                yield i, words[i] + " " + words[i + 1]

    UDTF_AVAILABLE = True
except ImportError:  # pragma: no cover
    UDTF_AVAILABLE = False


def q_udtf_bigram_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF (table-valued function) via LATERAL join —
    the 1:N row-generating member of the UDF surface (scalar pandas_udf:
    udf_embedding_norm; batch map: multimodal codecs; this: table
    functions). Emits every adjacent word bigram with its position.

    This is DELIBERATELY the slow path: UDTFs run row-at-a-time Python.
    The engine's production form of this exact computation is the
    higher-order-function pipeline (see text_* queries / text_span_dedup's
    chunker) which stays in codegen — the DuckDB oracle here IS that
    declarative form, so parity also proves the two forms agree. Use a
    UDTF only when per-row logic genuinely can't be expressed with
    built-ins (external parsers, tokenizers).
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("bigrams_udtf", _BigramUDTF)
    return spark.sql(
        "SELECT d.doc_id, t.idx, t.bigram "
        "FROM _udtf_docs d, LATERAL bigrams_udtf(d.text) AS t"
    )


Q_UDTF_BIGRAM_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
       CAST(unnest(range(0, greatest(len(words) - 1, 0))) AS INT) AS idx,
       unnest(list_transform(range(0, greatest(len(words) - 1, 0)),
              i -> words[CAST(i AS INT) + 1] || ' ' || words[CAST(i AS INT) + 2]))
         AS bigram
FROM w
"""


CHUNK_TOKENS = 32  # window size (whitespace tokens)
CHUNK_STRIDE = 24  # step between window starts → 8-token overlap


def q_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-ingestion chunking: split every document into fixed-size
    overlapping token windows (CHUNK_TOKENS tokens, CHUNK_STRIDE step),
    emitting per chunk its position, exact token count, first token, and
    an md5 content fingerprint — the unit a retrieval index embeds and a
    training pipeline packs. Chunk count per doc is
    ``(max(n−W, 0) + S − 1) div S + 1`` (every token is covered; the last
    window may be short; empty docs emit nothing).

    Scale: pure per-row compute — tokenize once, explode the start
    offsets, slice. ZERO shuffles, no UDFs; the text column never leaves
    its scan partition and the output is chunk-metadata-sized (the
    embedding step downstream is where bytes multiply, not here).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _words(F.col("text")).alias("words"),
    ).withColumn("n", F.size("words")).filter(F.col("n") > 0)
    n_chunks = F.expr(
        f"(greatest(n - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE} - 1) "
        f"div {CHUNK_STRIDE} + 1")
    chunks = (toks.withColumn("chunk_idx",
                              F.explode(F.sequence(F.lit(0), n_chunks - 1)))
              .withColumn("start_token", F.col("chunk_idx") * CHUNK_STRIDE)
              .withColumn("w", F.expr(
                  f"slice(words, start_token + 1, {CHUNK_TOKENS})")))
    return chunks.select(
        "doc_id", "chunk_idx", "start_token",
        F.size("w").alias("chunk_tokens"),
        F.element_at("w", 1).alias("first_token"),
        F.md5(F.concat_ws(" ", "w")).alias("chunk_md5"),
    )


Q_TEXT_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
  FROM documents
), sized AS (
  SELECT doc_id, words, len(words) AS n FROM toks WHERE len(words) > 0
), exploded AS (
  SELECT doc_id, words,
         CAST(unnest(range(0, (greatest(n - {CHUNK_TOKENS}, 0)
                               + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1))
              AS BIGINT) AS chunk_idx
  FROM sized
), sliced AS (
  SELECT doc_id, chunk_idx,
         chunk_idx * {CHUNK_STRIDE} AS start_token,
         list_slice(words, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT),
                    CAST(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS} AS INT)) AS w
  FROM exploded
)
SELECT doc_id, chunk_idx, start_token,
       CAST(len(w) AS INT) AS chunk_tokens,
       w[1] AS first_token,
       md5(array_to_string(w, ' ')) AS chunk_md5
FROM sliced
"""


def q_dedup_chunk_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup over the ``text_chunk_windows``
    output — the pass an LLM pipeline runs AFTER chunking, because
    near-identical documents share most chunks while differing enough to
    survive document-level dedup. Canonical owner of a fingerprint =
    smallest (doc_id, chunk_idx); per document: chunks produced, chunks
    owned (canonical here), chunks dropped as duplicates of another
    doc's canonical, and retention in integer ppm.

    Scale: one shuffle keyed on the md5 fingerprint (min_by canonical —
    map-side combined), one broadcast-back join onto the chunk relation
    keyed the same way, one per-doc aggregation. The text itself never
    shuffles: only (md5, doc_id, chunk_idx) triples cross the wire.
    """
    ch = q_text_chunk_windows(spark, sf_dir).select(
        "doc_id", "chunk_idx", "chunk_md5")
    canon = ch.groupBy("chunk_md5").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("c"))
    flagged = (ch.join(canon, "chunk_md5")
               .withColumn("is_canonical",
                           (F.col("doc_id") == F.col("c.doc_id"))
                           & (F.col("chunk_idx") == F.col("c.chunk_idx"))))
    return (flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("is_canonical").cast("long")).alias("n_owned"))
        .select("doc_id", "n_chunks", "n_owned",
                (F.col("n_chunks") - F.col("n_owned")).alias("n_dropped"),
                F.expr("(n_owned * 1000000L) div n_chunks").alias("keep_ppm"))
        .orderBy("doc_id"))


Q_DEDUP_CHUNK_SQL = f"""
WITH chunks AS (
  SELECT doc_id, chunk_idx, chunk_md5 FROM ({Q_TEXT_CHUNK_SQL})
), canon AS (
  SELECT chunk_md5,
         min(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx)) AS c
  FROM chunks GROUP BY chunk_md5
), flagged AS (
  SELECT ch.doc_id,
         (ch.doc_id = cn.c.doc_id AND ch.chunk_idx = cn.c.chunk_idx)
           AS is_canonical
  FROM chunks ch JOIN canon cn USING (chunk_md5)
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_owned,
       count(*) - CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT)
         * 1000000 // count(*) AS keep_ppm
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# BPE merge learning — tokenizer training over the corpus vocabulary
# ---------------------------------------------------------------------------

BPE_ROUNDS = 6          # merge rules learned (one argmax pair per round)
BPE_MIN_LEN, BPE_MAX_LEN = 2, 20   # word-length gate for the vocab


def _bpe_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, wcnt) from documents.text: lowercase alpha runs, length-gated."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(F.explode(F.expr(
        "filter(split(lower(text), '[^a-z]+'), "
        f"x -> length(x) >= {BPE_MIN_LEN} AND length(x) <= {BPE_MAX_LEN})"))
        .alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("wcnt")))


def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge learning: the tokenizer-training loop an
    LLM data pipeline runs before anything else. ``BPE_ROUNDS`` rounds;
    each round counts adjacent symbol pairs across the vocabulary
    (frequency-weighted), picks the argmax pair (tie-break: lexicographic
    min — deterministic), and merges it everywhere.

    Semantics pinned for the oracle: symbols are ``~``-delimited
    (``hello`` → ``~h~e~l~l~o~``); a merge applies the pair pattern
    leftmost-non-overlapping in ONE pass (both engines' ``replace``), so
    an odd run like ``a b a b`` merges its first occurrence only in the
    round that learns ``a+b`` — the canonical-BPE repeat-until-fixpoint
    application is deliberately NOT emulated, because single-pass replace
    is the semantics both engines share natively (verified char-exact
    against DuckDB; divergence would surface as a driver hash fail).

    Scale: the CORPUS is touched exactly once — one scan collapses it to
    the (word, wcnt) vocabulary via map-side combine (the standard
    tokenizer-training reduction; 100 TB of text is a few million distinct
    words). Every learning round then runs on the vocab alone: pair
    explode (≤ word-length fan-out) → map-side-combined count → 1-row
    argmax broadcast → merge select. Loop state (vocab) and the 1-row
    winner are checkpointed per round, so plans stay flat and nothing
    re-derives (CLAUDE.md iterative discipline); no fixpoint probe — the
    round count is fixed.
    """
    return learn_bpe_merges(_bpe_word_counts(spark, sf_dir), BPE_ROUNDS)


def learn_bpe_merges(word_counts: DataFrame, rounds: int) -> DataFrame:
    """Core learning loop over a (word, wcnt) frame — factored out so the
    hand-corpus merge test can drive it without parquet."""
    bests, _vocab = _bpe_learn(word_counts, rounds)
    return bests


def _bpe_learn(word_counts: DataFrame, rounds: int):
    """Learning loop internals: returns (per-round winners frame, final
    segmented vocab (word, wcnt, sym)) — the vocab feeds the tokenizer
    APPLICATION operator (q_bpe_token_count)."""
    vocab = (word_counts
             .select("word", "wcnt",
                     F.concat(F.regexp_replace("word", "(.)", r"~$1"),
                              F.lit("~")).alias("sym"))
             .localCheckpoint(eager=True))
    pair_expr = (
        "CASE WHEN size(s) >= 4 THEN "
        "transform(sequence(1, size(s)-3), i -> concat('~', s[i], '~', s[i+1], '~')) "
        "ELSE CAST(array() AS array<string>) END")
    bests: list[DataFrame] = []
    for rnd in range(1, rounds + 1):
        pairs = (vocab.select("wcnt", F.split("sym", "~").alias("s"))
                 # word not needed for pair counting — dropped pre-explode
                 .select("wcnt", F.explode(F.expr(pair_expr)).alias("pat"))
                 .groupBy("pat").agg(F.sum("wcnt").alias("cnt")))
        # single-pass argmax: min_by over (−cnt, pat) = max count with
        # lexicographic-min tie-break, ONE reference to the pair-count
        # shuffle (the max+filter two-reference form re-ran it twice per
        # round — r08 review finding). min_by's struct ordering key is
        # Spark-only; the ORACLE keeps its scalar-subquery argmax
        # (DuckDB min_by rejects STRUCT keys, CLAUDE.md).
        best = (pairs.agg(
                    F.max("cnt").alias("cnt"),
                    F.min_by("pat", F.struct((-F.col("cnt")).alias("nc"),
                                             F.col("pat"))).alias("pat"))
                .select(F.lit(rnd).alias("round"), "pat", "cnt")
                .localCheckpoint(eager=True))  # 1 row; feeds merge + output
        bests.append(best)
        rep = F.expr("concat('~', replace(trim(BOTH '~' FROM pat), '~', ''), '~')")
        vocab = (vocab.crossJoin(F.broadcast(best.select("pat")))
                 .select("word", "wcnt",
                         F.replace("sym", F.col("pat"), rep).alias("sym"))
                 .localCheckpoint(eager=True))
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    out = out.select(
        "round",
        F.expr("replace(trim(BOTH '~' FROM pat), '~', ' ')").alias("pair"),
        F.expr("replace(trim(BOTH '~' FROM pat), '~', '')").alias("merged"),
        F.col("cnt").cast("long").alias("weight"),
    ).orderBy("round")
    return out, vocab


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: per-document token counts under the
    ``BPE_ROUNDS``-merge tokenizer learned by ``bpe_learn_merges`` —
    the learn → apply → count chain an LLM pipeline runs to budget
    sequence packing and price a corpus in tokens.

    Scale: learning runs on the vocab (see q_bpe_learn_merges); the
    application never re-segments text — per-doc word counts (one scan,
    map-side combined) join the segmented vocab's per-word token counts
    (hint-free: vocab is auto-broadcast locally, keyed shuffle at
    cluster vocab sizes — SCALE.md §2 broadcast policy), then one keyed
    sum per doc. All integers; compression is floor-ppm of
    tokens/alpha-chars.
    """
    _bests, vocab = _bpe_learn(_bpe_word_counts(spark, sf_dir), BPE_ROUNDS)
    docs = load_table(spark, sf_dir, "documents")
    dw = (docs.select("doc_id", F.explode(F.expr(
        "filter(split(lower(text), '[^a-z]+'), "
        f"x -> length(x) >= {BPE_MIN_LEN} AND length(x) <= {BPE_MAX_LEN})"))
        .alias("word"))
        .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("n")))
    tok = vocab.select("word",
                       (F.size(F.split("sym", "~")) - 2).alias("tok"),
                       F.length("word").alias("chars"))
    agg = (dw.join(tok, "word")
           .groupBy("doc_id")
           .agg(F.sum("n").cast("long").alias("n_words"),
                F.sum(F.col("n") * F.col("tok")).cast("long").alias("n_tokens"),
                F.sum(F.col("n") * F.col("chars")).cast("long").alias("n_chars")))
    return (agg.select("doc_id", "n_words", "n_tokens", "n_chars",
                       F.expr("n_tokens * 1000000L div n_chars")
                       .alias("compression_ppm"))
            .orderBy("doc_id"))


def _bpe_chain_sql() -> str:
    """Shared unrolled CTE chain (w → v0 → p1/b1/v1 → … → v{BPE_ROUNDS}):
    pair counts → argmax-with-min-tie-break → merged vocab per round, the
    same leftmost-non-overlapping single-pass replace. ``word`` rides
    through every v CTE so the application oracle can join back."""
    parts = [f"""
WITH w AS MATERIALIZED (
  SELECT word, count(*) AS wcnt FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                  x -> len(x) >= {BPE_MIN_LEN} AND len(x) <= {BPE_MAX_LEN})) AS word
    FROM documents) GROUP BY word
), v0 AS MATERIALIZED (
  SELECT word, wcnt, regexp_replace(word, '(.)', '~\\1', 'g') || '~' AS sym FROM w
)"""]
    for r in range(1, BPE_ROUNDS + 1):
        parts.append(f""", p{r} AS MATERIALIZED (
  SELECT pat, sum(wcnt) AS cnt FROM (
    SELECT wcnt, unnest(list_transform(
        range(2, len(string_split(sym, '~')) - 1),
        i -> '~' || string_split(sym, '~')[i] || '~'
                 || string_split(sym, '~')[i+1] || '~')) AS pat
    FROM v{r - 1}) GROUP BY pat
), b{r} AS MATERIALIZED (
  SELECT {r} AS round, min(pat) AS pat, (SELECT max(cnt) FROM p{r}) AS cnt
  FROM p{r} WHERE cnt = (SELECT max(cnt) FROM p{r})
), v{r} AS MATERIALIZED (
  SELECT word, wcnt, replace(sym, b.pat,
                       '~' || replace(trim(b.pat, '~'), '~', '') || '~') AS sym
  FROM v{r - 1}, b{r} b
)""")
    return "".join(parts)


def _bpe_sql() -> str:
    union = " UNION ALL ".join(f"SELECT * FROM b{r}"
                               for r in range(1, BPE_ROUNDS + 1))
    return _bpe_chain_sql() + f"""
SELECT round, replace(trim(pat, '~'), '~', ' ') AS pair,
       replace(trim(pat, '~'), '~', '') AS merged,
       CAST(cnt AS BIGINT) AS weight
FROM ({union}) ORDER BY round"""


def _bpe_tokens_sql() -> str:
    return _bpe_chain_sql() + f""", dw AS MATERIALIZED (
  SELECT doc_id, word, count(*) AS n FROM (
    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                  x -> len(x) >= {BPE_MIN_LEN} AND len(x) <= {BPE_MAX_LEN})) AS word
    FROM documents) GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_words,
       CAST(sum(n * (len(string_split(sym, '~')) - 2)) AS BIGINT) AS n_tokens,
       CAST(sum(n * len(word)) AS BIGINT) AS n_chars,
       CAST(sum(n * (len(string_split(sym, '~')) - 2)) * 1000000
            // sum(n * len(word)) AS BIGINT) AS compression_ppm
FROM dw JOIN v{BPE_ROUNDS} USING (word)
GROUP BY doc_id ORDER BY doc_id"""


# --- vocabulary growth profile (Heaps-law audit, r09) ------------------------
VOCAB_GROWTH_PCTS = (1, 2, 5, 10, 20, 50, 100)


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth profile: distinct-word count as a
    function of corpus prefix (by doc_id order) at fixed percentile cuts —
    the curve a tokenizer-sizing / dedup-planning job reads before fixing
    vocab size or shingle filters (sub-linear growth is what makes the
    top-V vocab cap in unigram scoring and the stop-shingle rule safe).

    Exact-integer construction: a unit's contribution to every prefix is
    fully determined by its FIRST-occurrence doc_id (one keyed min), so
    each cut is a count over first_doc ≤ threshold — never a distinct per
    cut. TWO vocabularies ride the same cuts: words (this corpus's word
    vocabulary saturates within the first 1% — ~30 planted words, itself
    a finding the curve exposes) and 3-word SHINGLES, whose space is
    combinatorial and bends sub-linearly across the whole range — the
    live dimension (CLAUDE.md dead-variation rule), and the one the
    stop-shingle/prefix-filter policies actually consume. Outputs are
    BIGINT counts only.

    Scale: first-occurrence is the same min-aggregation the exact-dedup
    survivor pick runs; the per-cut rollup is map-side combined against a
    7-row broadcast. The shingle relation is the session-persisted
    ``dedup._shingle_rel`` (one tokenize, reused family-wide), and at
    100 TB the first_doc relations ARE the incremental form — new docs
    only ever ADD rows with larger doc_ids, so the profile maintains by
    merge like every sketch in SCALE.md §7b.
    """
    from .dedup import _shingle_rel

    docs = load_table(spark, sf_dir, "documents", widen=True)
    # tok feeds first-occurrence AND per-doc counts — materialize the
    # tokenize once (the unigram/PMI/BM25 precedent; two lazy references
    # re-ran the explode over two full scans, r09 scan audit)
    tok = docs.select("doc_id", F.explode(_words(F.col("text"))).alias("word")) \
        .localCheckpoint(eager=False)
    first_w = tok.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
    first_s = (_shingle_rel(spark, sf_dir)
               .select("doc_id", F.explode("shingles").alias("s"))
               .groupBy("s").agg(F.min("doc_id").alias("first_doc")))
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    max_doc = docs.agg(F.max("doc_id").alias("max_doc"))
    # cuts is consumed three times (word cuts, shingle cuts, token cuts)
    # and embeds the max_doc aggregate — per-reference re-expansion was
    # re-scanning documents for max(doc_id) once per consumer (r15:
    # 4 documents scans → 2). 7 rows; materialize once.
    # r16: tok/cuts go LAZY — the one consuming action computes each
    # once (cached RDD) with no serial construction jobs; sharing and
    # scan counts unchanged (pinned in tests/test_plans.py)
    cuts = spark.createDataFrame([(p,) for p in VOCAB_GROWTH_PCTS],
                                 "pct int") \
        .crossJoin(F.broadcast(max_doc)) \
        .select("pct", F.expr("(pct * max_doc) div 100").alias("thr")) \
        .localCheckpoint(eager=False)

    def at_cuts(first, out):
        return (first.join(F.broadcast(cuts),
                           F.col("first_doc") <= F.col("thr"))
                .groupBy("pct").agg(F.count(F.lit(1)).alias(out)))

    toks = (per_doc.join(F.broadcast(cuts), F.col("doc_id") <= F.col("thr"))
            .groupBy("pct").agg(F.sum("n_tok").cast("long").alias("n_tokens"),
                                F.count(F.lit(1)).alias("n_docs")))
    return (at_cuts(first_w, "word_vocab")
            .join(at_cuts(first_s, "shingle_vocab"), "pct")
            .join(toks, "pct")
            .select("pct", "n_docs", "n_tokens", "word_vocab",
                    "shingle_vocab")
            .orderBy("pct"))


Q_VOCAB_GROWTH_SQL = f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS word
  FROM documents
), sh AS MATERIALIZED (
  SELECT doc_id, unnest({{_sh}}) AS s
  FROM (SELECT doc_id, {{_w}} AS words FROM documents)
), first_w AS (
  SELECT word, min(doc_id) AS first_doc FROM tok GROUP BY word
), first_s AS (
  SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s
), per_doc AS (
  SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id
), cuts AS (
  SELECT pct, pct * (SELECT max(doc_id) FROM documents) // 100 AS thr
  FROM (SELECT unnest([{", ".join(str(p) for p in VOCAB_GROWTH_PCTS)}]) AS pct)
), wv AS (
  SELECT pct, count(*) AS word_vocab FROM first_w JOIN cuts ON first_doc <= thr
  GROUP BY pct
), sv AS (
  SELECT pct, count(*) AS shingle_vocab FROM first_s JOIN cuts ON first_doc <= thr
  GROUP BY pct
), toks AS (
  SELECT pct, CAST(sum(n_tok) AS BIGINT) AS n_tokens, count(*) AS n_docs
  FROM per_doc JOIN cuts ON doc_id <= thr GROUP BY pct
)
SELECT pct, n_docs, n_tokens, word_vocab, shingle_vocab
FROM wv JOIN sv USING (pct) JOIN toks USING (pct)
ORDER BY pct
"""


def _vocab_growth_sql() -> str:
    """Substitute dedup's shared shingle/word SQL fragments so the shingle
    definition can never drift from the dedup family's."""
    from .dedup import _SHINGLES_SQL, _WORDS_SQL
    return Q_VOCAB_GROWTH_SQL.format(_sh=_SHINGLES_SQL, _w=_WORDS_SQL)


QUERIES = {
    "text_stats": q_text_stats,
    "vocab_growth_heaps": q_vocab_growth,
    "text_lang_id": q_lang_id,
    "text_chunk_windows": q_text_chunk_windows,
    "dedup_chunk_level": q_dedup_chunk_level,
    "text_token_count": q_token_count,
    "text_fingerprint": q_fingerprint,
    "text_tfidf_top_terms": q_tfidf_top_terms,
    "text_bm25_search": q_bm25_search,
    "text_hybrid_rrf": q_text_hybrid_rrf,
    "text_cooccur_pmi": q_cooccur_pmi,
    "text_repetition": q_text_repetition,
    "text_decontaminate": q_text_decontaminate,
    "sample_systematic": q_sample_systematic,
    "sample_stratified": q_sample_stratified,
    "text_pii_redact": q_pii_redact,
    "text_quality_gopher": q_quality_gopher,
    "text_span_dedup": q_span_dedup,
    "udtf_bigram_explode": q_udtf_bigram_explode,
    "bpe_learn_merges": q_bpe_learn_merges,
    "bpe_token_count": q_bpe_token_count,
}

ORACLE = {
    "text_chunk_windows": Q_TEXT_CHUNK_SQL,
    "vocab_growth_heaps": _vocab_growth_sql(),
    "dedup_chunk_level": Q_DEDUP_CHUNK_SQL,
    "text_stats": Q_TEXT_STATS_SQL,
    "text_lang_id": Q_LANG_ID_SQL,
    "text_token_count": Q_TOKEN_COUNT_SQL,
    "text_fingerprint": Q_FINGERPRINT_SQL,
    "text_tfidf_top_terms": Q_TFIDF_SQL,
    "text_bm25_search": _bm25_sql(),
    "text_hybrid_rrf": _hybrid_rrf_sql(),
    "bpe_learn_merges": _bpe_sql(),
    "bpe_token_count": _bpe_tokens_sql(),
    "text_cooccur_pmi": Q_COOCCUR_PMI_SQL,
    "text_repetition": Q_TEXT_REPETITION_SQL,
    "text_decontaminate": _decontaminate_sql(),
    "sample_systematic": Q_SAMPLE_SQL,
    "sample_stratified": Q_SAMPLE_STRATIFIED_SQL,
    "text_pii_redact": Q_PII_REDACT_SQL,
    "text_quality_gopher": Q_QUALITY_GOPHER_SQL,
    "text_span_dedup": Q_SPAN_DEDUP_SQL,
    "udtf_bigram_explode": Q_UDTF_BIGRAM_SQL,
}
