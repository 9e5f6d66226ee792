"""Corpus-curation operators for LLM training-data pipelines (north-star
extensions beyond SURVEY.md §2.B's LLM-pipeline rows): sequence packing,
deterministic sharding, domain-weight mixing, unigram LM quality scoring,
and embedding outlier audit.

These are the operations a pretraining-data job runs after filtering/dedup
(pipeline.py) and before the tokenizer: pack documents into fixed context
windows, assign output shards, rebalance the domain mix, and score documents
against corpus statistics. Everything is JVM-side built-ins — the only
Python is plan construction — and every hash is md5 (bit-identical in Spark
and DuckDB, same discipline as operators/dedup.py), so each query carries a
full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table

# Context-window budget (tokens) for sequence packing. Small enough that
# sf0.01's ~25-doc sources produce multiple sequences per source.
CTX_TOKENS = 512

# Output shard fan-out for the deterministic shard assignment.
N_SHARDS = 16

# Domain-mix acceptance rates: even-numbered sources are kept in full,
# odd-numbered sources are downsampled to 30% — the shape of a "web crawl
# gets downweighted, curated sources kept" mixing policy.
# acceptance rates as integer ppm (r10 sweep: the float 1.0/0.3 pair
# became exact integer constants — the gate compares BIGINT to BIGINT
# and the audit output carries no rounded double)
MIX_EVEN_PPM = 1_000_000
MIX_ODD_PPM = 300_000


def _words(col):
    return F.filter(F.split(F.lower(col), " "), lambda w: w != "")


def _md5_long(col, n_hex: int = 8):
    """First ``n_hex`` hex chars of md5 as a non-negative integer —
    engine-portable uniform hash (same construction as dedup.py)."""
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing: concatenate each source's
    documents in doc_id order and cut the stream into CTX_TOKENS-sized
    context windows; a document belongs to the window its first token lands
    in. Returns per-sequence occupancy (doc count, token count, fill ratio).

    Scale: one shuffle — the running-sum window partitions by source, which
    is exactly the partitioning the downstream tokenizer writer wants, so
    the sort is reused by the sink. A giant source (web crawl) makes one
    ordered partition; at 100 TB you range-partition on (source, doc_id)
    so one source spans many tasks and each task packs its contiguous
    range independently (the running sum then needs a per-range offset
    pass — a 2-row-per-task driver-side prefix, not a second shuffle).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(_words(F.col("text"))).alias("n_tokens")
    )
    running = Window.partitionBy("source").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    packed = toks.withColumn(
        "start_tok",
        F.coalesce(F.sum("n_tokens").over(running), F.lit(0)).cast("long"),
    ).withColumn("seq_id", F.floor(F.col("start_tok") / F.lit(float(CTX_TOKENS))))
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("seq_tokens"),
        )
        # fill as integer ppm (r10 sweep): pure BIGINT floor-div replaces
        # the former round(seq_tokens/ctx, 4) double in the hashed output
        .withColumn("fill_ppm", F.expr(f"seq_tokens * 1000000 div {CTX_TOKENS}"))
        .orderBy("source", "seq_id")
    )


Q_PACK_SEQUENCES_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_tokens
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM toks
)
SELECT source,
       CAST(floor(start_tok / {CTX_TOKENS}.0) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       CAST(CAST(sum(n_tokens) AS BIGINT) * 1000000 // {CTX_TOKENS} AS BIGINT)
         AS fill_ppm
FROM packed
GROUP BY source, seq_id
ORDER BY source, seq_id
"""


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-mod shard assignment + per-shard balance audit.
    The md5-of-key shard function is stable across runs/engines (unlike
    ``pmod(hash(...))``, which is Spark-internal), so shard membership is
    reproducible — the property a resumable tokenizer job needs.

    Scale: scan-local projection, one dim-sized aggregation (N_SHARDS
    rows). The audit columns (docs/chars per shard, distinct sources) are
    what you alert on for shard skew before launching the write.
    """
    docs = load_table(spark, sf_dir, "documents")
    shard = (_md5_long(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard_id")
    return (
        docs.select(shard, "doc_id", "n_chars", "source")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("shard_id")
    )


Q_SHARD_ASSIGN_SQL = f"""
WITH s AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {N_SHARDS} AS shard_id,
         doc_id, n_chars, source
  FROM documents
)
SELECT shard_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT source) AS n_sources
FROM s GROUP BY shard_id ORDER BY shard_id
"""


def q_sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix resampling: each source gets a target acceptance rate
    (even-numbered sources 100%, odd 30%) and documents are kept by a
    deterministic per-doc hash gate, so the sampled corpus is reproducible
    and the achieved rate converges to the target per domain.

    Scale: scan-local gate (no shuffle to decide membership — contrast
    with a global ``orderBy(rand())`` sample), one dim-sized rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", "([0-9]+)", 1).cast("int")
    rate_ppm = (F.when(src_num % 2 == 0, F.lit(MIX_EVEN_PPM))
                .otherwise(F.lit(MIX_ODD_PPM)).cast("long"))
    hv = _md5_long(F.col("doc_id").cast("string")) % 1000000
    keep = (hv < rate_ppm).cast("int")
    return (
        docs.select("source", rate_ppm.alias("rate_ppm"), keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").cast("long").alias("n_sampled"),
            F.max("rate_ppm").alias("target_rate_ppm"),
        )
        .orderBy("source")
    )


Q_SAMPLE_WEIGHTED_MIX_SQL = f"""
WITH gated AS (
  -- TRY_CAST, not CAST: a digit-less source must yield NULL (NULL % 2 = 0
  -- is NULL -> ELSE branch), matching Spark's cast('int') null semantics
  -- instead of crashing the oracle run
  SELECT source,
         CAST(CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) % 2 = 0
              THEN {MIX_EVEN_PPM} ELSE {MIX_ODD_PPM} END AS BIGINT) AS rate_ppm,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 1000000
                   < CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) % 2 = 0
                          THEN {MIX_EVEN_PPM} ELSE {MIX_ODD_PPM} END
              THEN 1 ELSE 0 END AS keep
  FROM documents
)
SELECT source, count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_sampled,
       max(rate_ppm) AS target_rate_ppm
FROM gated GROUP BY source ORDER BY source
"""


def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: build the corpus unigram
    distribution, then score each document by its mean log10 token
    probability — the cheap proxy for "does this read like the corpus"
    that pretraining filters (CCNet-style) threshold on.

    Scale: one shuffle for the vocab count (map-side combined), then the
    vocab joins back in hint-free — stats/AQE broadcast it locally; a
    natural-language vocab capped to top-V stays broadcastable at 100 TB,
    an uncapped one (typos, numbers) does not, so the strategy must come
    from statistics, not a forced hint.
    At 100 TB you'd cap to the top-V words and give OOV a floor
    probability; the corpus total crosses as a broadcast 1-row join, not a
    driver collect.

    ACCEPTED RISK (r08 verdict #1 sweep): ``avg_logp`` is round(avg(log10
    (int/int)), 4) — log10 is transcendental, so no integer twin of the
    exact value exists. Both engines evaluate log10 over BIT-IDENTICAL
    quotients (single IEEE div over exact ints) and agree to <=1 ulp;
    round(·, 4) absorbs that. r10 (verdict #5): the output now ALSO
    carries ``surprisal_bits`` — Σ_words (ilog2(total) − ilog2(cnt)), a
    pure-BIGINT floor-log2 surprisal computed via length(bin(n)) (exact
    in both engines, no float path) that ranks documents the same way —
    so if avg_logp ever hash-fails it downgrades to a one-column drop
    with the doc-level LM signal still value-checked.
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    # tok feeds the scoring join, freq, and (through freq) total — three
    # corpus scans + three tokenize passes without materialization (r05
    # scan-multiplicity audit); tokenize once, like PMI/BM25
    tok = docs.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("word")
    ).localCheckpoint(eager=True)
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    return (
        tok.join(freq, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(F.log10(F.col("cnt") / F.col("total"))), 4).alias("avg_logp"),
            # integer twin (r10 sweep): floor-log2 surprisal via bin()
            # string length — ilog2(n) = length(bin(n)) - 1, exact BIGINT
            F.sum(F.length(F.bin(F.col("total")))
                  - F.length(F.bin(F.col("cnt")))).cast("long")
             .alias("surprisal_bits"),
        )
        .orderBy("doc_id")
    )


Q_TEXT_UNIGRAM_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS word
  FROM documents
), freq AS (
  SELECT word, count(*) AS cnt FROM tok GROUP BY word
), total AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq
)
SELECT t.doc_id, count(*) AS n_words,
       round(avg(log10(f.cnt * 1.0 / tt.total)), 4) AS avg_logp,
       CAST(sum(length(bin(tt.total)) - length(bin(f.cnt))) AS BIGINT)
         AS surprisal_bits
FROM tok t JOIN freq f USING (word) CROSS JOIN total tt
GROUP BY t.doc_id ORDER BY t.doc_id
"""


def q_embedding_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier audit: distance of every vector to its
    label centroid. The distance distribution is how an embedding-based
    curation job finds mislabeled / off-distribution documents (and the
    same centroid machinery is the k-means E-step behind sim_ivf_topk).

    Scale: posexplode to (label, dim) rows → map-side-combined avg —
    centroids are labels×dims rows (tiny) and broadcast back, so the only
    full shuffle is the per-vector regroup. At 100 TB the explode is 64×
    row inflation but constant width; the alternative (per-partition numpy
    partial sums via mapInPandas) trades that for Python serialization —
    the JVM explode wins until dims get large (≥1k).

    ACCEPTED RISK (r08 verdict #1 sweep): ``dist_to_centroid`` is
    round(sqrt(Σdiff²), 4) over float-typed embedding data — not
    rationalizable to integers. The centroid avg and the per-vector Σ are
    64-term folds whose addends differ only if the engines' summation
    order diverges; driver-green r08 (bit-exact). r10 (verdict #5): the
    output now ALSO carries ``vec_q20_checksum`` — Σ_d floor(val·2^20),
    exact BIGINT from the raw parquet values alone (×2^20 is an exponent
    shift, so the scale is exact; floor is deterministic; the sum is
    integer and order-free) — an exact fingerprint of each flagged
    vector, so a dist flake downgrades to a one-column drop.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double")))
        .alias("pos", "val"),
    )
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    diff = F.col("val") - F.col("c")
    return (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(F.sqrt(F.sum(diff * diff)), 4).alias("dist_to_centroid"),
            F.sum(F.floor(F.col("val") * F.lit(1048576.0))).cast("long")
             .alias("vec_q20_checksum"),
        )
        .orderBy("vec_id")
    )


Q_EMBEDDING_OUTLIER_SQL = """
WITH dims AS (
  SELECT unnest(range(1, 65)) AS pos
), ex AS (
  SELECT vec_id, label, d.pos, CAST(embedding[d.pos] AS DOUBLE) AS val
  FROM embeddings, dims d
), cent AS (
  SELECT label, pos, avg(val) AS c FROM ex GROUP BY label, pos
)
SELECT e.vec_id, e.label,
       round(sqrt(sum((e.val - c.c) * (e.val - c.c))), 4) AS dist_to_centroid,
       CAST(sum(floor(e.val * 1048576.0)) AS BIGINT) AS vec_q20_checksum
FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
GROUP BY e.vec_id, e.label
ORDER BY e.vec_id
"""


# left-fold dot product shared with the similarity/dedup family — ONE
# definition, because the fold order is parity-load-bearing (bit-identical
# to DuckDB's list_sum)
from .similarity import _dot as _vdot


# --- semantic decontamination ------------------------------------------------
# Every 50th vector plays the held-out benchmark; anything in the corpus
# whose cosine to ANY benchmark vector clears the threshold is flagged as
# semantic eval-set leakage (the embedding-space complement of the n-gram
# text_decontaminate gate — paraphrases leak past n-grams).
SEMDECON_BENCH_MOD = 50
SEMDECON_THRESHOLD = 0.30


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-corpus-vector benchmark-leakage audit: max cosine to the
    benchmark set and a contaminated flag, counted per label group.

    Scale shape: the benchmark is request-sized by definition (an eval
    set, not a corpus), so it broadcasts whole — one corpus scan, a
    broadcast nested-loop against the tiny bench side, a per-vector max,
    zero corpus shuffles besides the final label rollup. No LSH needed:
    unlike near-dup (corpus × corpus), decontamination is corpus × bench,
    which stays linear. Norms computed once per side before the pair step.

    Float-parity analysis (r10, verdict #5 sweep): each per-pair cos is a
    strict left fold (_vdot ≡ list_sum fold order) + IEEE-correctly-
    rounded sqrt/mul/div — bit-identical across engines — so
    ``worst_cos`` (a MAX over bit-identical values) is in the safe class.
    The former ``mean_max_cos`` was NOT (a group AVG folds in engine-
    dependent order); it is replaced by ``sum_max_cos_q30`` =
    Σ floor(max_cos·2^30) — per-row quantization of a bit-identical
    double (×2^30 is an exponent shift, exact) into BIGINT, summed
    order-free; mean = that / n_vectors / 2^30 for human consumption.
    """
    emb = load_table(spark, sf_dir, "embeddings", widen=True)
    e = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", F.sqrt(_vdot(F.col("v"), F.col("v")))) \
        .localCheckpoint(eager=True)  # feeds bench AND corpus — one scan,
    #                                   norms computed once (r05 audit rule)
    bench = (e.filter(F.col("vec_id") % SEMDECON_BENCH_MOD == 0)
             .select(F.col("vec_id").alias("bench_id"),
                     F.col("v").alias("bv"), F.col("nrm").alias("bn")))
    corpus = e.filter(F.col("vec_id") % SEMDECON_BENCH_MOD != 0)
    cos = _vdot(F.col("v"), F.col("bv")) / (F.col("nrm") * F.col("bn"))
    per_vec = (
        corpus.join(F.broadcast(bench))  # corpus × tiny bench
        .withColumn("cos", cos)
        .groupBy("vec_id", "label")
        .agg(F.max("cos").alias("max_cos_raw"))
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum((F.col("max_cos_raw") >= SEMDECON_THRESHOLD).cast("long"))
             .alias("n_contaminated"),
            F.round(F.max("max_cos_raw"), 6).alias("worst_cos"),
            F.sum(F.floor(F.col("max_cos_raw") * F.lit(1073741824.0)))
             .cast("long").alias("sum_max_cos_q30"),
        )
        .orderBy("label")
    )


Q_SEMANTIC_DECON_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
  FROM embeddings
), bench AS (
  SELECT vec_id AS bench_id, v AS bv, nrm AS bn FROM e
  WHERE vec_id % {SEMDECON_BENCH_MOD} = 0
), per_vec AS (
  SELECT c.vec_id, c.label,
         max(list_sum(list_transform(range(1, len(c.v) + 1),
             i -> c.v[CAST(i AS INT)] * b.bv[CAST(i AS INT)]))
             / (c.nrm * b.bn)) AS max_cos_raw
  FROM e c CROSS JOIN bench b
  WHERE c.vec_id % {SEMDECON_BENCH_MOD} <> 0
  GROUP BY c.vec_id, c.label
)
SELECT label,
       count(*) AS n_vectors,
       CAST(sum(CASE WHEN max_cos_raw >= CAST({SEMDECON_THRESHOLD!r} AS DOUBLE)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       round(max(max_cos_raw), 6) AS worst_cos,
       CAST(sum(floor(max_cos_raw * 1073741824.0)) AS BIGINT)
         AS sum_max_cos_q30
FROM per_vec
GROUP BY label
ORDER BY label
"""


# train/val/test thresholds over a md5-mod-100 bucket: [0,80) / [80,90) / [90,100)
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment + per-split audit.
    Membership is a pure function of doc_id (md5-mod bucket), so the split
    is stable across runs, engines, and re-partitioning — documents never
    migrate between splits when the corpus is re-processed, which is the
    leakage guarantee an eval pipeline depends on.

    Scale: scan-local gate (no shuffle decides membership), one 3-row
    rollup. The checksum column makes split drift detectable in CI at a
    glance.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = _md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    total = docs.count()  # scalar for the share denominator (one tiny job)
    return (
        docs.select(split.alias("split"), "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("doc_id").cast("long").alias("doc_id_checksum"),
        )
        # integer ppm via floor div (r08 verdict #1 sweep): pure BIGINT
        # arithmetic, identical semantics both engines — no rounded
        # double in the hashed output
        .withColumn("share_ppm",
                    F.expr(f"n_docs * 1000000L div {total}"))
        .select("split", "n_docs", "share_ppm", "total_chars",
                "min_doc_id", "max_doc_id", "doc_id_checksum")
        .orderBy("split")
    )


Q_SAMPLE_SPLIT_SQL = f"""
WITH s AS (
  SELECT CASE
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 100 < {SPLIT_VAL_PCT} THEN 'val'
           ELSE 'test' END AS split,
         doc_id, n_chars
  FROM documents
)
SELECT split, count(*) AS n_docs,
       CAST(count(*) * 1000000 // (SELECT count(*) FROM documents) AS BIGINT)
         AS share_ppm,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id,
       CAST(sum(doc_id) AS BIGINT) AS doc_id_checksum
FROM s GROUP BY split ORDER BY split
"""


# --- training-mix token-budget allocation (r09) ------------------------------
MIXBUDGET_TOKENS = 1_000_000      # global token budget to allocate
MIXBUDGET_W_EVEN, MIXBUDGET_W_ODD = 3, 1   # per-domain mix weights (config)


def q_mix_budget_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix budget bookkeeping: given configured per-domain mix
    weights (even-numbered sources upweighted 3:1), allocate a global
    token budget proportionally and report each domain's oversampling
    factor — the DoReMi-style accounting a pretraining run does BEFORE
    touching data (epochs_ppm > 1e6 means the domain must repeat;
    < 1e6 means it is subsampled; ``sample_weighted_mix`` is the row
    gate that then implements the subsample).

    Pure integer arithmetic: target_tokens = budget·w div Σw and
    epochs_ppm = target·10^6 div available are BIGINT floor divisions,
    identical both engines. Overflow: target·10^6 needs the shared
    power-of-two downshift (profiling.py discipline) once budgets pass
    ~9·10^12 tokens — documented, not yet needed at any real config.

    Scale: one tokenize scan collapsed map-side to |sources| rows; the
    weight sum is a 1-row broadcast. Dominated by the scan, like every
    profile in SCALE.md §8.
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    # |sources| rows referenced twice (weight-sum + output) — checkpoint
    # so the tokenize scan runs exactly once (r09 scan audit)
    per_src = (docs.select(
        "source", F.size(_words(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n").cast("long").alias("available_tokens"))
        .localCheckpoint(eager=True))
    src_num = F.regexp_extract("source", "([0-9]+)", 1).cast("int")
    w = F.when(src_num % 2 == 0, F.lit(MIXBUDGET_W_EVEN)) \
        .otherwise(F.lit(MIXBUDGET_W_ODD)).cast("long")
    weighted = per_src.withColumn("w", w)
    wsum = weighted.agg(F.sum("w").alias("w_sum"))
    return (weighted.crossJoin(F.broadcast(wsum))
            .withColumn("target_tokens",
                        F.expr(f"({MIXBUDGET_TOKENS}L * w) div w_sum"))
            .withColumn("epochs_ppm",
                        F.expr("target_tokens * 1000000L div available_tokens"))
            .select("source", "n_docs", "available_tokens", "w",
                    "target_tokens", "epochs_ppm")
            .orderBy("source"))


Q_MIX_BUDGET_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> ''))) AS BIGINT)
           AS available_tokens
  FROM documents GROUP BY source
), weighted AS (
  SELECT *, CAST(CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)', 1)
                                    AS INTEGER) % 2 = 0
                      THEN {MIXBUDGET_W_EVEN}
                      ELSE {MIXBUDGET_W_ODD} END AS BIGINT) AS w
  FROM per_src
), ws AS (SELECT CAST(sum(w) AS BIGINT) AS w_sum FROM weighted)
SELECT source, n_docs, available_tokens, w,
       CAST({MIXBUDGET_TOKENS} * w // w_sum AS BIGINT) AS target_tokens,
       CAST(({MIXBUDGET_TOKENS} * w // w_sum) * 1000000
            // available_tokens AS BIGINT) AS epochs_ppm
FROM weighted CROSS JOIN ws
ORDER BY source
"""


def q_batch_padding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching padding audit: docs grouped into
    power-of-two token-length buckets (the geometric bucketing inference
    servers and packed-batch trainers actually use), reporting per
    bucket how many pad tokens a pad-to-bucket-top batcher wastes —
    the number that decides between bucketed batching and sequence
    packing (``pack_sequences``) for a corpus.

    Pure integers end-to-end: the power-of-two ceiling is
    ``1 << length(bin(n-1))`` (exact in both engines, no log/float
    path — the bin() trick of ``surprisal_bits``), and waste is ppm via
    BIGINT floor-div. At 100 TB padded·10^6 crosses the LONG bound
    around 9·10^12 padded tokens per bucket — the shared power-of-two
    downshift (profiling.py) applies then; not needed at any test sf.

    Scale: one tokenize scan, map-side collapse to ≤ log2(max_len)
    buckets. Scan-dominated like every §8 profile.
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    toks = (docs.select(F.size(_words(F.col("text"))).alias("n"))
            .filter(F.col("n") > 0))
    top = F.when(F.col("n") <= 1, F.lit(1).cast("long")).otherwise(
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), length(bin(n - 1))) "
               "AS BIGINT)"))
    return (toks.withColumn("bucket_top", top)
            .groupBy("bucket_top")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n").cast("long").alias("sum_tokens"))
            .withColumn("padded_tokens",
                        F.col("n_docs") * F.col("bucket_top"))
            .withColumn("waste_ppm",
                        F.expr("(padded_tokens - sum_tokens) * 1000000 "
                               "div padded_tokens"))
            .orderBy("bucket_top"))


Q_BATCH_PADDING_SQL = """
WITH toks AS (
  SELECT len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n
  FROM documents
), bucketed AS (
  SELECT CASE WHEN n <= 1 THEN CAST(1 AS BIGINT)
              ELSE CAST(1 << length(bin(n - 1)) AS BIGINT) END AS bucket_top,
         n
  FROM toks WHERE n > 0
), agg AS (
  SELECT bucket_top, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens
  FROM bucketed GROUP BY bucket_top
)
SELECT bucket_top, n_docs, sum_tokens,
       CAST(n_docs * bucket_top AS BIGINT) AS padded_tokens,
       CAST((n_docs * bucket_top - sum_tokens) * 1000000
            // (n_docs * bucket_top) AS BIGINT) AS waste_ppm
FROM agg ORDER BY bucket_top
"""


def q_dedup_weighted_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware per-domain token mass — the post-dedup accounting
    a mix allocator should feed on instead of raw counts: each document
    is down-weighted by its GLOBAL near-duplicate cluster size (the
    SlimPajama-style 1/n_copies discipline), and the per-source
    effective token mass is Σ floor(n_tokens·10^6 / n_copies). The
    cluster key is the md5 of the document's SORTED DISTINCT WORD SET —
    the bag-of-words template class (permutations/repetitions of the
    same vocabulary collapse together), chosen over exact-text md5
    because the synthetic corpus has ZERO exact duplicates at sf0.01
    (dead variation) but 54 docs in multi-doc word-set clusters (446
    clusters / 500 docs — the weight path is live at the oracle scale).
    Only 32-hex keys cross the shuffle, never text (the 100 TB shape).

    Sum-of-floors is deterministic in both engines (each term is a
    BIGINT floor-div; the sum is exact integer addition, order-free).
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    words = _words(F.col("text"))
    key = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words))))
    # d feeds copies AND the join-back — materialize the narrow
    # projection once so the tokenize scan runs exactly once (the
    # per-reference re-derivation rule, SCALE.md §2)
    d = docs.select("doc_id", "source", key.alias("h"),
                    F.size(words).alias("n_tokens")) \
        .localCheckpoint(eager=True)
    copies = d.groupBy("h").agg(F.count(F.lit(1)).alias("n_copies"))
    return (d.join(copies, "h")
            .withColumn("eff_ppm",
                        F.expr("CAST(n_tokens AS BIGINT) * 1000000 "
                               "div n_copies"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("raw_tokens"),
                 F.countDistinct("h").alias("n_clusters"),
                 F.sum("eff_ppm").cast("long").alias("eff_tokens_ppm"))
            .orderBy("source"))


Q_DEDUP_WEIGHTED_MASS_SQL = """
WITH w AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
), d AS (
  SELECT doc_id, source,
         md5(array_to_string(list_sort(list_distinct(ws)), ' ')) AS h,
         len(ws) AS n_tokens
  FROM w
), copies AS (
  SELECT h, count(*) AS n_copies FROM d GROUP BY h
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(d.n_tokens) AS BIGINT) AS raw_tokens,
       count(DISTINCT d.h) AS n_clusters,
       CAST(sum(CAST(d.n_tokens AS BIGINT) * 1000000 // c.n_copies)
            AS BIGINT) AS eff_tokens_ppm
FROM d JOIN copies c ON d.h = c.h
GROUP BY d.source ORDER BY d.source
"""


QUERIES = {
    "pack_sequences": q_pack_sequences,
    "batch_padding_audit": q_batch_padding_audit,
    "dedup_weighted_mass": q_dedup_weighted_mass,
    "mix_budget_allocate": q_mix_budget_allocate,
    "shard_assign": q_shard_assign,
    "sample_weighted_mix": q_sample_weighted_mix,
    "text_unigram_logprob": q_text_unigram_logprob,
    "embedding_outlier": q_embedding_outlier,
    "semantic_decontaminate": q_semantic_decontaminate,
    "sample_split": q_sample_split,
}

ORACLE = {
    "pack_sequences": Q_PACK_SEQUENCES_SQL,
    "batch_padding_audit": Q_BATCH_PADDING_SQL,
    "dedup_weighted_mass": Q_DEDUP_WEIGHTED_MASS_SQL,
    "mix_budget_allocate": Q_MIX_BUDGET_SQL,
    "shard_assign": Q_SHARD_ASSIGN_SQL,
    "sample_weighted_mix": Q_SAMPLE_WEIGHTED_MIX_SQL,
    "text_unigram_logprob": Q_TEXT_UNIGRAM_LOGPROB_SQL,
    "embedding_outlier": Q_EMBEDDING_OUTLIER_SQL,
    "semantic_decontaminate": Q_SEMANTIC_DECON_SQL,
    "sample_split": Q_SAMPLE_SPLIT_SQL,
}
