"""Deduplication operator family over the ``documents`` table (north-star
LLM-pipeline surface): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup.

Determinism discipline: every hash is md5 (identical in Spark and DuckDB),
so even the MinHash/LSH pipeline — normally checked only rows-wise — has an
exact value-level oracle. All token/shingle work uses higher-order array
functions (codegen'd, no Python), and candidate generation is always via an
equi-join on a derived key (shingle, LSH band), never a cross join: that is
the property that survives 100 TB. Thresholds are calibrated to the synthetic
corpus (25 planted near-dup pairs at jaccard ≥ 0.2 at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table, session_memo

SHINGLE_N = 3            # words per shingle
# Integer-ppm Jaccard admission threshold (r10 sweep: the former float
# 0.2 expressed as ppm — floor(j*1e6) >= 200000 <=> j >= 0.2 exactly,
# because floor(x) >= k <=> x >= k for integer k)
JACCARD_THRESHOLD_PPM = 200_000
NUM_MINHASHES = 12
LSH_BANDS = 4            # 12 minhashes → 4 bands × 3 rows
COSINE_THRESHOLD = 0.35


def _shingles(col):
    """Distinct n-word shingles as an array column (no explode needed until
    candidate generation)."""
    words = F.split(F.lower(col), " ")
    n = F.size(words)
    idx = F.when(n >= SHINGLE_N, F.sequence(F.lit(1), n - (SHINGLE_N - 1))) \
        .otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, SHINGLE_N)))
    )


_SHINGLES_SQL = (
    "list_distinct(list_transform("
    "  range(1, greatest(len(words) - {nm1}, 0) + 1),"
    "  i -> array_to_string(words[i:i+{nm1}], ' ')))"
).format(nm1=SHINGLE_N - 1)

_WORDS_SQL = "string_split(lower(text), ' ')"


def _shingle_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized, persisted (doc_id, shingles) relation.

    The shingle projection is the single hottest expression in the dedup
    family, and without a cache boundary it appears 3× in the minhash plan
    (band generation + both sides of the verify join-back) and once more
    per dependent query (ngram-Jaccard, cluster pipeline). Measured at
    sf0.1 (5 interleaved runs): persist cuts the minhash median 4.36 s →
    2.85 s AND removes the 15 s GC-churn outliers the triple re-derivation
    caused. This is also the documented 100 TB shape (SCALE.md §6): shingle
    once, reuse everywhere — a storage decision, not a plan change.
    """
    def build():
        docs = load_table(spark, sf_dir, "documents", widen=True)
        return docs.select("doc_id", _shingles(F.col("text")).alias("shingles")) \
                   .persist()

    return session_memo(spark, "_sg_shingle_cache", sf_dir, build)


def exact_jaccard_ppm(sh_a, sh_b):
    """Integer-ppm exact-Jaccard column over two shingle-array columns —
    the ONE definition of the verify metric; the batch minhash operator
    and the streaming admission gate both use it, so threshold semantics
    can never diverge between them.

    r10 (r09 verdict #5 sweep): the former round(common/union, 6) double
    becomes ``floor(common * 1e6 / union)`` BIGINT — pure integer
    semantics both engines (non-negative operands, so Spark ``div`` and
    DuckDB ``//`` agree). The floor is computed via the exact
    ``(num - num % den) / den`` identity: every intermediate is ≤ ~1e9,
    far inside double's 2^53 exact-integer range, so the division is
    IEEE-exact — no float-rounding path to a flake.

    den = |A|+|B|−common is 0 only when BOTH shingle arrays are empty;
    ANSI mode would throw DIVIDE_BY_ZERO there, so the den==0 case is
    pinned to 0 ppm (Jaccard of two empty sets — unreachable from the
    current call sites, whose candidates share ≥1 shingle, but this is
    a shared helper; r11 advice guard)."""
    common = F.size(F.array_intersect(sh_a, sh_b)).cast("long")
    num = common * F.lit(1000000).cast("long")
    den = (F.size(sh_a) + F.size(sh_b)).cast("long") - common
    return F.when(den == 0, F.lit(0).cast("long")) \
            .otherwise(((num - num % den) / den).cast("long"))


def jaccard_companions(sh_a, sh_b):
    """Exact-integer (common, union) twins of ``exact_jaccard`` — BIGINT
    columns that fully determine the rounded quotient."""
    common = F.size(F.array_intersect(sh_a, sh_b))
    return (common.cast("long").alias("jac_common"),
            (F.size(sh_a) + F.size(sh_b) - common).cast("long")
            .alias("jac_union"))


def jaccard_ppm_sql(a: str, b: str) -> str:
    """DuckDB twin of exact_jaccard_ppm over two aliases of ``sh``
    (incl. the den==0 → 0 ppm guard, so the ONE-definition promise
    holds on the degenerate both-empty input too)."""
    inter = f"len(list_intersect({a}.shingles, {b}.shingles))"
    den = f"(len({a}.shingles) + len({b}.shingles) - {inter})"
    return (f"CASE WHEN {den} = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST({inter} * 1000000 // {den} AS BIGINT) END")


def jaccard_companions_sql(a: str, b: str) -> str:
    """DuckDB twin of ``jaccard_companions`` (select-list fragment)."""
    inter = f"len(list_intersect({a}.shingles, {b}.shingles))"
    return (f"CAST({inter} AS BIGINT) AS jac_common, "
            f"CAST(len({a}.shingles) + len({b}.shingles) - {inter} AS BIGINT)"
            f" AS jac_union")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative (min doc_id) per distinct text —
    the hash-groupBy form of the reference's processedNodes Set
    (new-converter.js:6,99-105)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_doc_id", "n_copies", F.length("text").alias("text_len"))
    )


Q_DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies, length(text) AS text_len
FROM documents GROUP BY text
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact Jaccard over 3-word shingles.

    Candidate generation is an equi-join on the shingle value (inverted
    index), so cost is Σ per-shingle df² — bounded by shingle selectivity,
    not |docs|². At 100 TB you'd pre-filter hot shingles (stop-shingles);
    here the vocabulary is small enough not to need it.
    """
    sh = _shingle_rel(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    # integer end-to-end (r10 sweep): ppm via BIGINT floor-div — no
    # rounded double left in the hashed output
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jac_union",
                    F.col("n_a").cast("long") + F.col("n_b") - F.col("common"))
        .withColumn("jaccard_ppm", F.expr("common * 1000000 div jac_union"))
        .filter(F.col("jaccard_ppm") >= JACCARD_THRESHOLD_PPM)
        .select("doc_a", "doc_b", "common", "jac_union", "jaccard_ppm")
    )


Q_DEDUP_NGRAM_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles
  FROM (SELECT doc_id, {_WORDS_SQL} AS words FROM documents)
), sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM sh
), ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, common,
       CAST(sa.n_sh + sb.n_sh - common AS BIGINT) AS jac_union,
       CAST(common * 1000000 // (sa.n_sh + sb.n_sh - common) AS BIGINT)
         AS jaccard_ppm
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1000000 // (sa.n_sh + sb.n_sh - common) >= {JACCARD_THRESHOLD_PPM}
"""


# One md5 per shingle (engine-portable base hash: first 8 hex chars → 32-bit
# int), then NUM_MINHASHES cheap affine transforms (a*h + b) mod P — the
# classic universal-hash minhash family. 12× less md5 work than hashing every
# (seed, shingle) pair, and every value is bit-identical in DuckDB.
MINHASH_P = 4_294_967_311          # prime > 2^32: product a*h < 2^63, no overflow
MINHASH_A = [2 * i * 1_000_003 + 1_234_577 for i in range(NUM_MINHASHES)]
MINHASH_B = [7 * i + 12_345 for i in range(NUM_MINHASHES)]


def minhash_bands(sh: DataFrame, *, carry: list[str] | None = None) -> DataFrame:
    """(doc_id, shingles, …) → slim (doc_id[, *carry], band_idx, bk) band
    relation: md5 base hash per shingle → NUM_MINHASHES affine minhashes →
    LSH_BANDS band keys, exploded to one row per band.

    Pure column expressions, no window/agg — so it evaluates identically
    over a BATCH or a STREAMING DataFrame (the streaming near-dup gate in
    streamq.py reuses it verbatim). ``carry`` lists extra columns to keep
    alongside (e.g. the shingle array, when the caller can't join back to
    a streaming side later)."""
    carry = carry or []
    hvals = F.transform(
        F.col("shingles"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )

    def _mh(i: int):
        # bind the constants eagerly — a two-arg lambda would make Spark
        # pass the element index as the second (Column) argument
        a_, b_, p_ = F.lit(MINHASH_A[i]), F.lit(MINHASH_B[i]), F.lit(MINHASH_P)
        return F.array_min(F.transform(F.col("hv"), lambda h: (a_ * h + b_) % p_))

    # materialize the minhashes as ONE array column in a dedicated
    # projection so the 12 transform expressions occur once in the plan
    # instead of being inlined into every band struct
    sig = sh.select("doc_id", *carry, hvals.alias("hv")) \
            .select("doc_id", *carry,
                    F.array(*[_mh(i) for i in range(NUM_MINHASHES)]).alias("mh"))
    rows_per_band = NUM_MINHASHES // LSH_BANDS
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws("|", *[F.get("mh", b * rows_per_band + r)
                               for r in range(rows_per_band)]).alias("bk"),
        )
        for b in range(LSH_BANDS)
    ]
    return sig.select("doc_id", *carry, F.explode(F.array(*band_structs)).alias("band")) \
              .select("doc_id", *carry, "band.band_idx", "band.bk")


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup detection, verified with exact Jaccard.

    Pipeline: shingle → md5 base hash per shingle → 12 affine minhashes →
    4 band keys of 3 → explode to a slim (doc_id, band_idx, band_key)
    relation → ONE self-equi-join on (band_idx, band_key) for candidates →
    exact-Jaccard verification of the (deduped) candidates only.

    Scale: everything before the join is per-row array math computed once;
    the join key is the band bucket (sub-quadratic: candidates ≈ true
    pairs + collision noise ≪ n²); the heavy shingle arrays are NOT carried
    through the join — candidates join back to the shingle relation by id.

    r16 (VERDICT r15 #3, work-profiled at 8.75 task-seconds — the one
    compute-bound headline row):
    * the banded signature relation is materialized ONCE with a LAZY
      localCheckpoint — the md5 base hash + 12 affine minhashes (the
      row's dominant CPU term) used to evaluate twice, once per
      self-join side (Catalyst does not reuse the subtree; the r05
      audit's ReusedExchange=0 finding). Lazy (eager=False) keeps zero
      extra Spark jobs: the RDD computes inside the first consuming job
      and both join sides read the cached partitions. At 100 TB this is
      the signature table an LSH service materializes anyway.
    * the verify join-back BROADCASTS the candidate pair list and
      STREAMS the shingle relation — the old shape broadcast the whole
      (doc_id, shingles) relation twice (heavy array payloads); the
      candidate list is the LSH output, sparse by design (≈ true pairs
      + collision noise). At a scale where candidates outgrow a
      broadcast, slice them per band range and process slices as
      independent jobs (guide §8) — not needed at any tested SF.
    """
    sh = _shingle_rel(spark, sf_dir).filter(F.size("shingles") > 0)
    slim = minhash_bands(sh).localCheckpoint(eager=False)
    a = slim.select(F.col("doc_id").alias("doc_a"), "band_idx", "bk")
    b_ = slim.select(F.col("doc_id").alias("doc_b"), "band_idx", "bk")
    cand = (
        a.join(b_, ["band_idx", "bk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # `sh` is the session-persisted shingle relation (_shingle_rel), so
    # the verify join-back reads the cache instead of re-deriving the
    # projection per side. An earlier alternative (checkpoint candidates +
    # semi-join-gate the recompute) LOST ~60% wall-clock at sf0.1 — the
    # extra plan boundary doubled codegen JIT; the persist measured 1.5×
    # faster and stable (numbers in _shingle_rel's docstring).
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        sh_b.join(F.broadcast(sh_a.join(F.broadcast(cand), "doc_a")),
                  "doc_b")
        .withColumn("jaccard_ppm",
                    exact_jaccard_ppm(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_ppm") >= JACCARD_THRESHOLD_PPM)
        .select("doc_a", "doc_b",
                *jaccard_companions(F.col("sh_a"), F.col("sh_b")),
                "jaccard_ppm")
    )


def _minhash_sql(i: int) -> str:
    return (f"list_min(list_transform(hv, h -> "
            f"({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MINHASH_P}))")


def _band_sql(b: int) -> str:
    rows_per_band = NUM_MINHASHES // LSH_BANDS
    parts = " || '|' || ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
    return parts


# CTE chain shared between the minhash query and the cluster pipeline below
# (the latter wraps it in WITH RECURSIVE for the component walk).
_MINHASH_CTES = f"""sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles
  FROM (SELECT doc_id, {_WORDS_SQL} AS words FROM documents)
), sig AS (
  SELECT doc_id,
         list_transform(shingles,
                        s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS hv
  FROM sh WHERE len(shingles) > 0
), mhs AS (
  SELECT doc_id,
         {", ".join(f"{_minhash_sql(i)} AS mh{i}" for i in range(NUM_MINHASHES))}
  FROM sig
), slim AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band_idx, {_band_sql(b)} AS bk FROM mhs"
      for b in range(LSH_BANDS))}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM slim a JOIN slim b
    ON a.band_idx = b.band_idx AND a.bk = b.bk AND a.doc_id < b.doc_id
)"""

_MINHASH_PAIRS_SELECT = f"""
SELECT doc_a, doc_b, {jaccard_companions_sql('sa', 'sb')},
       {jaccard_ppm_sql('sa', 'sb')} AS jaccard_ppm
FROM cand
JOIN sh sa ON sa.doc_id = doc_a
JOIN sh sb ON sb.doc_id = doc_b
WHERE {jaccard_ppm_sql('sa', 'sb')} >= {JACCARD_THRESHOLD_PPM}
"""

Q_DEDUP_MINHASH_SQL = f"WITH {_MINHASH_CTES}\n{_MINHASH_PAIRS_SELECT}"

SIMHASH_BITS = 16


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from md5 token hashes.

    Per-doc bit votes are computed with array higher-order functions —
    zero shuffle, one narrow projection over the corpus. Hamming-close
    simhashes ⇒ near-dup candidates (the scale path pre-buckets on the
    simhash value; here we emit the signatures themselves, which the
    oracle reproduces bit-exactly).
    """
    docs = load_table(spark, sf_dir, "documents", widen=True)
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    # 16-bit integer hash per token: first 4 hex chars of md5.
    hashes = F.transform(words, lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long"))
    n_tok = F.size(hashes)
    def bit_term(b: int):
        # one-arg lambda only (two-arg form would bind the element index)
        ones = F.size(F.filter(hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1))
        return F.when(F.lit(2) * ones > n_tok, F.lit(1 << b)).otherwise(F.lit(0))

    bit_terms = [bit_term(b) for b in range(SIMHASH_BITS)]
    simhash = bit_terms[0]
    for t in bit_terms[1:]:
        simhash = simhash + t
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        simhash.cast("long").alias("simhash"),
    )


_SIMHASH_BIT_SQL = " + ".join(
    f"""CASE WHEN 2 * len(list_filter(hashes, h -> (h >> {b}) & 1 = 1)) > len(hashes)
             THEN {1 << b} ELSE 0 END"""
    for b in range(SIMHASH_BITS)
)

Q_DEDUP_SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split(lower(text), ' '), w -> w <> ''),
           w -> CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT)) AS hashes
  FROM documents
)
SELECT doc_id,
       len(hashes) AS n_tokens,
       CAST({_SIMHASH_BIT_SQL} AS BIGINT) AS simhash
FROM tok
"""


def _cosine_dot(x, y):
    """Strict left-fold dot product (bit-identical to DuckDB list_sum).

    Float-parity note (r10, verdict #5 sweep): the ``cosine`` outputs
    built on this fold are in the documented SAFE float class — the fold
    order is pinned on both engines, and sqrt/mul/div/round are IEEE-
    correctly-rounded, so the per-pair cosine is bit-identical across
    engines by construction (unlike transcendental log10 or order-varying
    group avgs). No integer twin needed; rounding cannot flake."""
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, t: acc + t)


def q_dedup_embedding_cosine_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding-cosine near-dup pairs — the EXACT baseline.

    O(n²) theta join: kept out of the registry, used only by
    tests/test_parity.py's recall assertion against the bucketed form
    below. Dot/norm as explicit sequential folds in double, rounded before
    the threshold so the filter can't flip on last-bit float drift.
    """
    emb = load_table(spark, sf_dir, "embeddings", widen=True)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.sqrt(_cosine_dot(F.col("v"), F.col("v"))).alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.sqrt(_cosine_dot(F.col("v"), F.col("v"))).alias("nb"))
    cos = _cosine_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed (the 100 TB plan).

    Candidates = unordered pairs sharing ≥1 hyperplane-LSH band
    (similarity.banded_buckets — equi-join on (band_idx, bk), NO theta
    join), then exact cosine ≥ threshold verified within candidates only,
    vectors fetched by id-join so heavy arrays never cross the candidate
    shuffle. The oracle reproduces the banded candidate generation
    bit-exactly; recall vs the all-pairs exact form
    (q_dedup_embedding_cosine_allpairs) is asserted in tests.
    """
    from .similarity import banded_buckets

    emb = load_table(spark, sf_dir, "embeddings", widen=True)
    # same materialization as q_sim_knn_per_vector: normed vectors and the
    # narrow bucket relation each computed ONCE (4 embeddings scans per
    # plan otherwise, r05 audit), norms in the checkpoint instead of per
    # join side
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(_cosine_dot(F.col("v"), F.col("v")))) \
        .localCheckpoint(eager=True)
    bb = banded_buckets(e).localCheckpoint(eager=True)
    cand = (
        bb.select(F.col("vec_id").alias("vec_a"), "band_idx", "bk")
        .join(bb.select(F.col("vec_id").alias("vec_b"), "band_idx", "bk"),
              ["band_idx", "bk"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    cos = _cosine_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(a, "vec_a").join(b, "vec_b")
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
    )


def _embed_cosine_sql() -> str:
    from .similarity import banded_buckets_sql

    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
  FROM embeddings
), bb AS (
  {banded_buckets_sql()}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bb a JOIN bb b
    ON a.band_idx = b.band_idx AND a.bk = b.bk AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
             / (a.nrm * b.nrm), 6) AS cosine
FROM cand c
JOIN e a ON a.vec_id = c.vec_a
JOIN e b ON b.vec_id = c.vec_b
WHERE round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
            / (a.nrm * b.nrm), 6) >= {COSINE_THRESHOLD}
"""


Q_DEDUP_EMBED_SQL = _embed_cosine_sql()


def q_dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the dedup pipeline a training corpus actually runs:
    near-dup PAIRS (minhash-LSH, above) → connected components over the
    pair graph → one canonical survivor per duplicate cluster.

    A pair list alone can't drive deletion — near-dup is not transitive,
    so {A~B, B~C} must collapse to ONE cluster keeping one of {A,B,C}.
    Components via the pointer-jumping propagation in graph/traverse.py
    (O(log diameter) rounds, localCheckpoint per round); cluster graphs
    are pair-sparse so the iteration input is tiny relative to the corpus.
    Output: (canonical_id = min doc_id, n_members, max_doc_id) per
    cluster. Oracle: same pairs through a recursive-CTE reachability walk.
    """
    from ..graph.traverse import connected_components

    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    verts = (
        pairs.select(F.col("doc_a").alias("node"))
        .union(pairs.select(F.col("doc_b").alias("node")))
        .distinct()
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(verts, edges)
    return (
        comp.groupBy(F.col("component").alias("canonical_id"))
        .agg(F.count(F.lit(1)).alias("n_members"),
             F.max("node").alias("max_doc_id"))
    )


Q_DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES}, pairs AS (
  SELECT doc_a, doc_b FROM ({_MINHASH_PAIRS_SELECT})
), und AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), verts AS (
  SELECT DISTINCT src AS node FROM und
), walk AS (
  SELECT node, node AS reach FROM verts
  UNION
  SELECT w.node, e.dst FROM walk w JOIN und e ON e.src = w.reach
), comp AS (
  SELECT node, min(reach) AS component FROM walk GROUP BY node
)
SELECT component AS canonical_id, count(*) AS n_members, max(node) AS max_doc_id
FROM comp GROUP BY component
"""


def q_fuzzy_join_typo_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage: match typo'd part names back to the clean
    catalog at edit distance ≤ 1 — entity resolution, the dedup family's
    cross-table cousin. A dirty feed is synthesized by substituting one
    character (position keyed on p_partkey, replacement '#') in every
    clean name.

    Blocking with PROVABLE recall: a length-preserving single
    substitution hits exactly one half of the string, so the other half
    matches the clean record exactly. Each side emits two keys
    ((side, length, half-text)); the candidate search is a pure equi-join
    on that key — never name×name — and levenshtein verifies candidates.
    Because blocking is part of the semantics, the oracle replicates the
    same keys; a recall bug breaks parity, exactly like the phash
    banding. Hot blocks (shared first words, e.g. every 'small …' part)
    are the skew axis — at scale you'd widen halves to thirds-2-of-3 or
    cap block size like the stop-shingle rule.
    """
    part = load_table(spark, sf_dir, "part")
    clean = part.select(F.col("p_partkey").alias("cid"),
                        F.col("p_name").alias("cname"))
    dirty = part.select(
        (F.col("p_partkey") + 1_000_000).alias("did"),
        F.concat(
            F.expr("substring(p_name, 1, (p_partkey % length(p_name)))"),
            F.lit("#"),
            F.expr("substring(p_name, (p_partkey % length(p_name)) + 2)"),
        ).alias("dname"),
    )

    def keys(df, idc, namec):
        half_l = F.expr(f"substring({namec}, 1, length({namec}) div 2)")
        half_r = F.expr(f"substring({namec}, length({namec}) div 2 + 1)")
        ln = F.length(namec)
        return df.select(
            idc, namec,
            F.explode(F.array(
                F.concat_ws("|", F.lit("L"), ln, half_l),
                F.concat_ws("|", F.lit("R"), ln, half_r),
            )).alias("bk"),
        )

    cand = (
        keys(dirty, "did", "dname")
        .join(keys(clean, "cid", "cname"), "bk")
        .select("did", "dname", "cid", "cname")
        .distinct()
    )
    return (
        cand.withColumn("lev", F.levenshtein("dname", "cname"))
        .filter(F.col("lev") <= 1)
        .select("did", "cid", "lev")
        .orderBy("did", "cid")
    )


Q_FUZZY_TYPO_SQL = """
WITH clean AS (
  SELECT p_partkey AS cid, p_name AS cname FROM part
), dirty AS (
  SELECT p_partkey + 1000000 AS did,
         substr(p_name, 1, p_partkey % length(p_name)) || '#'
           || substr(p_name, (p_partkey % length(p_name)) + 2) AS dname
  FROM part
), dk AS (
  SELECT did, dname,
         'L|' || length(dname) || '|' || substr(dname, 1, length(dname) // 2) AS bk
  FROM dirty
  UNION ALL
  SELECT did, dname,
         'R|' || length(dname) || '|' || substr(dname, length(dname) // 2 + 1) AS bk
  FROM dirty
), ck AS (
  SELECT cid, cname,
         'L|' || length(cname) || '|' || substr(cname, 1, length(cname) // 2) AS bk
  FROM clean
  UNION ALL
  SELECT cid, cname,
         'R|' || length(cname) || '|' || substr(cname, length(cname) // 2 + 1) AS bk
  FROM clean
), cand AS (
  SELECT DISTINCT did, dname, cid, cname FROM dk JOIN ck USING (bk)
)
SELECT did, cid, levenshtein(dname, cname) AS lev
FROM cand
WHERE levenshtein(dname, cname) <= 1
ORDER BY did, cid
"""


# --- multi-field entity resolution with integer match scores ----------------
# Fellegi–Sunter restated with PINNED INTEGER field weights so the score
# algebra is exact in both engines: each candidate pair gets an agreement
# vector over (name, balance, segment) and a weighted score; thresholds
# classify match / possible / non_match. The weights are configuration
# (as in any production linkage deployment), not estimated m/u logs —
# estimating them is an EM fit the oracle could not replicate exactly,
# and the pipeline shape (block → compare → score → band) is identical.
ER_W_NAME, ER_W_BAL, ER_W_SEG = 40, 25, 15
ER_T_MATCH, ER_T_POSSIBLE = 65, 40
# Tolerance sits BETWEEN the planted shift levels (…, 100, 150, …), never
# ON one: |(bal+100)-bal| can exceed 100 by half an ulp (both engines
# agree — the comparison is one IEEE subtract over identical doubles —
# but the band would flip on the planted class), so the boundary must
# carry a margin orders of magnitude above ulp scale.
ER_BAL_TOL = 120.0
ER_ID_BASE = 9_000_000


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over two customer rosters: the catalog and a
    synthesized "incoming feed" with keyed per-record corruption (name
    typo classes by k%3 — clean / one-char / two-char; balance shifted by
    50·(k%5); segment dropped to UNKNOWN for odd keys), so every
    agreement pattern the score algebra distinguishes actually occurs
    (CLAUDE.md dead-variation rule: the corruption moduli are coprime, so
    bands and scores spread across k).

    Blocking: (nationkey, last-3-of-name). The corruption never touches
    the name's digit tail (typo positions sit in the shared 'Customer#'
    prefix), so every true pair shares its block — recall is structural,
    like the typo-linkage half keys — while key collisions 1000 apart
    supply genuine impostor candidates that exercise the lower bands.
    Candidate pairs are a pure equi-join on the block key; never
    roster x roster.

    Scoring: lev(name) ≤ 1 → +40, |Δbalance| ≤ ER_BAL_TOL → +25, segment equal
    → +15; ≥ 65 match, ≥ 40 possible, else non_match. All hashed outputs
    are integers/strings — the balance comparison is a single IEEE
    subtract over identical doubles, and only its boolean survives.

    Scale: blocks are (nation × name-suffix) — thousands of tiny groups;
    at 100 TB the skew guard is the standard block-size cap (split hot
    suffixes on an extra field, same stop-shingle logic as PPJoin).
    """
    cust = load_table(spark, sf_dir, "customer")
    cat = cust.select(F.col("c_custkey").alias("cid"),
                      F.col("c_name").alias("cname"),
                      F.col("c_nationkey").alias("cnat"),
                      F.col("c_acctbal").alias("cbal"),
                      F.col("c_mktsegment").alias("cseg"))
    k = F.col("c_custkey")
    dname = (
        F.when(k % 3 == 0, F.col("c_name"))
        .when(k % 3 == 1, F.concat(
            F.expr("substring(c_name, 1, (c_custkey % 9))"), F.lit("#"),
            F.expr("substring(c_name, (c_custkey % 9) + 2)")))
        .otherwise(F.concat(F.lit("##"), F.expr("substring(c_name, 3)")))
    )
    feed = cust.select((k + ER_ID_BASE).alias("did"),
                       dname.alias("dname"),
                       F.col("c_nationkey").alias("dnat"),
                       (F.col("c_acctbal")
                        + (k % 5).cast("double") * 50.0).alias("dbal"),
                       F.when(k % 2 == 0, F.col("c_mktsegment"))
                       .otherwise(F.lit("UNKNOWN")).alias("dseg"))
    bk_c = F.concat_ws("|", F.col("cnat"), F.expr("substring(cname, -3)"))
    bk_d = F.concat_ws("|", F.col("dnat"), F.expr("substring(dname, -3)"))
    cand = (feed.withColumn("bk", bk_d)
            .join(cat.withColumn("bk", bk_c), "bk"))
    lev = F.levenshtein("dname", "cname")
    score = (
        F.when(lev <= 1, ER_W_NAME).otherwise(0)
        + F.when(F.abs(F.col("dbal") - F.col("cbal")) <= ER_BAL_TOL,
                 ER_W_BAL).otherwise(0)
        + F.when(F.col("dseg") == F.col("cseg"), ER_W_SEG).otherwise(0)
    )
    return (cand.select(
        "did", "cid",
        lev.cast("long").alias("lev"),
        score.cast("long").alias("score"),
        F.when(score >= ER_T_MATCH, "match")
        .when(score >= ER_T_POSSIBLE, "possible")
        .otherwise("non_match").alias("band"))
        .orderBy("did", "cid"))


Q_ENTITY_RESOLUTION_SQL = f"""
WITH cat AS (
  SELECT c_custkey AS cid, c_name AS cname, c_nationkey AS cnat,
         c_acctbal AS cbal, c_mktsegment AS cseg
  FROM customer
), feed AS (
  SELECT c_custkey + {ER_ID_BASE} AS did,
         CASE WHEN c_custkey % 3 = 0 THEN c_name
              WHEN c_custkey % 3 = 1 THEN
                substr(c_name, 1, c_custkey % 9) || '#'
                  || substr(c_name, (c_custkey % 9) + 2)
              ELSE '##' || substr(c_name, 3) END AS dname,
         c_nationkey AS dnat,
         c_acctbal + CAST(c_custkey % 5 AS DOUBLE) * 50.0 AS dbal,
         CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
              ELSE 'UNKNOWN' END AS dseg
  FROM customer
), cand AS (
  SELECT d.did, d.dname, d.dbal, d.dseg, c.cid, c.cname, c.cbal, c.cseg
  FROM feed d JOIN cat c
    ON c.cnat = d.dnat AND substr(c.cname, -3) = substr(d.dname, -3)
), scored AS (
  SELECT did, cid, levenshtein(dname, cname) AS lev,
         (CASE WHEN levenshtein(dname, cname) <= 1
               THEN {ER_W_NAME} ELSE 0 END
          + CASE WHEN abs(dbal - cbal) <= {ER_BAL_TOL}
                 THEN {ER_W_BAL} ELSE 0 END
          + CASE WHEN dseg = cseg THEN {ER_W_SEG} ELSE 0 END) AS score
  FROM cand
)
SELECT did, cid, CAST(lev AS BIGINT) AS lev, CAST(score AS BIGINT) AS score,
       CASE WHEN score >= {ER_T_MATCH} THEN 'match'
            WHEN score >= {ER_T_POSSIBLE} THEN 'possible'
            ELSE 'non_match' END AS band
FROM scored
ORDER BY did, cid
"""


# --- PPJoin-style prefix-filtered set-similarity join -----------------------
# Exact-threshold Jaccard join with PREFIX FILTERING (Chaudhuri et al.
# SSJoin 2006 / Xiao et al. PPJoin 2008): order every doc's shingles by
# ascending global document frequency (rarest first), and join only on each
# doc's first p = n − ceil(τ·n) + 1 shingles. Any pair with J ≥ τ must
# share a prefix shingle (pigeonhole on the ≥ τ/(1+τ)·(n_a+n_b) required
# overlap), so the filter is LOSSLESS — and the oracle proves it: the
# DuckDB side runs the NAIVE full inverted-index join, and the bit-exact
# equality of both result sets is a machine-checked completeness proof on
# this corpus. τ is the exact rational 4/5 so prefix lengths, length
# filters, and the final threshold are pure integer arithmetic on both
# engines.
PF_TAU_NUM, PF_TAU_DEN = 4, 5   # τ = 0.8


def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard ≥ τ near-dup pairs via prefix filtering — the exact
    set-similarity join that REPLACES the naive Σ df² inverted-index join
    (``dedup_ngram_jaccard``'s documented 100 TB weakness) with a
    candidate set driven only by RARE shingles.

    Scale shape: df is one keyed count; the prefix cut is a per-doc
    window (partitions are single documents, never skewed); candidate
    generation joins prefix-to-prefix on the shingle — hot shingles are
    structurally excluded because a frequent shingle is at the END of
    the df-ascending order and falls outside every prefix. The length
    filter (τ·n_a ≤ n_b ∧ τ·n_b ≤ n_a, cross-multiplied to integers)
    prunes size-mismatched pairs before the verify join, and verification
    cost is |candidates|×|shingles-per-doc| equi-join rows, not corpus².
    """
    from pyspark.sql.window import Window as W

    sh = _shingle_rel(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = (ex.join(dfreq, "s")
              .withColumn("pos", F.row_number().over(
                  W.partitionBy("doc_id").orderBy("df", "s")))
              .join(sizes, "doc_id"))
    # p = n − ceil(τn) + 1; ceil(4n/5) = (4n+4) div 5 — exact integers
    prefix = (ranked
              .filter(F.col("pos")
                      <= F.col("n")
                      - F.expr(f"({PF_TAU_NUM}*n + {PF_TAU_NUM}) "
                               f"div {PF_TAU_DEN}") + 1)
              .select("doc_id", "s", "n"))
    a = prefix.select(F.col("doc_id").alias("doc_a"), "s",
                      F.col("n").alias("n_a"))
    b = prefix.select(F.col("doc_id").alias("doc_b"), "s",
                      F.col("n").alias("n_b"))
    cand = (a.join(b, "s")
            .filter((F.col("doc_a") < F.col("doc_b"))
                    & (PF_TAU_DEN * F.col("n_b")
                       >= PF_TAU_NUM * F.col("n_a"))
                    & (PF_TAU_DEN * F.col("n_a")
                       >= PF_TAU_NUM * F.col("n_b")))
            .select("doc_a", "doc_b").distinct()
            .localCheckpoint(eager=True))
    ea = ex.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    eb = ex.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sa"))
    common = (cand.join(ea, "doc_a").join(eb, ["doc_b", "sa"])
              .groupBy("doc_a", "doc_b")
              .agg(F.count(F.lit(1)).alias("common")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (common.join(sa, "doc_a").join(sb, "doc_b")
            .filter(PF_TAU_DEN * F.col("common")
                    >= PF_TAU_NUM * (F.col("n_a") + F.col("n_b")
                                     - F.col("common")))
            .select("doc_a", "doc_b", "common",
                    F.expr("common * 1000000 div (n_a + n_b - common)")
                    .alias("jaccard_ppm"))
            .orderBy("doc_a", "doc_b"))


Q_DEDUP_PREFIX_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles
  FROM (SELECT doc_id, {_WORDS_SQL} AS words FROM documents)
), sizes AS (
  SELECT doc_id, len(shingles) AS n FROM sh
), ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, CAST(p.common AS BIGINT) AS common,
       CAST(p.common AS BIGINT) * 1000000
         // (sa.n + sb.n - p.common) AS jaccard_ppm
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE {PF_TAU_DEN} * p.common >= {PF_TAU_NUM} * (sa.n + sb.n - p.common)
ORDER BY p.doc_a, p.doc_b
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_prefix_filter": q_dedup_prefix_filter,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_cluster_canonical": q_dedup_cluster_canonical,
    "fuzzy_join_typo_linkage": q_fuzzy_join_typo_linkage,
    "entity_resolution_scored": q_entity_resolution,
}

ORACLE = {
    "dedup_exact": Q_DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": Q_DEDUP_NGRAM_SQL,
    "dedup_prefix_filter": Q_DEDUP_PREFIX_SQL,
    "dedup_minhash_lsh": Q_DEDUP_MINHASH_SQL,
    "dedup_simhash": Q_DEDUP_SIMHASH_SQL,
    "dedup_embedding_cosine": Q_DEDUP_EMBED_SQL,
    "dedup_cluster_canonical": Q_DEDUP_CLUSTER_SQL,
    "fuzzy_join_typo_linkage": Q_FUZZY_TYPO_SQL,
    "entity_resolution_scored": Q_ENTITY_RESOLUTION_SQL,
}
