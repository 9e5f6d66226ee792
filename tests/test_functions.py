"""Unit tests for the reference-derived scalar string functions
(SURVEY.md §2.A #14-16, #22-23)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_project_spark.functions.strings import (
    extract_content, extract_nested_content, format_node_label,
    parse_airplanes, sanitize_relationship, tag_prefix_numeric,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_sanitize_relationship(spark):
    got = _one(spark, sanitize_relationship(F.lit("Planning Information (1)")))
    assert got == "PLANNING_INFORMATION__1_"


def test_format_node_label(spark):
    assert _one(spark, format_node_label(F.lit("HAS_PLANNING_INFORMATION"))) == \
        "Planning_Information"
    assert _one(spark, format_node_label(F.lit("work_instructions"))) == \
        "Work_Instructions"


def test_tag_prefix_numeric(spark):
    df = spark.createDataFrame([("737_thing",), ("header",)], "t string")
    got = [r.v for r in df.select(tag_prefix_numeric("t").alias("v")).collect()]
    assert got == ["Tag_737_thing", "header"]


def test_extract_content_first_vs_nested_greedy(spark):
    line = "<a>x</a><a>y</a>"
    assert _one(spark, extract_content(F.lit(line), "a")) == "x"
    assert _one(spark, extract_nested_content(F.lit(line), "a")) == "x</a><a>y"


def test_parse_airplanes_micro_format(spark):
    content = "737-8 and 737-9 Airplane(s), line number(s) 5602, 5668, 6975-6976"
    row = _one(spark, parse_airplanes(F.lit(content)))
    assert list(row.types) == ["737-8", "737-9"]
    assert list(row.line_numbers) == ["5602", "5668", "6975-6976"]


def test_approx_count_distinct_within_tolerance(spark):
    """approx_count_distinct (HLL++ sketch, mergeable map-side — the 100 TB
    count-distinct) must land within 5% of exact on the orders table."""
    from pyspark.sql import functions as F
    from graph_database_project_spark.io import load_table
    from .conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05

    # the registered rows-only query self-reports its error per group
    from graph_database_project_spark.operators.relational import (
        q_agg_approx_distinct,
    )

    rows = q_agg_approx_distinct(spark, SF_ORACLE).collect()
    assert rows and all(r.approx_ok for r in rows)


def test_hybrid_rrf_fusion_arithmetic_and_arm_membership(spark):
    """Oracle-independent contracts of text_hybrid_rrf: the fused score is
    EXACTLY the integer RRF of the two arm ranks (1e6 // (K + rank), 0 for
    a missing arm), rank 0 is only ever 'absent from that arm', and a doc
    ranked by both arms outscores any single-arm doc with comparable
    ranks — the fusion property that makes hybrid retrieval work."""
    from .conftest import SF_ORACLE
    from graph_database_project_spark.operators.textops import (
        RRF_CAND, RRF_K, q_text_hybrid_rrf)

    rows = q_text_hybrid_rrf(spark, SF_ORACLE).collect()
    assert rows, "empty fusion output"
    both = 0
    for r in rows:
        exp = 0
        if r.bm25_rank > 0:
            assert 1 <= r.bm25_rank <= RRF_CAND
            exp += 1_000_000 // (RRF_K + r.bm25_rank)
        if r.cos_rank > 0:
            assert 1 <= r.cos_rank <= RRF_CAND
            exp += 1_000_000 // (RRF_K + r.cos_rank)
        assert r.bm25_rank > 0 or r.cos_rank > 0
        assert r.rrf_ppm == exp, (r.doc_id, r.bm25_rank, r.cos_rank)
        assert r.doc_id != 0, "query doc leaked into its own results"
        both += int(r.bm25_rank > 0 and r.cos_rank > 0)
    # descending fused order with doc_id tie-break (driver total order)
    keys = [(-r.rrf_ppm, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # any doc both arms nominated beats every single-arm doc whose one
    # rank is numerically >= both of its ranks — spot-check the head row
    if both:
        head = next(r for r in rows if r.bm25_rank > 0 and r.cos_rank > 0)
        singles = [r for r in rows if (r.bm25_rank == 0) != (r.cos_rank == 0)]
        for s in singles:
            one = max(s.bm25_rank, s.cos_rank)
            if one >= max(head.bm25_rank, head.cos_rank):
                assert s.rrf_ppm < head.rrf_ppm


def test_bpe_hand_corpus_merges_and_tiebreak(spark):
    """Pinned BPE semantics on a corpus small enough to verify by hand:
    weighted argmax, lexicographic-min tie-break, and the single-pass
    leftmost-non-overlapping merge (the odd-run 'abab' merges its first
    'a b' only in round 1)."""
    from graph_database_project_spark.operators.textops import learn_bpe_merges

    wc = spark.createDataFrame(
        [("abab", 3), ("ab", 5), ("ba", 1)], "word string, wcnt long")
    rows = learn_bpe_merges(wc, 2).collect()
    # round 1: 'a b' occurs twice in abab (x3) + once in ab (x5) = 11
    assert (rows[0].pair, rows[0].merged, rows[0].weight) == ("a b", "ab", 11)
    # round 2 vocab: ~ab~a~b~ (x3), ~ab~ (x5), ~b~a~ (x1) — pairs
    # 'ab a' (3) ties 'a b' (3); '~ab~a~' < '~a~b~' lexicographically
    assert (rows[1].pair, rows[1].merged, rows[1].weight) == ("ab a", "aba", 3)


def test_skyline_matches_quadratic_dominance_bruteforce(spark):
    """The grid pre-prune + running-max window rewrite must equal the
    O(n²) dominance definition on the real corpus — computed here
    independently in numpy (the driver oracle re-proves this vs SQL
    NOT EXISTS; this test keeps the proof in-repo and ties included)."""
    import numpy as np

    from .conftest import SF_ORACLE
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.tpch_ext import q_skyline_pareto

    pts = (load_table(spark, SF_ORACLE, "part")
           .filter(F.col("p_retailprice").isNotNull()
                   & F.col("p_size").isNotNull())
           .select("p_partkey",
                   F.round(F.col("p_retailprice") * 100, 0).cast("long")
                   .alias("price_c"),
                   F.col("p_size").cast("int").alias("size")).collect())
    price = np.array([r.price_c for r in pts])
    size = np.array([r.size for r in pts])
    le = (price[:, None] <= price[None, :]) & (size[:, None] >= size[None, :])
    strict = (price[:, None] < price[None, :]) | (size[:, None] > size[None, :])
    dominated = (le & strict).any(axis=0)
    expect = sorted((r.p_partkey, r.price_c, r.size)
                    for r, d in zip(pts, dominated) if not d)
    got = sorted((r.p_partkey, r.price_c, r.size)
                 for r in q_skyline_pareto(spark, SF_ORACLE).collect())
    assert got == expect and got, "skyline mismatch or empty"


def test_assoc_rules_marginals_and_bounds(spark):
    """Association-rule invariants: pair count never exceeds either
    marginal, confidence/support are consistent floor-ppm ratios, and
    every pair's lift is the ratio of observed to independence-expected
    co-occurrence (spot-recomputed from the distinct basket relation)."""
    from .conftest import SF_ORACLE
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.tpch_ext import (
        q_assoc_basket_rules)

    li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, SF_ORACLE, "part").select("p_partkey", "p_brand")
    ob = (li.join(part, li.l_partkey == part.p_partkey)
          .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
          .distinct())
    n_orders = ob.select("o").distinct().count()
    marg = {r.b: r.c for r in
            ob.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()}
    rows = q_assoc_basket_rules(spark, SF_ORACLE).collect()
    assert rows, "no rules"
    for r in rows:
        assert 0 < r.pair_cnt <= min(marg[r.b1], marg[r.b2])
        assert r.support_ppm == r.pair_cnt * 1_000_000 // n_orders
        assert r.conf12_ppm == r.pair_cnt * 1_000_000 // marg[r.b1]
        assert r.conf21_ppm == r.pair_cnt * 1_000_000 // marg[r.b2]
        assert r.lift_ppm == (n_orders * r.pair_cnt) * 1_000_000 // (
            marg[r.b1] * marg[r.b2])
        assert r.b1 < r.b2


def test_bpe_token_count_bounds_and_consistency(spark):
    """Application invariants the bit-exact oracle can't see: per doc,
    n_words <= n_tokens <= n_chars (each word is at least one symbol and
    merging only shrinks the segmentation), and the corpus-wide token
    total strictly beats the unmerged character total (the learned merges
    actually compress). Cross-checks n_words against an independent
    whitespace+filter recount for one document."""
    from .conftest import SF_ORACLE
    from graph_database_project_spark.io import load_table
    from graph_database_project_spark.operators.textops import (
        BPE_MAX_LEN, BPE_MIN_LEN, q_bpe_token_count)

    rows = q_bpe_token_count(spark, SF_ORACLE).collect()
    assert rows, "empty token counts"
    for r in rows:
        assert 0 < r.n_words <= r.n_tokens <= r.n_chars
        assert r.compression_ppm == r.n_tokens * 1_000_000 // r.n_chars
    assert sum(r.n_tokens for r in rows) < sum(r.n_chars for r in rows)
    # independent python recount of one doc's filtered word total
    import re as _re
    doc = load_table(spark, SF_ORACLE, "documents") \
        .filter(F.col("doc_id") == rows[0].doc_id).first()
    words = [w for w in _re.split("[^a-z]+", doc.text.lower())
             if BPE_MIN_LEN <= len(w) <= BPE_MAX_LEN]
    assert rows[0].n_words == len(words)
    assert rows[0].n_chars == sum(len(w) for w in words)


def test_vocab_growth_heaps_shape(spark):
    """The growth profile's semantic contract: all columns monotone in the
    cut, the shingle vocabulary is the LIVE dimension (strictly growing at
    every cut — the word vocabulary saturating after the first cut is an
    exposed corpus property, not a test target), and growth is sub-linear
    (Heaps): doubling the corpus from 50% to 100% must add fewer new
    shingles than the first 50% found."""
    from .conftest import SF_ORACLE
    from graph_database_project_spark.operators.textops import q_vocab_growth

    rows = q_vocab_growth(spark, SF_ORACLE).collect()
    assert [r.pct for r in rows] == [1, 2, 5, 10, 20, 50, 100]
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs > a.n_docs and b.n_tokens > a.n_tokens
        assert b.shingle_vocab > a.shingle_vocab   # live at every cut
        assert b.word_vocab >= a.word_vocab
    half = next(r for r in rows if r.pct == 50)
    full = next(r for r in rows if r.pct == 100)
    assert full.shingle_vocab - half.shingle_vocab < half.shingle_vocab
