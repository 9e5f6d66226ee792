"""Property tests pinning the sketch ARITHMETIC contract, Spark-free: a
pure-Python model of the pinned CMS/HLL math is checked against DuckDB
running the same SQL fragments the oracles use, over hypothesis-generated
key multisets. This catches a drift in either side's arithmetic (hash
constants, modulus order, rank convention, dyadic sum) locally in
milliseconds, without a SparkSession — the Spark side is tied to the same
arithmetic by the full parity gate."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from graph_database_project_spark.operators.profiling import (
    CMS_A, CMS_B, CMS_D, CMS_P, CMS_W,
    HLL_M, HLL_MUL1, HLL_MUL2, HLL_OFFSET, HLL_W)

KEYS = st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                min_size=1, max_size=200)


def _py_cms(keys):
    cells = {}
    for k in keys:
        for d in range(CMS_D):
            b = ((CMS_A[d] * k + CMS_B[d]) % CMS_P) % CMS_W
            cells[(d, b)] = cells.get((d, b), 0) + 1
    return cells


def _py_cms_est(cells, k):
    return min(cells.get((d, ((CMS_A[d] * k + CMS_B[d]) % CMS_P) % CMS_W), 0)
               for d in range(CMS_D))


def _py_hll_registers(keys):
    regs = [0] * HLL_M
    for k in set(keys):
        h0 = (k % 2147483648 + HLL_OFFSET) % 4294967296
        h1 = ((h0 ^ (h0 >> 16)) * HLL_MUL1) % 4294967296
        h2 = ((h1 ^ (h1 >> 15)) * HLL_MUL2) % 4294967296
        h = h2 ^ (h2 >> 16)
        bucket, rest = h % HLL_M, h // HLL_M
        if rest == 0:
            rank = HLL_W + 1
        else:
            rank = 1
            while rest % 2 == 0:
                rest //= 2
                rank += 1
        regs[bucket] = max(regs[bucket], rank)
    return regs


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


@settings(max_examples=25, deadline=None)
@given(KEYS)
def test_cms_model_matches_duckdb_and_never_undercounts(con, keys):
    con.execute("CREATE OR REPLACE TABLE ks (k BIGINT)")
    con.executemany("INSERT INTO ks VALUES (?)", [(k,) for k in keys])
    params = ", ".join(f"({d}, {CMS_A[d]}, {CMS_B[d]})" for d in range(CMS_D))
    rows = con.execute(f"""
        WITH params AS (SELECT * FROM (VALUES {params}) AS t(d, a, b))
        SELECT d, ((a * k + b) % {CMS_P}) % {CMS_W} AS bucket, count(*) AS c
        FROM ks CROSS JOIN params GROUP BY 1, 2""").fetchall()
    assert {(d, b): c for d, b, c in rows} == _py_cms(keys)
    cells = _py_cms(keys)
    from collections import Counter
    exact = Counter(keys)
    for k, n in exact.items():
        assert _py_cms_est(cells, k) >= n


@settings(max_examples=25, deadline=None)
@given(KEYS)
def test_hll_model_matches_duckdb_registers(con, keys):
    con.execute("CREATE OR REPLACE TABLE ks (k BIGINT)")
    con.executemany("INSERT INTO ks VALUES (?)", [(k,) for k in keys])
    rank_rows = ", ".join(
        f"({1 << j}, {j + 1})" for j in range(HLL_W)) + f", (0, {HLL_W + 1})"
    rows = con.execute(f"""
        WITH keys AS (SELECT DISTINCT k % 2147483648 AS k FROM ks),
        mixed AS (
          SELECT xor(h2, h2 >> 16) AS h FROM (
            SELECT (xor(h1, h1 >> 15) * {HLL_MUL2}) % 4294967296 AS h2 FROM (
              SELECT (xor(h0, h0 >> 16) * {HLL_MUL1}) % 4294967296 AS h1 FROM (
                SELECT (k + {HLL_OFFSET}) % 4294967296 AS h0 FROM keys)))
        ), rank_dim AS (
          SELECT CAST(lowbit AS BIGINT) AS lowbit, CAST(rank AS INT) AS rank
          FROM (VALUES {rank_rows}) AS t(lowbit, rank)
        )
        SELECT h % {HLL_M} AS bucket, max(d.rank) AS reg
        FROM mixed JOIN rank_dim d ON d.lowbit = ((h // {HLL_M}) & -(h // {HLL_M}))
        GROUP BY 1""").fetchall()
    got = [0] * HLL_M
    for b, r in rows:
        got[b] = r
    assert got == _py_hll_registers(keys)


# --- bloom filter bit-packing ------------------------------------------------

def _py_bloom_words(keys):
    from graph_database_project_spark.operators.profiling import (
        BLOOM_A, BLOOM_B, BLOOM_K, BLOOM_M, BLOOM_WORDS)

    words = [0] * BLOOM_WORDS
    for k in keys:
        for i in range(BLOOM_K):
            pos = ((BLOOM_A[i] * k + BLOOM_B[i]) % CMS_P) % BLOOM_M
            words[pos // 63] |= 1 << (pos % 63)
    return words


def _py_bloom_member(words, k):
    from graph_database_project_spark.operators.profiling import (
        BLOOM_A, BLOOM_B, BLOOM_K, BLOOM_M)

    for i in range(BLOOM_K):
        pos = ((BLOOM_A[i] * k + BLOOM_B[i]) % CMS_P) % BLOOM_M
        if not (words[pos // 63] >> (pos % 63)) & 1:
            return False
    return True


@given(KEYS)
@settings(max_examples=100, deadline=None)
def test_bloom_no_false_negatives_and_signed_safe(keys):
    """Every inserted key MUST pass membership (the bloom contract the
    Spark/DuckDB audit asserts on real data), and the 63-payload-bit word
    layout keeps every word inside signed-64 range — the invariant that
    lets DuckDB build the identical words without its 1<<63 overflow
    error."""
    words = _py_bloom_words(keys)
    assert all(_py_bloom_member(words, k) for k in keys)
    assert all(0 <= w < 2**63 for w in words)


@given(KEYS, KEYS)
@settings(max_examples=50, deadline=None)
def test_bloom_words_merge_by_bitwise_or(keys_a, keys_b):
    """Slice-built filters merge by per-word OR into exactly the
    whole-set filter — the property that lets 100 TB ingest build the
    filter as a map-side partial aggregate."""
    merged = [a | b for a, b in zip(_py_bloom_words(keys_a),
                                    _py_bloom_words(keys_b))]
    assert merged == _py_bloom_words(keys_a + keys_b)


def test_bloom_empty_set_rejects_everything():
    """An empty filter (no dim keys survive the predicate) must reject
    every probe — all-zero words, zero popcount, and OR-merge identity."""
    words = _py_bloom_words([])
    assert all(w == 0 for w in words)
    assert not any(_py_bloom_member(words, k) for k in range(1000))
    some = _py_bloom_words([7, 42])
    assert [a | b for a, b in zip(words, some)] == some
