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
