"""Local twin of the driver's DuckDB differential harness: run the Spark
query and the oracle SQL on the same parquet tables, compare row count,
column-name set, and order-insensitive values (floats to 1e-6 — except
driver-window keys, whose floats compare BIT-EXACT because that is what
the driver's value-hash does; the r05 ``join_bloom_prune`` hash-fail was
a last-ulp round() divergence this file's 1e-6 rounding could not see)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame, bitexact: bool = False) -> list[tuple]:
    df = df[sorted(df.columns)]

    def normf(x):
        return x if bitexact else round(x, 6)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        # array-valued cells: Spark gives lists, DuckDB numpy arrays —
        # normalize elementwise to one canonical tuple
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        if pd.isna(v) if not isinstance(v, (set, dict)) else False:
            return None
        if isinstance(v, float):
            return normf(v)
        if isinstance(v, (int,)):
            return int(v)
        if hasattr(v, "item") and not isinstance(v, (str, bytes)):  # numpy scalar
            x = v.item()
            return normf(x) if isinstance(x, float) else x
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def assert_driver_canonicalizable(spark_df, name: str = "",
                                  sample_pdf: pd.DataFrame | None = None) -> None:
    """Driver-faithfulness lint. The driver's canonicalizer is stricter than
    local ``_canon``: it hashes cell values, so an array/map/struct column
    (pandas list/dict/ndarray cells) dies with ``unhashable type`` — the
    r02/r03 ``xml_khop_flagship`` ERR that local parity missed. Enforce both
    layers here: no complex top-level types in the schema, and every sampled
    cell hashable."""
    from pyspark.sql import types as T

    complex_cols = [f.name for f in spark_df.schema.fields
                    if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} — registered "
        f"query outputs must be scalar (flatten with concat_ws/to_json)"
    )
    if sample_pdf is not None:
        for col in sample_pdf.columns:
            for v in sample_pdf[col].head(20):
                try:
                    hash(v)
                except TypeError:
                    raise AssertionError(
                        f"{name}: unhashable cell in column {col!r} "
                        f"({type(v).__name__}) — driver canonicalizer would ERR"
                    ) from None


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "",
            bitexact: bool = False) -> None:
    spdf = spark_df.toPandas()
    assert_driver_canonicalizable(spark_df, name, sample_pdf=spdf)
    assert sorted(spdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spdf)} oracle={len(oracle_pdf)}"
    )
    a, b = _canon(spdf, bitexact), _canon(oracle_pdf, bitexact)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
