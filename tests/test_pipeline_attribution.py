"""Semantic invariants of linear multi-touch attribution — properties
the value-hash oracle can't express as intent: exact conservation (the
operator's contract), live planted classes (organic and multi-touch),
and remainder-to-latest integrality."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_project_spark.io import load_table
from graph_database_project_spark.operators.pipeline import (
    q_attribution_linear)

SF = "/root/testdata/sf0.01"


def test_attribution_conserves_value_to_the_cent(spark):
    out = q_attribution_linear(spark, SF).collect()
    attributed = sum(r.attributed_cents for r in out)
    ev = load_table(spark, SF, "events")
    total = (ev.filter(F.col("event_type") == "purchase")
             .select(F.floor(F.col("value") * F.lit(100.0)).cast("long")
                     .alias("c"))
             .agg(F.sum("c")).first()[0])
    assert attributed == total  # exact, no rounding drift anywhere


def test_attribution_planted_classes_live(spark):
    rows = {r.channel: r for r in q_attribution_linear(spark, SF).collect()}
    # organic bucket exists and is whole-value (one row per purchase)
    assert rows["(organic)"].n_rows == rows["(organic)"].n_purchases > 0
    # multi-touch is live: touch channels carry more rows than purchases
    for ch in ("click", "view"):
        assert rows[ch].n_rows > rows[ch].n_purchases > 0
    # a purchase can be attributed across BOTH channels (sets overlap):
    # total per-channel purchase tallies exceed the distinct purchases
    n_purch = (load_table(spark, SF, "events")
               .filter(F.col("event_type") == "purchase").count())
    assert rows["click"].n_purchases + rows["view"].n_purchases \
        + rows["(organic)"].n_purchases > n_purch


def test_attribution_corpus_values_non_negative(spark):
    """ADVICE r11: the cents div/mod arithmetic sits on the documented
    signed-division divergence (Spark `div` truncates toward zero,
    DuckDB `//` floors) — the operator's docstring states a value >= 0
    corpus assumption; this pins it. A refund-capable variant needs the
    abs-then-resign discipline (ts_autocorrelation)."""
    ev = load_table(spark, SF, "events")
    n_neg = (ev.filter(F.col("event_type") == "purchase")
             .filter(F.col("value") < 0).count())
    assert n_neg == 0
