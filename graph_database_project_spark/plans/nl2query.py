"""NL → query → NL pipeline skeleton (reference §3.1 lifecycle; 2.A#12/#13).

The reference sends the hardcoded schema catalog + chat history to GPT-4o
for Cypher, executes on Neo4j, then renders the records with GPT-4
(first-graph.py:56-198). Here the same three seams exist with the LLM made
*pluggable* and a deterministic rule-based fallback as default, so the whole
lifecycle is testable offline (SURVEY.md §7.1 M3):

  nl2query(question, catalog)  -> Spark SQL string       [LLM seam 1]
  run:    spark.sql(...)       -> DataFrame              [engine]
  explain_result(name, rows)   -> natural-language string [LLM seam 2]

The catalog handed to the translator is *derived* from the data
(GraphStore.catalog_labels / io.TABLE_NAMES), not hand-maintained like the
reference's 35-label prompt block (first-graph.py:65-136).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..io import TABLE_NAMES, register_views

Translator = Callable[[str, dict], str]

_RULES: list[tuple[re.Pattern, Callable[[re.Match], str]]] = [
    (
        re.compile(r"how many (\w+) (?:are there )?per (\w+)", re.I),
        lambda m: _count_per(m.group(1), m.group(2)),
    ),
    (
        re.compile(r"top (\d+) customers by (?:revenue|spend)", re.I),
        lambda m: (
            "SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey, c_name "
            f"ORDER BY revenue DESC, c_custkey LIMIT {int(m.group(1))}"
        ),
    ),
    (
        re.compile(r"total revenue per nation in region '?([A-Z ]+?)'?\s*$", re.I),
        lambda m: (
            "SELECT n_name, round(sum(o_totalprice), 2) AS revenue "
            "FROM region JOIN nation ON r_regionkey = n_regionkey "
            "JOIN customer ON n_nationkey = c_nationkey "
            "JOIN orders ON c_custkey = o_custkey "
            f"WHERE r_name = '{m.group(1).upper()}' GROUP BY n_name"
        ),
    ),
    (
        re.compile(r"how many distinct (\w+) values in (\w+)", re.I),
        lambda m: f"SELECT count(DISTINCT {m.group(1)}) AS n FROM {m.group(2)}",
    ),
]

_PRIORITY_COLS = {
    "orders": {"priority": "o_orderpriority", "status": "o_orderstatus",
               "customer": "o_custkey"},
    "customers": {"nation": "c_nationkey", "segment": "c_mktsegment"},
    "events": {"type": "event_type", "user": "user_id"},
    "documents": {"language": "lang", "lang": "lang", "source": "source"},
}


def _count_per(entity: str, dim: str) -> str:
    table = entity.lower() if entity.lower() in _PRIORITY_COLS else entity.lower() + "s"
    table = {"customers": "customer"}.get(table, table)
    key = entity.lower() if entity.lower() in _PRIORITY_COLS else table
    cols = _PRIORITY_COLS.get(entity.lower()) or _PRIORITY_COLS.get(key) or {}
    col = cols.get(dim.lower(), dim.lower())
    return f"SELECT {col} AS {dim.lower()}, count(*) AS n FROM {table} GROUP BY {col}"


def rule_based_translate(question: str, catalog: dict) -> str:
    """Deterministic fallback translator. Raises ValueError on questions it
    cannot ground — the caller decides whether to escalate to an LLM."""
    q = question.strip().rstrip("?")
    for pattern, build in _RULES:
        m = pattern.search(q)
        if m:
            return build(m)
    raise ValueError(f"no rule matches question: {question!r}")


def derive_catalog(spark: SparkSession, sf_dir: str) -> dict:
    """information_schema-style catalog from the actual tables (replaces the
    reference's hand-maintained prompt block)."""
    register_views(spark, sf_dir)
    return {
        t: [f.name for f in spark.table(t).schema.fields] for t in TABLE_NAMES
    }


def answer(spark: SparkSession, sf_dir: str, question: str,
           translate: Translator = rule_based_translate) -> tuple[str, DataFrame]:
    """Full lifecycle: catalog → translate → execute. Returns (sql, result).
    Swap ``translate`` for an LLM-backed callable in production."""
    catalog = derive_catalog(spark, sf_dir)
    sql = translate(question, catalog)
    return sql, spark.sql(sql)


def explain_result(question: str, rows: list) -> str:
    """Deterministic result → NL rendering (LLM seam 2; first-graph.py
    :182-198 sends rows to GPT-4 — this fallback templates them)."""
    n = len(rows)
    if n == 0:
        return f"No results for: {question}"
    head = ", ".join(f"{k}={v}" for k, v in rows[0].asDict().items())
    return f"{n} row(s) for '{question}'. First: {head}."


_GRAPH_RULE = re.compile(
    r"(?:connected to|contents of|what is in)\s+(?:bulletin\s+)?'?([\w.-]+)'?"
    r"(?:\s+up to\s+(\d+)\s+(?:levels?|hops?))?",
    re.I,
)


def answer_graph(spark: SparkSession, store, question: str) -> DataFrame:
    """The reference's flagship chat lifecycle (first-graph.py:141,168-176)
    against the graph store: NL question → seed + depth → k-hop downward
    expansion → per-seed grouped result. Rule-based translation with the
    same pluggable-translator contract as ``answer``; an LLM translator
    would emit the same (seed_name, depth) plan.
    """
    from pyspark.sql import functions as F

    m = _GRAPH_RULE.search(question.strip().rstrip("?"))
    if not m:
        raise ValueError(f"no graph rule matches question: {question!r}")
    seed_name, depth = m.group(1), int(m.group(2) or 3)
    return store.khop_grouped(F.col("name") == seed_name, depth=depth)


def q_nl2query_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NL lifecycle as a checkable query: fixed question through the
    rule-based translator, executed by Spark; the oracle runs the reference
    answer SQL directly."""
    _, df = answer(spark, sf_dir, "total revenue per nation in region 'ASIA'")
    return df


Q_NL2QUERY_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue
FROM region
JOIN nation   ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
JOIN orders   ON c_custkey = o_custkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""

QUERIES = {"nl2query_demo": q_nl2query_demo}
ORACLE = {"nl2query_demo": Q_NL2QUERY_SQL}
