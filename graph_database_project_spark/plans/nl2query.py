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


def _quote_literal(value: str) -> str:
    """SQL string literal with embedded quotes doubled — question-derived
    VALUES are escaped, question-derived IDENTIFIERS are validated against
    the catalog instead (never interpolated raw)."""
    return "'" + value.replace("'", "''") + "'"


def _check_identifiers(catalog: dict, table: str, cols: list[str]) -> None:
    """Reject question-derived identifiers the catalog doesn't know.
    An empty catalog (offline unit tests) skips validation."""
    if not catalog:
        return
    if table not in catalog:
        raise ValueError(f"unknown table derived from question: {table!r}")
    for c in cols:
        if c not in catalog[table]:
            raise ValueError(f"unknown column {c!r} for table {table!r}")


_RULES: list[tuple[re.Pattern, Callable[[re.Match, dict], str]]] = [
    (
        re.compile(r"how many (\w+) (?:are there )?per (\w+)", re.I),
        lambda m, cat: _count_per(m.group(1), m.group(2), cat),
    ),
    (
        re.compile(r"top (\d+) customers by (?:revenue|spend)", re.I),
        lambda m, cat: (
            "SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey, c_name "
            f"ORDER BY revenue DESC, c_custkey LIMIT {int(m.group(1))}"
        ),
    ),
    (
        re.compile(r"total revenue per nation in region '?([A-Z ]+?)'?\s*$", re.I),
        lambda m, cat: (
            "SELECT n_name, round(sum(o_totalprice), 2) AS revenue "
            "FROM region JOIN nation ON r_regionkey = n_regionkey "
            "JOIN customer ON n_nationkey = c_nationkey "
            "JOIN orders ON c_custkey = o_custkey "
            f"WHERE r_name = {_quote_literal(m.group(1).upper())} GROUP BY n_name"
        ),
    ),
    (
        re.compile(r"how many distinct (\w+) values in (\w+)", re.I),
        lambda m, cat: _count_distinct(m.group(1), m.group(2), cat),
    ),
    (
        re.compile(r"how many (\w+)(?: are there)?\s*$", re.I),
        lambda m, cat: _count_all(m.group(1), cat),
    ),
    # \b guards: 'min' must not fire inside 'admin'; \s*$ anchors: a
    # trailing qualifier ("… per user") must fall through to ValueError
    # (→ 422 / LLM escalation), never be silently dropped.
    (
        re.compile(r"\baverage (\w+) in (\w+)\s*$", re.I),
        lambda m, cat: _global_agg("avg", m.group(1), m.group(2), cat),
    ),
    (
        re.compile(r"\b(?:minimum|min) (\w+) in (\w+)\s*$", re.I),
        lambda m, cat: _global_agg("min", m.group(1), m.group(2), cat),
    ),
    (
        re.compile(r"\b(?:maximum|max) (\w+) in (\w+)\s*$", re.I),
        lambda m, cat: _global_agg("max", m.group(1), m.group(2), cat),
    ),
    (
        re.compile(r"\btotal (\w+) per (\w+) in (\w+)\s*$", re.I),
        lambda m, cat: _sum_per(m.group(1), m.group(2), m.group(3), cat),
    ),
    (
        re.compile(r"\bsearch documents for '([^']+)'\s*$", re.I),
        lambda m, cat: _bm25_search_sql(m.group(1)),
    ),
]


def _bm25_search_sql(phrase: str, top_n: int = 10) -> str:
    """Compile a search phrase to the Okapi BM25 ranking as ONE Spark SQL
    statement over the ``documents`` view — the same scoring the
    ``text_bm25_search`` operator computes with the DataFrame API
    (tests/test_nl2query.py proves the two forms rank identically).
    Terms are validated to word characters (identifier-grade hygiene:
    a term participates in lambda expressions, not just literals)."""
    from ..operators.textops import BM25_B, BM25_K1

    terms = [t for t in phrase.lower().split() if t]
    if not terms or any(not re.fullmatch(r"\w+", t) for t in terms):
        raise ValueError(f"unsupported search phrase: {phrase!r}")
    k1 = f"CAST({float(BM25_K1)!r} AS DOUBLE)"
    b = f"CAST({float(BM25_B)!r} AS DOUBLE)"
    tf_cols = ", ".join(
        f"size(filter(words, x -> x = {_quote_literal(t)})) AS tf_{i}"
        for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms)))
    contrib = " + ".join(
        f"ln(1 + (n_docs - df_{i} + CAST(0.5 AS DOUBLE)) / (df_{i} + CAST(0.5 AS DOUBLE)))"
        f" * (tf_{i} * ({k1} + 1.0))"
        f" / (tf_{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        for i in range(len(terms)))
    return (
        "WITH w AS (SELECT doc_id, filter(split(lower(text), ' '), x -> x != '') AS words FROM documents), "
        f"per AS (SELECT doc_id, size(words) AS dl, {tf_cols} FROM w), "
        f"stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_cols} FROM per), "
        f"scored AS (SELECT per.doc_id, {contrib} AS bm25_raw FROM per CROSS JOIN stats) "
        "SELECT doc_id, round(bm25_raw, 6) AS bm25 FROM scored WHERE bm25_raw > 0 "
        f"ORDER BY bm25_raw DESC, doc_id LIMIT {top_n}"
    )


def _count_distinct(col: str, table: str, catalog: dict) -> str:
    col, table = col.lower(), table.lower()
    _check_identifiers(catalog, table, [col])
    return f"SELECT count(DISTINCT {col}) AS n FROM {table}"


def _table_name(word: str, catalog: dict) -> str:
    """Ground a question word to a known table: as-is, deplural (-s, then
    -es), plural — in that order. Unknown words are rejected, not
    interpolated. Depluralization strips ONE suffix, not every trailing
    's' (rstrip('s') would turn 'address' into 'addre' and make s-final
    table names ungroundable)."""
    w = word.lower()
    known = set(catalog) if catalog else set(TABLE_NAMES)
    candidates = [w]
    if w.endswith("s"):
        candidates.append(w[:-1])
    if w.endswith("es"):
        candidates.append(w[:-2])
    candidates.append(w + "s")
    for cand in candidates:
        if cand in known:
            return cand
    raise ValueError(f"unknown table derived from question: {word!r}")


def _count_all(table: str, catalog: dict) -> str:
    return f"SELECT count(*) AS n FROM {_table_name(table, catalog)}"


# Exact type names, not prefixes — a prefix test on "int" would accept
# "interval day" and defeat the guard.
_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "long",
                  "float", "double"}


def _check_numeric(catalog: dict, table: str, cols: list[str]) -> None:
    """Reject numeric aggregation over non-numeric columns at translation
    time (ValueError → the caller's 422 path), instead of letting the
    generated SQL blow up at analysis (→ opaque 500). Skipped when the
    catalog carries no type info (offline list-shaped catalogs)."""
    info = catalog.get(table) if catalog else None
    if not isinstance(info, dict):
        return
    for c in cols:
        t = info.get(c, "")
        if t not in _NUMERIC_TYPES and not t.startswith("decimal("):
            raise ValueError(
                f"column {c!r} of {table!r} is {t or 'unknown'}, not numeric")


def _global_agg(fn: str, col: str, table: str, catalog: dict) -> str:
    col, t = col.lower(), _table_name(table, catalog)
    _check_identifiers(catalog, t, [col])
    _check_numeric(catalog, t, [col])
    return f"SELECT round({fn}({col}), 6) AS {fn}_{col} FROM {t}"


def _sum_per(col: str, dim: str, table: str, catalog: dict) -> str:
    col, dim, t = col.lower(), dim.lower(), _table_name(table, catalog)
    _check_identifiers(catalog, t, [col, dim])
    _check_numeric(catalog, t, [col])
    return (f"SELECT {dim}, round(sum({col}), 2) AS total_{col} "
            f"FROM {t} GROUP BY {dim}")

_PRIORITY_COLS = {
    "orders": {"priority": "o_orderpriority", "status": "o_orderstatus",
               "customer": "o_custkey"},
    "customers": {"nation": "c_nationkey", "segment": "c_mktsegment"},
    "events": {"type": "event_type", "user": "user_id"},
    "documents": {"language": "lang", "lang": "lang", "source": "source"},
}


def _count_per(entity: str, dim: str, catalog: dict) -> str:
    table = entity.lower() if entity.lower() in _PRIORITY_COLS else entity.lower() + "s"
    table = {"customers": "customer"}.get(table, table)
    key = entity.lower() if entity.lower() in _PRIORITY_COLS else table
    cols = _PRIORITY_COLS.get(entity.lower()) or _PRIORITY_COLS.get(key) or {}
    col = cols.get(dim.lower(), dim.lower())
    _check_identifiers(catalog, table, [col])
    return f"SELECT {col} AS {dim.lower()}, count(*) AS n FROM {table} GROUP BY {col}"


def rule_based_translate(question: str, catalog: dict) -> str:
    """Deterministic fallback translator. Raises ValueError on questions it
    cannot ground — the caller decides whether to escalate to an LLM.
    Question-derived identifiers are validated against ``catalog`` (tables →
    column lists); unmatched ones are rejected, not interpolated."""
    q = question.strip().rstrip("?")
    for pattern, build in _RULES:
        m = pattern.search(q)
        if m:
            return build(m, catalog)
    raise ValueError(f"no rule matches question: {question!r}")


# --- multi-turn chat context -------------------------------------------------
# The reference feeds the whole transcript into translation
# (first-graph.py:57-144; history collected in static/script.js:79-93). The
# rule-based analogue: a follow-up like "and for EUROPE?" rewrites the most
# recent *grounded* prior question by swapping its literal slot, then goes
# through the normal single-question translator — so follow-ups inherit every
# rule and validation for free.

_FOLLOWUP = re.compile(
    r"^(?:and|what about|how about|same(?: thing)?)\b(?:\s+for)?"
    r"\s+'?([\w.-]+(?: [\w.-]+){0,3})'?\s*$",
    re.I,
)
_LAST_LITERAL = re.compile(r"'[^']*'(?!.*'[^']*')|\b([A-Z]{2,}(?: [A-Z]+)*)\s*$")


def resolve_question(history: list[str]) -> str:
    """Collapse a chat transcript (user questions, oldest first) into one
    self-contained question. Non-follow-up questions pass through; a
    follow-up referent replaces the literal slot of the nearest prior
    question that has one."""
    if not history:
        raise ValueError("empty chat history")
    # The chat page prefixes a turn with "[image attached: name, N bytes]"
    # when the user attaches a file (chat_page.py image branch); the NL
    # question follows the marker — strip it from EVERY turn (not just the
    # last: the backward follow-up scan must see prior marker-prefixed
    # turns as the follow-ups/anchors they are, or a marker turn earlier
    # in the transcript derails anchoring for all later follow-ups).
    history = [re.sub(r"^\s*\[image attached:[^\]]*\]\s*", "", h)
               for h in history]
    cur = history[-1].strip().rstrip("?")
    # A question that already grounds on its own ("and how many orders are
    # there per status?") is not a follow-up, however it starts — the
    # referent capture is capped at 4 tokens for the same reason.
    if any(pattern.search(cur) for pattern, _ in _RULES):
        return cur
    m = _FOLLOWUP.match(cur)
    if not m:
        return cur
    referent = m.group(1)
    for prev in reversed(history[:-1]):
        prev_q = prev.strip().rstrip("?")
        if _FOLLOWUP.match(prev_q):
            continue  # don't anchor a follow-up on another follow-up
        lit = _LAST_LITERAL.search(prev_q)
        if lit:
            start, end = lit.span()
            return prev_q[:start] + f"'{referent}'" + prev_q[end:]
    raise ValueError(f"follow-up {history[-1]!r} has no grounded prior question")


def answer_chat(spark: SparkSession, sf_dir: str, history: list[str],
                translate: Translator = rule_based_translate,
                ) -> tuple[str, DataFrame]:
    """Multi-turn lifecycle: transcript → resolved question → catalog →
    translate → execute. ``history`` is the user-message list the reference
    posts on every turn."""
    return answer(spark, sf_dir, resolve_question(history), translate)


def derive_catalog(spark: SparkSession, sf_dir: str) -> dict:
    """information_schema-style catalog from the actual tables (replaces the
    reference's hand-maintained prompt block)."""
    register_views(spark, sf_dir)
    # col → simpleString type; membership checks (`c in catalog[t]`) see
    # the keys, so list-shaped catalogs in offline tests stay compatible
    return {
        t: {f.name: f.dataType.simpleString()
            for f in spark.table(t).schema.fields}
        for t in TABLE_NAMES
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

# pattern-shaped questions route through the declarative motif matcher —
# since r11 the rules emit MATCH *strings* compiled by graph/pattern.py,
# the same text interface the reference's GPT seam uses
# (first-graph.py:141 emits pattern text; :148-157 executes it)
_MOTIF_AFFECTED_RULE = re.compile(
    r"which airplanes (?:are )?affected by (?:bulletin\s+)?'?([\w.-]+)'?",
    re.I,
)
_MOTIF_SUBJECT_RULE = re.compile(
    r"(?:what is the )?subject of (?:bulletin\s+)?'?([\w.-]+)'?",
    re.I,
)
# r12b: aggregate-threshold questions emit a WITH pipeline (Cypher's
# aggregate -> HAVING shape) — the third query family the reference's
# GPT seam produces ("which X have at least N ...")
_MOTIF_THRESHOLD_RULE = re.compile(
    r"which (\w+) nodes have at least (\d+) outgoing links",
    re.I,
)
# r12b: distance questions emit shortestPath text (length(p) semantics)
_MOTIF_DISTANCE_RULE = re.compile(
    r"how far is (?:bulletin\s+)?'?([\w.-]+)'? from (?:its |the )?(\w+)",
    re.I,
)
# r13: grouped-list questions emit collect() text — the reference's
# flagship result shape (first-graph.py:168-176 groups connected-node
# names per matched node)
_MOTIF_COLLECT_RULE = re.compile(
    r"list the (\w+) nodes (?:of|under) each (\w+)",
    re.I,
)
# r13: disjunctive questions spanning two DIFFERENT pattern shapes emit
# UNION text (bare UNION — whole-result dedup)
_MOTIF_UNION_RULE = re.compile(
    r"which bulletins mention '?([\w ]+?)'? or include line '?([\w-]+)'?$",
    re.I,
)
# r14: numeric-threshold questions over string-typed properties emit
# toFloat() cast + float-literal WHERE text ("tasks over 2.5 hours" —
# the natural question for the corpus's task_hours, verdict r13 #4)
_MOTIF_NUMERIC_RULE = re.compile(
    r"which tasks (?:take|need) more than (\d+(?:\.\d+)?) "
    r"(?:task[- ])?hours",
    re.I,
)
# r14: "which X have any Y" questions emit a positive existential
# pattern predicate (left-semi; the dual of the NOT anti-join)
_MOTIF_EXISTS_RULE = re.compile(
    r"which (\w+?)s? have any (\w+?)s?$",
    re.I,
)
# r14b: numeric-rollup questions emit aggregates over cast value
# expressions ("total and average task hours per bulletin")
_MOTIF_NUMERIC_AGG_RULE = re.compile(
    r"total (?:and average )?task hours per bulletin",
    re.I,
)
# r15: conditional-count questions emit the sum(CASE WHEN … THEN 1
# ELSE 0 END) staple ("how many tasks take at least N hours per
# bulletin")
_MOTIF_COND_COUNT_RULE = re.compile(
    r"how many tasks (?:take|need) (at least|over|more than) (\d+) "
    r"(?:task[- ])?hours per bulletin",
    re.I,
)
# r15: labeling questions emit string-concatenation '+' RETURN items
# ("label each task with its hours")
_MOTIF_LABEL_RULE = re.compile(
    r"label each task with its (?:task[- ])?hours",
    re.I,
)


def _catalog_rel_signatures(spark: SparkSession, store) -> dict:
    """rel_type → its UNIQUE (src_label, dst_label) signature, from the
    store's own derived catalog (GraphStore.catalog_relationships —
    the first-graph.py:102-136 schema block, machine-derived). Types
    with more than one signature are omitted (injection must stay
    semantics-preserving). Session-memoized like the motif label stats
    (one catalog-sized collect per session)."""
    from ..io import session_memo

    def build():
        sigs: dict[str, set] = {}
        for r in store.catalog_relationships().collect():
            sigs.setdefault(r.rel_type, set()).add(
                (r.src_label, r.dst_label))
        return {t: next(iter(s)) for t, s in sigs.items() if len(s) == 1}

    return session_memo(spark, "_sg_nl2query_rel_sigs", "xml", build)


def answer_graph(spark: SparkSession, store, question: str) -> DataFrame:
    """The reference's flagship chat lifecycle (first-graph.py:141,168-176)
    against the graph store: NL question → plan → execute. Two rule
    families, mirroring the two query shapes the reference's GPT seam
    emits: pattern-shaped questions translate to a MATCH *string* —
    exactly what the reference's GPT returns — compiled by
    graph/pattern.parse_match into the motif plan; neighborhood
    questions compile to (seed, depth) k-hop expansion. Rule-based
    translation with the same pluggable-translator contract as
    ``answer``; an LLM translator would emit the same pattern text.

    r12 (verdict #8): every pattern compiles with the CATALOG attached —
    ``rel_signatures`` injects provable labels onto unlabeled variables
    and ``label_counts`` turns those labels into broadcast hints — so
    terse GPT-shaped pattern text gets the good plans by default
    (SCALE.md §7g: labels are the broadcast lever; 12 → 6 exchanges on
    the parsed key)."""
    from pyspark.sql import functions as F

    from ..graph.pattern import match_pattern
    from ..operators.motifq import _label_stats

    def compile_pattern(pattern: str) -> DataFrame:
        return match_pattern(
            store.nodes, store.edges, pattern,
            rel_signatures=_catalog_rel_signatures(spark, store),
            label_counts=_label_stats(spark),
            # the store contract: edges unique per (src,dst,rel_type) —
            # skips the per-hop dedup shuffle (r13)
            edges_deduped=True)

    q = question.strip().rstrip("?")
    m = _MOTIF_AFFECTED_RULE.search(q)
    if m:
        # terse GPT-shaped text: only the seed carries a predicate; the
        # catalog proves every other label (injected at compile time)
        pattern = (
            f"MATCH (sb {{docnbr: '{m.group(1)}'}})"
            "-[:HAS_PLANNING_INFORMATION]->(pi)"
            "-[:HAS_EFFECTIVITY]->(eff)"
            "-[:HAS_AIRPLANES]->(ap) "
            "RETURN sb.docnbr AS docnbr, ap.content AS airplanes")
        return compile_pattern(pattern)
    m = _MOTIF_SUBJECT_RULE.search(q)
    if m:
        pattern = (
            f"MATCH (sb {{docnbr: '{m.group(1)}'}})"
            "-[:HAS_HEADER]->(h)-[:HAS_SUBJECT]->(subj) "
            "RETURN sb.docnbr AS docnbr, subj.content AS subject")
        return compile_pattern(pattern)
    m = _MOTIF_DISTANCE_RULE.search(q)
    if m:
        # shortestPath text (r12b): BFS distance from the named bulletin
        # to every node of the asked label, via length(p)
        docnbr, label = m.group(1), m.group(2)
        # the ServiceBulletin label anchors the seed to the doc ROOT —
        # every node of a doc carries its docnbr, so the bare property
        # map alone would bind all of them
        pattern = (
            f"MATCH p = shortestPath((sb:ServiceBulletin "
            f"{{docnbr: '{docnbr}'}})-[*1..6]->(x:{label})) "
            "RETURN x.name AS name, length(p) AS hops "
            "ORDER BY hops, name LIMIT 20")
        return compile_pattern(pattern)
    m = _MOTIF_THRESHOLD_RULE.search(q)
    if m:
        # WITH pipeline (r12b): aggregate at the boundary, HAVING-filter
        # on the carried aggregate — the Cypher text GPT emits for
        # "which X have at least N ..." questions
        label, n = m.group(1), int(m.group(2))
        pattern = (
            f"MATCH (d:{label})-[]->(c) "
            f"WITH d, count(c) AS out_deg WHERE out_deg >= {n} "
            "RETURN d.docnbr AS docnbr, d.name AS name, out_deg "
            "ORDER BY docnbr, name")
        return compile_pattern(pattern)
    m = _MOTIF_COLLECT_RULE.search(q)
    if m:
        # collect() text (r13): group the connected nodes' names per
        # parent — the reference's own result-shaping idiom; the list
        # flattens to one sorted ';'-joined cell (scalar-output rule)
        child, parent = m.group(1), m.group(2)
        pattern = (
            f"MATCH (p:{parent})-[]->(c:{child}) "
            "RETURN p.docnbr AS docnbr, p.name AS parent, "
            "collect(c.name) AS children "
            "ORDER BY docnbr, parent")
        return compile_pattern(pattern)
    m = _MOTIF_UNION_RULE.search(q)
    if m:
        # UNION text (r13): two unrelated pattern shapes combined by
        # column name, whole-result dedup; terse branches — the catalog
        # injects h/subj/a labels (HAS_HEADER / HAS_SUBJECT /
        # included_in have unique signatures)
        term, line = m.group(1), m.group(2)
        pattern = (
            "MATCH (sb:ServiceBulletin)-[:HAS_HEADER]->(h)"
            "-[:HAS_SUBJECT]->(subj) "
            f"WHERE subj.content CONTAINS '{term}' "
            "RETURN sb.docnbr AS docnbr "
            "UNION "
            f"MATCH (ln {{name: '{line}'}})-[:included_in]->(a) "
            "RETURN a.docnbr AS docnbr")
        return compile_pattern(pattern)
    m = _MOTIF_NUMERIC_RULE.search(q)
    if m:
        # numeric text (r14): the corpus stores task_hours as STRINGS —
        # the emitted Cypher casts with toFloat() (try_cast: malformed
        # → NULL, never an ANSI error) and compares against the float
        # literal, all inside the motif's JVM-side filter
        pattern = (
            "MATCH (t:task)-[:HAS_NAME]->(nm), "
            "(t)-[:HAS_TASK_HOURS]->(th) "
            f"WHERE toFloat(th.content) > {float(m.group(1))!r} "
            "RETURN t.docnbr AS docnbr, nm.content AS task, "
            "th.content AS hours ORDER BY docnbr, task")
        return compile_pattern(pattern)
    m = _MOTIF_NUMERIC_AGG_RULE.search(q)
    if m:
        # numeric-rollup text (r14b): the casts live inside the
        # aggregate arguments (string-typed corpus properties)
        pattern = (
            "MATCH (t:task)-[:HAS_TASK_HOURS]->(th:task_hours) "
            "RETURN t.docnbr AS docnbr, count(*) AS n_tasks, "
            "sum(toInteger(th.content)) AS total_hours, "
            "avg(toFloat(th.content)) AS avg_hours ORDER BY docnbr")
        return compile_pattern(pattern)
    m = _MOTIF_COND_COUNT_RULE.search(q)
    if m:
        # conditional-count text (r15): the sum(CASE WHEN … THEN 1 ELSE
        # 0 END) staple over the cast hours — CASE reachable from
        # aggregate arguments since r15. 'at least N' is inclusive
        # (>=), 'over/more than N' strict (>) — the r15 review caught
        # the first draft compiling both to >= (a task of exactly N
        # hours silently counted for 'over N')
        op = ">=" if m.group(1).lower() == "at least" else ">"
        n = int(m.group(2))
        pattern = (
            "MATCH (t:task)-[:HAS_TASK_HOURS]->(th:task_hours) "
            "RETURN t.docnbr AS docnbr, "
            f"sum(CASE WHEN toInteger(th.content) {op} {n} THEN 1 "
            "ELSE 0 END) AS n_matching, count(*) AS n_tasks "
            "ORDER BY docnbr")
        return compile_pattern(pattern)
    m = _MOTIF_LABEL_RULE.search(q)
    if m:
        # concat text (r15): Cypher's string '+' shapes the label cell
        # ("name (40h)"); size() reports its length
        pattern = (
            "MATCH (t:task)-[:HAS_NAME]->(nm:name), "
            "(t)-[:HAS_TASK_HOURS]->(th:task_hours) "
            "RETURN t.docnbr AS docnbr, "
            "nm.content + ' (' + th.content + 'h)' AS label, "
            "size(nm.content) AS name_len ORDER BY docnbr, label")
        return compile_pattern(pattern)
    m = _MOTIF_EXISTS_RULE.search(q)
    if m:
        # existential text (r14): anchor the subject through its
        # IS_PART_OF up-link (every non-root node has one), then the
        # positive pattern predicate semi-filters — "which steps have
        # any number" keeps the numbered work-instruction steps and
        # never multiplies rows per number
        child, grand = m.group(1).lower(), m.group(2).lower()
        pattern = (
            f"MATCH (x:{child})-[:IS_PART_OF]->(par) "
            f"WHERE (x)-[:HAS_{grand.upper()}]->(:{grand}) "
            "RETURN x.docnbr AS docnbr, par.name AS parent, "
            "count(x) AS n ORDER BY docnbr, parent")
        return compile_pattern(pattern)
    m = _GRAPH_RULE.search(q)
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

def q_nl2query_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-turn chat lifecycle as a checkable query: the second user turn
    ("and for EUROPE?") resolves against the first question's literal slot,
    then runs through the normal translator — mirroring the reference's
    transcript-fed translation (first-graph.py:57-144)."""
    _, df = answer_chat(spark, sf_dir, [
        "total revenue per nation in region 'ASIA'",
        "and for EUROPE?",
    ])
    return df


Q_NL2QUERY_FOLLOWUP_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue
FROM region
JOIN nation   ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
JOIN orders   ON c_custkey = o_custkey
WHERE r_name = 'EUROPE'
GROUP BY n_name
"""

QUERIES = {
    "nl2query_demo": q_nl2query_demo,
    "nl2query_followup": q_nl2query_followup,
}
ORACLE = {
    "nl2query_demo": Q_NL2QUERY_SQL,
    "nl2query_followup": Q_NL2QUERY_FOLLOWUP_SQL,
}
