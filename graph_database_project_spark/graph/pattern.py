"""Textual MATCH-pattern front-end for the motif compiler — parses the
Cypher-shaped pattern strings the reference's NL path emits
(first-graph.py:141 lets GPT return arbitrary ``MATCH … RETURN …`` text
against the catalog; :148-157 executes it verbatim) into the
``NodePat``/``EdgePat`` spec ``graph/motif.py`` compiles to DataFrame
join plans. This closes the last expressivity gap: the engine accepts
pattern TEXT, not only Python objects.

Supported subset — exactly what the compiler supports, nothing more:

* node: ``(var)``, ``(var:Label)``, ``(:Label)``, ``()``, label
  disjunction ``(var:A|B)``, each with an optional property map
  ``{name: 'x', docnbr: 'y', key: 'v'}`` (string equality;
  ``name``/``docnbr`` map to their typed predicates, any other single
  key to the ``props`` map lookup);
* edge: ``-[:TYPE]->`` (out), ``<-[:TYPE]-`` (in), ``-[:TYPE]-``
  (both), untyped ``-[]->``, type disjunction ``-[:A|B]->``,
  variable-length ``-[:TYPE*1..3]->`` / ``-[*2]->`` / ``-[*..3]->``
  (reachability semantics, bounds required — an unbounded ``*`` is
  rejected with the k_hop pointer), and — r12 — edge variables
  ``-[r:TYPE]->`` / ``-[r]->``: ``r`` binds the edge's relationship
  type (the reference model's whole edge payload, SURVEY §1.1) as the
  carried field ``r.rel_type``, usable in WHERE and RETURN (bare
  ``RETURN r`` expands to it); an untyped ``-[r]->`` binds one row per
  distinct type connecting a pair (Cypher's per-relationship
  multiplicity). Not allowed on negated or variable-length edges;
* clauses: ``MATCH p1, p2``, additional ``MATCH`` / ``OPTIONAL MATCH``.
  A single-hop OPTIONAL MATCH is a left-outer edge; a MULTI-HOP
  ``OPTIONAL MATCH (a)-[:T]->(b)-[:U]->(c)`` (r13) compiles as ONE
  all-or-nothing unit — the chain's inner motif left-joins the bound
  anchor once, so a binding either matches the whole path or carries
  NULLs for every chain variable (Cypher's semantics; per-hop
  splitting is NOT equivalent). The chain must start at an
  already-bound variable and bind only fresh simple-path variables;
  separate OPTIONAL MATCH clauses keep their per-clause semantics;
* ``WHERE`` — bound to the PRECEDING clause, Cypher's rule (r13): a
  WHERE after a positive MATCH clause ANDs into the pattern filter
  (placement-equivalent for inner joins, so mid-query WHEREs are
  accepted), while a WHERE after an OPTIONAL MATCH clause is
  MATCH-TIME — it compiles into the left-join condition, so anchor
  rows failing it are PRESERVED with NULLs (the post-filter shape is
  ``WITH … WHERE``, which the language also has — filtering the
  joined result would wrongly drop the preserved rows). Terms: ``NOT (a)-[:T]->(b)`` negative patterns
  (the ``negated`` anti-join form; the right node may be anonymous with
  predicates — NOT-EXISTS-a-node-matching-P), comparisons
  ``a.field OP b.field`` / ``a.field OP 'literal'`` over the carried
  fields (id/name/content/docnbr) with OP in = <> != < <= > >=, and —
  r12b — Cypher's string/null/membership predicates ``a.field
  CONTAINS 'x'``, ``STARTS WITH 'x'``, ``ENDS WITH 'x'``,
  ``IS [NOT] NULL`` (the null forms are the post-filter idiom over
  OPTIONAL MATCH columns), and ``IN ['a', 'b']`` literal lists.
  Predicates compose with ``OR`` and parenthesized groups (r12b) at
  Cypher's precedence (AND binds tighter); value positions accept the
  ``toLower(…)`` / ``toUpper(…)`` case-folding wrappers (the idiom
  behind case-insensitive CONTAINS); value positions, RETURN/WITH items
  and aggregate arguments also accept Cypher's accessor functions
  ``id(n)`` / ``type(r)`` (r13 — mapped to the carried id / rel_type
  fields) and — in RETURN/WITH items and aggregate arguments only —
  ``labels(n)``, the node's label set flattened to one sorted
  ';'-joined cell (attached by an id-keyed join at the projection
  boundary; in WHERE use a ``(n:Label)`` predicate instead). ``lhs =~
  'regex'`` compiles to a FULL-string ``Column.rlike`` (Neo4j anchors
  the whole string). NOT patterns are the one
  non-composable form — they compile to anti-joins, so they may appear
  only as top-level AND-ed conjuncts (positioned reject elsewhere);
* ``RETURN [DISTINCT] a.field [AS alias], b, …`` — projected by
  ``match_pattern``; a bare variable expands to its carried columns;
* RETURN aggregates with Cypher's IMPLICIT GROUPING (r12):
  ``count(*)``, ``count([DISTINCT] var[.field])``, and
  ``min/max/sum/avg(var.field)`` — non-aggregate RETURN items become
  the grouping keys, exactly Cypher's semantics (``RETURN a.docnbr,
  count(DISTINCT ln.name)`` groups by docnbr). A pattern whose RETURN
  is all-aggregates produces the global 1-row aggregate. r13 adds
  ``collect([DISTINCT] var.field)`` — Cypher's list aggregate, the
  reference's flagship result shape (first-graph.py:168-176 groups
  connected-node names per match) — compiled to ``sort_array`` over
  ``collect_list``/``collect_set`` and flattened to ONE
  ';'-joined string cell (the driver canonicalizer forbids array
  outputs; sorting makes the cell deterministic). collect skips NULLs
  (Cypher's rule; an all-NULL group yields the empty string, Cypher's
  ``[]``);
* trailing result modifiers after RETURN (r12): ``ORDER BY item
  [ASC|DESC], …``, ``SKIP n``, ``LIMIT n`` — items are output columns
  (aliases, or var.field mapped through its alias); compiled to
  orderBy/offset/limit. Without RETURN they stay rejected (Cypher's
  own rule). LIMIT without a total ORDER BY is nondeterministic under
  ties, exactly as in Cypher — oracle-checked callers must order by a
  unique key;
* ``p = shortestPath((a)-[:T*1..k]->(b))`` (r12b) — DISTANCE
  semantics: the binding carries the minimum hop count per (a, b)
  pair, read back as ``length(p)`` in RETURN/WITH items, WHERE
  comparisons, and aggregate arguments (``min(length(p))``). The
  engine binds the distance, not a path object (the data model has no
  edge identity to enumerate one); single edge only, bounds required,
  not inside NOT/OPTIONAL, no edge variable inside;
* ``WITH`` pipeline stages (r12b) — Cypher's staged queries:
  ``MATCH … WITH [DISTINCT] items [ORDER BY …] [SKIP n] [LIMIT n]
  [WHERE …] [MATCH …] … RETURN …``. A WITH boundary projects (same
  item/aggregate grammar as RETURN, implicit grouping included), then
  applies its modifiers, then its trailing WHERE (the HAVING shape:
  ``WITH a, count(b) AS c WHERE c > 2``), evaluated in exactly that
  clause order. Cypher's scoping rule applies: only items carried
  through the WITH remain visible — a variable carried BARE (``WITH
  a``) stays a variable (its carried columns survive and later MATCH
  clauses may re-anchor on it, compiled as an id-equality join), an
  aliased field or aggregate becomes a plain COLUMN referenced by its
  alias (in later WHERE, RETURN, aggregates, and ORDER BY). A MATCH
  after WITH must mention at least one carried variable (else it would
  be a cartesian product — rejected at parse time). A query containing
  WITH must end with RETURN;
* numeric value expressions in WHERE (r14): float literals,
  ``toInteger(…)`` / ``toFloat(…)`` cast accessors (the corpus stores
  properties as STRINGS; compiled to ``try_cast`` so malformed values
  are NULL — Cypher's rule, never an ANSI cast error; r15:
  ``toInteger`` TRUNCATES numeric strings — ``toInteger('2.5')`` is 2,
  Neo4j's rule, via a double hop for non-numeric-kinded inputs), and
  ``+ - * /`` arithmetic at operator precedence (``* /`` bind tighter,
  left-associative). Integer-only positions (SKIP/LIMIT/hop bounds)
  reject float literals with positions. Value expressions also serve
  as RETURN/WITH items (``toFloat(th.content) * 2 AS x`` — alias
  required) and aggregate arguments (``sum(toInteger(th.content))``),
  and include ``coalesce(…)`` (first non-NULL — the OPTIONAL-column
  default idiom) and the toLower/toUpper wrappers;
* r15 value-expression widenings, each kind-checked at parse time
  ('num'/'str'/'any' static kinds — mismatches are positioned rejects,
  never unpositioned plan errors): PARENTHESIZED grouping ``(expr)``
  (the top probed GPT reject of r14); STRING literals as terms with
  ``+`` as CONCATENATION when either operand is a string (Cypher's
  rule; an 'any'-kinded carried column casts to string; a known
  string×number mix and any string under ``- * /`` are positioned
  rejects); ``size(value)`` = string length (Cypher's size(string));
  ``size(collect(…))`` rewritten to count semantics (count skips NULLs
  exactly as collect does, DISTINCT → countDistinct); searched CASE
  usable ANYWHERE a value is legal (WHERE positions, aggregate
  arguments — ``sum(CASE WHEN … THEN 1 ELSE 0 END)``, the
  conditional-aggregate staple — and nested in arithmetic); sum/avg
  over a statically string-kinded expression is a positioned reject
  (ADVICE r14 — was a runtime ANSI error); and ORDER BY accepts a
  value EXPRESSION over the boundary's OUTPUT columns (``ORDER BY
  toInteger(hours) DESC`` — unprojected var.field refs are positioned
  rejects; GPT aliases its items). ``allShortestPaths`` parses as the
  distance-semantics alias of shortestPath (equal-length ties collapse
  to one row per pair — the engine binds no path identity);
* r15 second wave: BOOLEAN ``NOT`` — Cypher's general negation
  (``WHERE NOT a.name = 'x'``, ``NOT (p OR q)``, under OR, stackable)
  compiled to ``~pred`` with three-valued NULL semantics, routed apart
  from the pattern-negation anti-join by lookahead (``NOT (a)-[:T]->
  (b)`` / ``NOT exists(…)`` keep their anti-join compile and top-level
  restriction); ``ORDER BY count(*) DESC`` — a bare aggregate in ORDER
  BY resolves STRUCTURALLY to the matching projected aggregate's alias
  (absent from the projection → positioned reject); ``toString(expr)``
  (cast to string, kind 'str' — makes number+string concat legal);
  the SIMPLE CASE form ``CASE subject WHEN v THEN r … END`` (compiled
  to searched CASE with subject-equality conditions; a variable
  literally named ``case`` is reserved in value positions); ``%``
  modulo at ``* /`` precedence (both engines follow the dividend's
  sign); and ``RETURN [DISTINCT] *`` — every named in-scope variable
  in declaration order (nodes → carried columns, edge variables →
  rel_type; anonymous/negation-only vars excluded; single-stage only,
  and path variables must be projected explicitly as length(p));
* positive existential pattern predicates in WHERE (r14): the bare
  Cypher form ``WHERE (a)-[:T]->(b)`` and ``exists((a)-[:T]->(b))``,
  plus ``NOT exists(…)`` — compiled to a left-SEMI join (the dual of
  the NOT anti-join): bindings are filtered, never multiplied. Same
  structural rules as NOT: single edge, bound anchor, top-level AND-ed
  conjuncts only, auxiliary nodes may carry label/property predicates
  and bind no output columns;
* ``collect(v)`` of a whole NODE variable (r14) collects the node
  itself, rendered as one deterministic ``id:name`` cell per node
  (the reference's collect-connected-node-records shape,
  first-graph.py:168-176); before r14 this silently collapsed to
  ``collect(v.id)``. ``collect(r)`` of an edge variable still collects
  ``rel_type`` — the data model's whole edge payload;
* searched ``CASE WHEN pred THEN value … [ELSE value] END AS alias``
  expressions in RETURN/WITH items (r14) — the GPT bucketing idiom,
  compiled to an ``F.when`` chain (no ELSE → NULL). Usable as
  implicit-grouping keys; the alias is required (the output column
  needs a deterministic name). Predicates are the full WHERE boolean
  grammar minus pattern predicates; values are string literals or
  numeric value expressions;
* ``UNION [ALL]`` between full MATCH queries (r13) — each branch is an
  independent query (its own variables, WITH environment and RETURN);
  branches combine by column name, and bare UNION de-duplicates the
  whole result (SQL/Cypher semantics). Cypher's rules are enforced at
  parse time: no mixing UNION with UNION ALL, every branch has an
  explicit RETURN with the SAME column-name set, and no per-branch
  ORDER BY / SKIP / LIMIT (apply them on the returned DataFrame).
  ``union`` and ``all`` are reserved words and no longer usable as
  variable names.

Rejected with explicit errors (parse-time, not plan-time): NOT
patterns under OR / inside groups / after a WITH boundary,
unbounded ``*`` (also inside shortestPath — bounds required),
unbound/bare shortestPath, any trailing clause
(ORDER BY/LIMIT belong to the DataFrame, not the pattern language),
RETURN/WHERE references to a negation-only auxiliary variable (it
binds no output columns), multi-hop OPTIONAL MATCH chains that do not
start at a bound variable or that re-bind / revisit a variable,
edge variables on negated or variable-length patterns, ``WITH *``
(list the carried items explicitly), new predicates on a carried
variable's re-mention (filter before carrying), NOT patterns in a
WITH's trailing WHERE or in a post-WITH stage without a positive
MATCH of its own, and references to anything NOT carried through the
last WITH (Cypher's own out-of-scope rule, surfaced as a positioned
error).

Re-mentioning a variable: a bare re-mention of a predicated variable
re-uses its binding (``(a:L)… (a)``); a PREDICATED re-mention of a
previously BARE variable refines it (``(a)… (a:L)`` — Cypher's
refinement, r12); two conflicting predicated mentions are rejected.

String literals use backslash escapes (``{name: 'it\\'s'}``) — they
are unescaped at parse time and re-escaped by ``render_match`` (r12).

Semantics note: matches are homomorphisms by default (see motif.py's
deviation note). ``match_pattern(..., edge_distinct=True)`` restores
Cypher's relationship-uniqueness, scoped PER MATCH CLAUSE exactly as
Cypher scopes it (edges in different MATCH / OPTIONAL MATCH clauses may
still bind the same stored edge — that is Cypher's behavior too).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame, functions as F

from .motif import (_CARRY, EdgePat, NodePat, edge_distinct_where,
                    match_motif)


def _unescape(inner: str) -> str:
    """Resolve backslash escapes inside a quoted literal (``\\'`` → ``'``,
    ``\\\\`` → ``\\``) — the tokenizer admits them, so the VALUE must not
    keep the backslashes (ADVICE r11)."""
    return re.sub(r"\\(.)", r"\1", inner)


def _escape(val: str) -> str:
    """The inverse for ``render_match``: make a value safe inside a
    single-quoted literal."""
    return val.replace("\\", "\\\\").replace("'", "\\'")

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<num>\d+\.\d+|\d+)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<punct><=|>=|<>|!=|=~|\.\.|<-|->|[()\[\]{}:,.\-<>=*|+/%])
    )""",
    re.VERBOSE,
)
# float literals (r14) require digits on BOTH sides of the dot, so the
# hop-range '1..3' still tokenizes as num('1') '..' num('3')


def _num_value(tok: str) -> int | float:
    """A numeric literal's Python value — float iff it has a dot (r14;
    DuckDB-parity note: emit float literals as CAST(x AS DOUBLE) in
    oracles — DuckDB parses bare decimals as DECIMAL)."""
    return float(tok) if "." in tok else int(tok)


def _int_tok(tok: str, pos: int, ctx: str) -> int:
    """An integer-only literal position (SKIP/LIMIT/hop bounds) — a
    float here is a positioned reject, not a ValueError crash."""
    if "." in tok:
        raise PatternSyntaxError(
            f"{ctx} takes an integer literal, got {tok!r} at "
            f"position {pos}")
    return int(tok)

def _kinded(thunk, kind: str):
    """Attach a static TYPE KIND to a value thunk — 'num' (numeric by
    construction: literals, toInteger/toFloat/size, arithmetic over
    nums), 'str' (string literals, corpus property fields,
    toLower/toUpper, concatenation results), or 'any' (carried WITH
    columns, mixed coalesce — type known only at plan time). The kind
    drives the r15 ``+`` rule (concat when either side is a string,
    Cypher's rule; positioned reject on string×number nonsense) and the
    sum()/avg() parse guard (ADVICE r14: ``sum(toLower(…))`` must be a
    positioned 422, not a runtime ANSI cast error on the seam)."""
    thunk.kind = kind
    return thunk


def _kind_of(thunk) -> str:
    return getattr(thunk, "kind", "any")


def _kind_join(kinds) -> str:
    """The static kind of a multi-branch value (CASE, coalesce):
    unanimous kind, else 'any'. num-vs-str conflicts are rejected at
    the call site (with position) before joining."""
    ks = set(kinds)
    return next(iter(ks)) if len(ks) == 1 else "any"


_COMPARE_OPS = {"=", "<>", "!=", "<", "<=", ">", ">="}
_KEYWORDS = {"MATCH", "OPTIONAL", "WHERE", "NOT", "AND", "OR", "RETURN",
             "DISTINCT", "AS", "ORDER", "BY", "SKIP", "LIMIT", "ASC",
             "DESC", "WITH", "UNION", "ALL"}
_AGG_FNS = {"count", "min", "max", "sum", "avg", "collect"}


class PatternSyntaxError(ValueError):
    """A MATCH string the parser rejects — message carries the position
    and what was expected, so the NL layer can surface it verbatim."""


def _tokenize(text: str) -> list[tuple[str, str, int]]:
    toks: list[tuple[str, str, int]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            if text[pos:].strip() == "":
                break
            raise PatternSyntaxError(
                f"unrecognized character {text[pos]!r} at position {pos}")
        pos = m.end()
        for kind in ("str", "num", "ident", "punct"):
            val = m.group(kind)
            if val is not None:
                if kind == "ident" and val.upper() in _KEYWORDS:
                    # keep the ORIGINAL spelling: at name positions
                    # (labels, rel-types, property keys) a keyword-shaped
                    # word is a legitimate identifier
                    toks.append(("kw", val, m.start()))
                else:
                    toks.append((kind, val, m.start()))
                break
    toks.append(("eof", "", len(text)))
    return toks


@dataclass
class WithStage:
    """One ``WITH`` boundary (r12b) plus the reading clauses that follow
    it. The boundary projects/aggregates the rows produced so far —
    ``items``/``aggregates`` use the same shapes as
    ``ParsedPattern.returns``/``aggregates``, with ``var=None`` marking
    a carried-COLUMN reference ``(None, colname, alias)`` — then applies
    its modifiers and its trailing WHERE (``post_where``: thunks over
    the boundary's output columns, evaluated after SKIP/LIMIT, the
    grammar's clause order). The follow-on MATCH clauses (possibly
    none) re-anchor on ``join_vars`` — carried bare variables whose
    ``<var>_id`` columns key the equi-join between the carried rows and
    the stage's independently-compiled motif."""

    items: list[tuple[str | None, str | None, str]]
    aggregates: list[tuple]
    distinct: bool
    order_by: list[tuple[str, bool]]
    skip: int | None
    limit: int | None
    post_where: list
    node_pats: list[NodePat]
    edge_pats: list[EdgePat]
    clauses: list[tuple[int, ...]]
    where_fn: list
    join_vars: tuple[str, ...]
    # match-time WHERE per OPTIONAL MATCH clause (r13): first edge
    # index -> predicate thunks
    optional_wheres: dict = field(default_factory=dict)


@dataclass
class ParsedPattern:
    """The compiled-from-text spec: feed node_pats/edge_pats/where to
    ``match_motif`` (``match_pattern`` does, then applies ``returns``).
    For a staged (WITH) query the flat pattern fields describe the
    FIRST stage and ``returns``/modifiers the final RETURN; the WITH
    boundaries and their follow-on patterns live in ``stages``."""

    node_pats: list[NodePat]
    edge_pats: list[EdgePat]
    where_fn: list  # list of Column-producing thunks, AND-ed
    returns: list[tuple[str, str | None, str]] | None  # (var, field, alias)
    distinct: bool = False
    # indices into edge_pats per MATCH / OPTIONAL MATCH clause, in order
    # (WHERE NOT edges belong to no clause) — the scoping edge_distinct
    # uses; defaults keep older call sites/tests equality-compatible
    clauses: list[tuple[int, ...]] = field(default_factory=list)
    edge_vars: tuple[str, ...] = ()
    # RETURN aggregates (r12): (fn, var, field, distinct, alias); var is
    # None for count(*). Non-empty => implicit grouping by `returns`.
    aggregates: list[tuple[str, str | None, str | None, bool, str]] = \
        field(default_factory=list)
    # trailing modifiers (r12): ORDER BY (output column, ascending)
    # pairs, SKIP and LIMIT — applied after projection/aggregation
    order_by: list[tuple[str, bool]] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None
    # WITH pipeline stages (r12b) — empty for single-stage patterns
    stages: list[WithStage] = field(default_factory=list)
    # UNION branches (r13): (all_flag, branch) per UNION [ALL] clause —
    # each branch is a full independent query; homogeneous all_flags
    # (Cypher forbids mixing UNION and UNION ALL) and identical RETURN
    # column sets are enforced at parse time
    unions: list[tuple[bool, "ParsedPattern"]] = field(default_factory=list)
    # match-time WHERE per OPTIONAL MATCH clause (r13): first edge
    # index -> predicate thunks (compiled into the left-join condition)
    optional_wheres: dict = field(default_factory=dict)

    def where_column(self) -> Column | None:
        if not self.where_fn:
            return None
        col = self.where_fn[0]()
        for th in self.where_fn[1:]:
            col = col & th()
        return col


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0
        # per-branch counters survive _reset_query_state (uniqueness is
        # cheap and keeps chain/anon ids distinct across UNION branches)
        self._anon = 0
        self._chain_seq = 0
        # when set (ORDER BY expressions, r15), _field_ref resolves
        # leaf references through this callable (OUTPUT columns of the
        # boundary) instead of the pattern-variable scope
        self._ref_override = None
        self._reset_query_state()

    def _reset_query_state(self) -> None:
        """Re-initialize all per-QUERY state — called between UNION
        branches (r13): each branch is a full independent query with its
        own variables, WITH environment, and RETURN."""
        self.nodes: dict[str, NodePat] = {}
        self.edges: list[EdgePat] = []
        self.anon_vars: set[str] = set()  # parser-generated node vars
        self.edge_vars: dict[str, int] = {}  # var -> declaration position
        # edge vars declared in the CURRENT stage (self.edge_vars stays
        # the whole-query collision space; out-of-scope vars must not
        # RESOLVE but may not be redeclared either)
        self.stage_edge_vars: set[str] = set()
        self.neg_only: set[str] = set()  # vars living only in NOT patterns
        self.clauses: list[tuple[int, ...]] = []
        self.where_fn: list = []
        # match-time WHERE on OPTIONAL MATCH clauses (r13): first edge
        # index of the clause -> predicate thunks (Cypher's binding)
        self.optional_wheres: dict[int, list] = {}
        # node vars whose labels(v) column must be post-joined (r13)
        self.labels_vars: set[str] = set()
        self.returns: list[tuple[str, str | None, str]] | None = None
        self.aggregates: list[tuple] = []  # (fn, var, fld, distinct, alias)
        self.order_by: list[tuple[str, bool]] = []
        self.skip: int | None = None
        self.limit: int | None = None
        self.distinct = False
        # WITH environment (r12b): what the last boundary carried
        self.stages: list[WithStage] = []
        self.carried_nodes: set[str] = set()  # vars carried bare
        self.carried_edges: set[str] = set()  # edge vars carried bare
        self.carried_cols: set[str] = set()   # ALL carried output columns
        # static kind per carried column (r15 review fix): what lets
        # `a + b` over two carried STRING columns concatenate (Cypher)
        # instead of compiling numeric addition into an unpositioned
        # AnalysisException
        self.carried_kinds: dict[str, str] = {}
        self.join_vars: list[str] = []  # carried vars re-anchored this stage
        # shortest-path variables (r12b): global collision space + the
        # ones in scope for the current stage
        self.path_vars: dict[str, int] = {}
        self.stage_path_vars: set[str] = set()

    # -- token helpers ----------------------------------------------------
    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i = min(self.i + 1, len(self.toks) - 1)
        return t

    def expect(self, kind: str, val: str | None = None) -> str:
        k, v, p = self.next()
        cmp = v.upper() if kind == "kw" else v
        if k != kind or (val is not None and cmp != val):
            want = val if val is not None else kind
            raise PatternSyntaxError(
                f"expected {want!r} at position {p}, got {v!r}")
        return v

    def at(self, kind: str, val: str | None = None) -> bool:
        k, v, _ = self.peek()
        cmp = v.upper() if kind == "kw" else v
        return k == kind and (val is None or cmp == val)

    def expect_name(self) -> str:
        """An identifier at a NAME position (label, rel-type, property
        key) — keyword-shaped words are legitimate there."""
        k, v, p = self.next()
        if k not in ("ident", "kw"):
            raise PatternSyntaxError(
                f"expected a name at position {p}, got {v!r}")
        return v

    # -- grammar ----------------------------------------------------------
    def parse(self) -> ParsedPattern:
        pp = self._parse_query()
        while self.at("kw", "UNION"):
            # UNION [ALL] between full MATCH queries (r13, verdict #5)
            self.next()
            all_flag = self.at("kw", "ALL")
            if all_flag:
                self.next()
            self._reset_query_state()
            pp.unions.append((all_flag, self._parse_query()))
        if pp.unions:
            self._validate_union(pp)
        k, v, p = self.peek()
        if k != "eof":
            raise PatternSyntaxError(
                f"unexpected {v!r} at position {p} (ORDER BY / SKIP / "
                "LIMIT are only valid after RETURN; other trailing "
                "clauses are not part of the pattern language — apply "
                "them on the returned DataFrame)")
        return pp

    def _validate_union(self, pp: ParsedPattern) -> None:
        """Cypher's UNION rules, parse-time: no mixing UNION with UNION
        ALL, every branch has an explicit RETURN producing the SAME
        column-name set, and no per-branch result modifiers (apply
        ordering/limits on the returned DataFrame — attaching them to
        one branch of a union is ambiguous, and Neo4j rejects it too)."""
        flags = {f for f, _ in pp.unions}
        if len(flags) > 1:
            raise PatternSyntaxError(
                "cannot mix UNION and UNION ALL in one query "
                "(Cypher's rule)")
        branches = [pp] + [b for _, b in pp.unions]
        cols0: set[str] | None = None
        for b in branches:
            if b.returns is None:
                raise PatternSyntaxError(
                    "every UNION branch needs an explicit RETURN with "
                    "the same column names")
            if b.order_by or b.skip is not None or b.limit is not None:
                raise PatternSyntaxError(
                    "ORDER BY / SKIP / LIMIT are not allowed inside "
                    "UNION branches — apply them on the returned "
                    "DataFrame")
            cols = self._output_columns(b.returns, b.aggregates)
            if cols0 is None:
                cols0 = cols
            elif cols != cols0:
                raise PatternSyntaxError(
                    "UNION branches must RETURN the same columns — got "
                    f"{sorted(cols0)} vs {sorted(cols)}")

    def _match_clauses(self) -> int | None:
        """The MATCH / OPTIONAL MATCH clause list, each clause with an
        optional trailing WHERE bound to ITS clause — Cypher's binding
        (r13): WHERE after a positive clause ANDs into the pattern
        filter (placement-equivalent for inner joins), WHERE after an
        OPTIONAL MATCH clause is MATCH-TIME (it joins the left-join
        condition, so anchor rows failing it are preserved NULL-filled
        — the post-filter shape is Cypher's ``WITH … WHERE``, which the
        language also has). Returns the position of the first clause
        keyword, or None when no clause was parsed."""
        first_pos = None
        while self.at("kw", "MATCH") or self.at("kw", "OPTIONAL"):
            _, _, mpos = self.peek()
            if first_pos is None:
                first_pos = mpos
            optional = self.at("kw", "OPTIONAL")
            if optional:
                self.next()
            self.expect("kw", "MATCH")
            start, npaths = self._clause_group(optional=optional)
            if self.at("kw", "WHERE"):
                _, _, wpos = self.next()
                if optional:
                    self._optional_where(start, npaths, wpos)
                else:
                    self._where_terms()
        return first_pos

    def _optional_where(self, first_edge_idx: int, n_paths: int,
                        wpos: int) -> None:
        """A WHERE bound to an OPTIONAL MATCH clause (r13): match-time
        predicate thunks, keyed by the clause's first edge index. NOT
        patterns are rejected (they compile to pattern-level anti-joins,
        not match-time predicates)."""
        if n_paths != 1:
            raise PatternSyntaxError(
                f"WHERE at position {wpos} on an OPTIONAL MATCH with "
                "multiple comma paths is not supported — each path "
                "left-joins separately; give each its own OPTIONAL "
                "MATCH clause")
        thunk, _ = self._bool_or(
            self._predicate, allow_negpat=False,
            neg_ctx="in an OPTIONAL MATCH's WHERE — it is a match-time "
                    "predicate; AND pattern negations in a WHERE bound "
                    "to a positive MATCH clause")
        if thunk is not None:
            self.optional_wheres.setdefault(first_edge_idx,
                                            []).append(thunk)

    def _parse_query(self) -> ParsedPattern:
        if not (self.at("kw", "MATCH") or self.at("kw", "OPTIONAL")):
            self.expect("kw", "MATCH")  # positioned error
        self._match_clauses()
        if not self.edges:
            raise PatternSyntaxError(
                "pattern has no edge — a single-node MATCH is a table "
                "scan, not a motif; use the store API directly")
        # stage 0 is complete: snapshot its pattern fields (the WITH loop
        # re-binds the containers per stage)
        s0_nodes = list(self.nodes.values())
        s0_edges = self.edges
        s0_where = self.where_fn
        s0_clauses = self.clauses
        s0_optw = self.optional_wheres
        while self.at("kw", "WITH"):
            self.next()
            self._with_stage()
        if self.stages and not self.at("kw", "RETURN"):
            k, v, p = self.peek()
            raise PatternSyntaxError(
                f"a WITH query must end with RETURN (got {v or 'end'!r} "
                f"at position {p})")
        if self.at("kw", "RETURN"):
            self.next()
            self._returns()
            self.order_by, self.skip, self.limit = \
                self._parse_modifiers(self.returns, self.aggregates)
        # trailing-token validation happens in parse() — the query may
        # legitimately stop at a UNION boundary here (r13)
        return ParsedPattern(s0_nodes, s0_edges,
                             s0_where, self.returns, self.distinct,
                             s0_clauses, tuple(self.edge_vars),
                             self.aggregates, self.order_by, self.skip,
                             self.limit, self.stages,
                             optional_wheres=s0_optw)

    def _with_stage(self) -> None:
        """One ``WITH`` boundary + its follow-on reading clauses (r12b).
        Grammar: ``WITH [DISTINCT] items [ORDER BY …] [SKIP n] [LIMIT n]
        [WHERE …]`` then optional ``MATCH``/``OPTIONAL MATCH`` clauses
        and an optional stage WHERE — closed by the next WITH, or by
        RETURN."""
        if self.at("punct", "*"):
            _, _, p = self.next()
            raise PatternSyntaxError(
                f"'WITH *' at position {p} is not supported — list the "
                "carried items explicitly")
        dist = False
        if self.at("kw", "DISTINCT"):
            self.next()
            dist = True
        items, aggs, _ = self._projection()
        order_by, skip, limit = self._parse_modifiers(items, aggs)
        outs = self._output_columns(items, aggs)
        post_where: list = []
        if self.at("kw", "WHERE"):
            self.next()
            post_where = self._post_where_terms(outs, items)
        # Cypher scoping: ONLY the carried items survive the boundary.
        # An edge variable stays a variable only while its column keeps
        # the canonical name (``WITH r`` / ``WITH r.rel_type``) — an
        # aliased carry (``WITH r AS u``) is a plain column downstream.
        self.carried_nodes = {var for var, fld, _ in items if fld is None}
        self.carried_edges = {var for var, fld, alias in items
                              if var is not None and fld == "rel_type"
                              and alias == f"{var}_rel_type"}
        # kinds computed BEFORE reassigning carried_kinds — carried-
        # column refs inside this boundary's items read the PREVIOUS
        # stage's kinds
        new_kinds = self._carried_kinds(items, aggs)
        self.carried_cols = set(outs)
        self.carried_kinds = new_kinds
        # follow-on reading clauses form the new stage's pattern
        self._begin_stage()
        stage_pos = self._match_clauses()
        if self.at("kw", "WHERE"):
            # a WHERE with no preceding stage MATCH (the clause-bound
            # WHEREs were consumed inside _match_clauses)
            _, _, wpos = self.next()
            if stage_pos is None:
                stage_pos = wpos
            self._where_terms()
        if not self.edges and stage_pos is not None:
            # an edge-less stage would be silently skipped at compile
            # time, discarding its node predicates / WHERE terms — the
            # stage-0 'pattern has no edge' guard, mirrored (ADVICE r12)
            raise PatternSyntaxError(
                f"the stage starting at position {stage_pos} has no "
                "edge — a single-node MATCH after WITH is a table scan, "
                "not a motif, and its predicates would be discarded; "
                "filter before the WITH boundary (or in its trailing "
                "WHERE) instead")
        # stage-shape guards (after the stage WHERE — its NOT patterns
        # append edges too): the stage motif compiles independently and
        # joins back on the re-anchored variables, so it needs positive
        # edges, at least one of them touching a carried variable, and
        # every negation anchored through them
        pos_vars = {v for ep in self.edges if not ep.negated
                    for v in (ep.src, ep.dst)}
        if self.edges and not pos_vars:
            raise PatternSyntaxError(
                "a WHERE NOT pattern after WITH needs a positive MATCH "
                "edge in the same stage to anchor on — apply the "
                "negation before the WITH boundary instead")
        if self.edges and not any(v in pos_vars for v in self.join_vars):
            raise PatternSyntaxError(
                "a MATCH after WITH must re-anchor on a variable carried "
                "bare through the WITH (else the stage is a cartesian "
                "product over unrelated rows)")
        for ep in self.edges:
            if ep.negated and ep.src not in pos_vars:
                raise PatternSyntaxError(
                    f"NOT pattern anchor {ep.src!r} must be bound by a "
                    "positive MATCH edge in the same stage (after WITH, "
                    "the negation runs inside the stage's own motif)")
        self.stages.append(WithStage(
            items, aggs, dist, order_by, skip, limit, post_where,
            list(self.nodes.values()), self.edges, self.clauses,
            self.where_fn, tuple(self.join_vars),
            self.optional_wheres))

    def _carried_kinds(self, items, aggs) -> dict[str, str]:
        """Static kind of every column a WITH boundary carries (r15
        review fix): plain field items inherit the field's kind (id/len
        numeric, corpus properties string), expression items the
        expression's computed kind, bare variables their per-field
        kinds, and aggregates count/sum/avg → numeric, collect → the
        flattened string, min/max → the argument's kind. Upgrading
        carried columns from 'any' to real kinds makes the '+' rule and
        the sum/avg/comparison guards correct ACROSS WITH boundaries —
        two carried strings concatenate instead of compiling numeric
        addition into an unpositioned AnalysisException."""
        kinds: dict[str, str] = {}

        def field_kind(var, fld):
            if var is None:            # a prior boundary's column
                return self.carried_kinds.get(fld, "any")
            if fld in ("id", "len"):
                return "num"
            return "str"

        for var, fld, alias in items or []:
            if var == "__expr__":
                kinds[alias] = _kind_of(fld)
            elif fld is None:
                for c in _CARRY:
                    kinds[f"{var}_{c}"] = "num" if c == "id" else "str"
            else:
                kinds[alias] = field_kind(var, fld)
        for fn, var, fld, _dist, alias in aggs:
            if fn in ("count", "sum", "avg"):
                kinds[alias] = "num"
            elif fn == "collect":
                kinds[alias] = "str"
            elif var == "__expr__":
                kinds[alias] = _kind_of(fld)
            else:                      # min/max over a field/column
                kinds[alias] = field_kind(var, fld)
        return kinds

    def _begin_stage(self) -> None:
        self.nodes = {}
        self.edges = []
        self.stage_edge_vars = set()
        self.stage_path_vars = set()
        self.neg_only = set()
        self.clauses = []
        self.where_fn = []
        self.optional_wheres = {}
        self.join_vars = []

    def _parse_modifiers(self, items, aggregates
                         ) -> tuple[list[tuple[str, bool]],
                                    int | None, int | None]:
        """Trailing ``ORDER BY item [ASC|DESC], … SKIP n LIMIT n`` (r12)
        — Cypher's result modifiers, valid after RETURN or a WITH
        projection. Items resolve to OUTPUT columns (an alias, or
        var.field which maps through its alias when the item was
        aliased). An item may also be a VALUE EXPRESSION over output
        columns (r15 — ``ORDER BY toInteger(hours) DESC``): the sort
        key is computed on the fly (entries then carry a Column thunk
        instead of a column name)."""
        outs = self._output_columns(items, aggregates)
        order_by: list[tuple[str, bool]] = []
        skip = limit = None
        if self.at("kw", "ORDER"):
            self.next()
            self.expect("kw", "BY")
            while True:
                ka, va, _ = self.peek()
                ka1, va1, _ = self.peek(1)
                if ((ka == "ident" and va.lower() in _AGG_FNS
                        and (ka1, va1) == ("punct", "("))
                        or self._size_collect_ahead()):
                    col = self._modifier_agg_ref(aggregates)
                elif self._expr_item_ahead():
                    col = self._modifier_expr(outs, items)
                else:
                    col = self._out_ref(outs, items, "ORDER BY")
                asc = True
                if self.at("kw", "ASC"):
                    self.next()
                elif self.at("kw", "DESC"):
                    self.next()
                    asc = False
                order_by.append((col, asc))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        if self.at("kw", "SKIP"):
            self.next()
            _, tok, pos = self.peek()
            skip = _int_tok(self.expect("num"), pos, "SKIP")
        if self.at("kw", "LIMIT"):
            self.next()
            _, tok, pos = self.peek()
            limit = _int_tok(self.expect("num"), pos, "LIMIT")
        return order_by, skip, limit

    def _modifier_agg_ref(self, aggregates) -> str:
        """``ORDER BY count(*) DESC`` (r15): GPT orders by the bare
        aggregate instead of its alias. The aggregate is re-parsed and
        matched STRUCTURALLY against the projection's aggregates —
        (fn, var, field, DISTINCT) equality — resolving to that
        aggregate's output alias; an aggregate absent from the
        projection is a positioned reject (the engine sorts the
        projected frame, it does not compute hidden aggregates).
        Expression-argument aggregates carry unmatchable thunks —
        alias those and ORDER BY the alias."""
        _, _, pos = self.peek()
        fn, var, fld, dist, _alias = self._agg_item()
        for rfn, rvar, rfld, rdist, ralias in aggregates:
            if (rfn == fn and rvar == var and rdist == dist
                    and not callable(rfld) and not callable(fld)
                    and rfld == fld):
                return ralias
        raise PatternSyntaxError(
            f"ORDER BY aggregate at position {pos} does not appear in "
            "the projection — add it as an aliased item and ORDER BY "
            "the alias")

    def _modifier_expr(self, outs: set[str], items):
        """An ORDER BY value expression (r15): the full ``_value_expr``
        grammar with leaf references resolved against the boundary's
        OUTPUT columns (``_ref_override`` — var.field maps through its
        alias exactly like a plain ORDER BY item; accessor functions
        and unprojected pattern variables are positioned rejects).
        Returns the kinded Column thunk; the caller stores it in the
        order_by entry in place of a column name."""

        def resolve():
            return None, self._out_ref(outs, items, "ORDER BY")

        self._ref_override = resolve
        try:
            return self._value_expr()
        finally:
            self._ref_override = None

    def _output_columns(self, items, aggregates) -> set[str]:
        cols: set[str] = set()
        for var, fld, alias in items or []:
            if fld is None:
                cols.update(f"{var}_{c}" for c in _CARRY)
            else:
                cols.add(alias)
        cols.update(item[-1] for item in aggregates)
        return cols

    def _out_ref(self, outs: set[str], items, ctx: str) -> str:
        """An OUTPUT-column reference (in ORDER BY, or a WITH's trailing
        WHERE): a bare alias, or var.field mapped through its alias."""
        k, v, p = self.next()
        if k != "ident":
            raise PatternSyntaxError(
                f"expected a column in {ctx} at position {p}, "
                f"got {v!r}")
        if self.at("punct", "."):
            self.next()
            fld = self.expect("ident")
            # an aliased projection item is referenced through its alias
            col = f"{v}_{fld}"
            for rvar, rfld, ralias in items or []:
                if rvar == v and rfld == fld:
                    col = ralias
                    break
        else:
            col = v
        if col not in outs:
            raise PatternSyntaxError(
                f"{ctx} references {col!r}, which is not an output "
                f"column (have: {', '.join(sorted(outs))})")
        return col

    def _post_where_terms(self, outs: set[str], items) -> list:
        """A WITH boundary's trailing WHERE (r12b): the same boolean
        grammar as the main WHERE (AND/OR/parens, string predicates)
        over the boundary's OUTPUT columns — the HAVING shape. Pattern
        predicates (NOT …) are parse-time rejected; they belong before
        the boundary."""

        def pred():
            lhs = self._out_ref(outs, items, "WHERE after WITH")
            sp = self._string_pred(lambda lhs=lhs: F.col(lhs))
            if sp is not None:
                return sp
            k, op, p = self.next()
            if k == "punct" and op == "=~":
                k2, v2, p2 = self.next()
                if k2 != "str":
                    raise PatternSyntaxError(
                        f"=~ needs a quoted regex literal at position "
                        f"{p2}, got {v2!r}")
                rx = "^(?:" + _unescape(v2[1:-1]) + ")$"
                return lambda lhs=lhs, rx=rx: F.col(lhs).rlike(rx)
            if k != "punct" or op not in _COMPARE_OPS:
                raise PatternSyntaxError(
                    f"expected comparison operator at position {p}, "
                    f"got {op!r}")
            if self.at("str"):
                lit = _unescape(self.next()[1][1:-1])
                rhs = lambda lit=lit: F.lit(lit)  # noqa: E731
            elif self.at("num"):
                litn = _num_value(self.next()[1])
                rhs = lambda litn=litn: F.lit(litn)  # noqa: E731
            else:
                rcol = self._out_ref(outs, items, "WHERE after WITH")
                rhs = lambda rcol=rcol: F.col(rcol)  # noqa: E731
            ops = {"=": lambda a, b: a == b,
                   "<>": lambda a, b: a != b, "!=": lambda a, b: a != b,
                   "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
                   ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}[op]
            return lambda lhs=lhs, ops=ops, rhs=rhs: ops(F.col(lhs), rhs())

        thunk, _ = self._bool_or(
            pred, allow_negpat=False,
            neg_ctx="in a WITH's trailing WHERE — apply pattern "
                    "predicates before the WITH boundary")
        return [thunk] if thunk is not None else []

    def _clause_group(self, optional: bool) -> tuple[int, int]:
        start = len(self.edges)
        n_paths = 1
        self._path(optional)
        while self.at("punct", ","):
            self.next()
            self._path(optional)
            n_paths += 1
        self.clauses.append(tuple(range(start, len(self.edges))))
        return start, n_paths

    def _fresh_var(self) -> str:
        while True:
            v = f"anon{self._anon}"
            self._anon += 1
            if v not in self.nodes:
                self.anon_vars.add(v)
                return v

    def _path(self, optional: bool, collect: list | None = None) -> None:
        k0, v0, _ = self.peek()
        k1, v1, _ = self.peek(1)
        k2, v2, _ = self.peek(2)
        if (k0 == "ident" and (k1, v1) == ("punct", "=")
                and k2 == "ident"
                and v2.lower() in ("shortestpath", "allshortestpaths")):
            self._shortest_path(optional, collect)
            return
        if k0 == "ident" \
                and v0.lower() in ("shortestpath", "allshortestpaths") \
                and (k1, v1) == ("punct", "("):
            raise PatternSyntaxError(
                "shortestPath must be bound to a path variable "
                "(p = shortestPath(...)) — its result is the distance, "
                "reachable as length(p)")
        # snapshot of the binding environment BEFORE this path — a
        # multi-hop OPTIONAL MATCH chain (r13) must anchor on a known
        # variable and bind only fresh ones
        known = set(self.nodes) | self.carried_nodes
        start_idx = len(self.edges)
        var = self._node()
        path_nodes = [var]
        n_hops = 0
        chain_pos = None
        while self.at("punct", "-") or self.at("punct", "<-"):
            _, _, hop_pos = self.peek()
            ep_kw = self._edge_spec()
            dst = self._node()
            ep = EdgePat(src=var, dst=dst, optional=optional, **ep_kw)
            n_hops += 1
            if n_hops == 2:
                chain_pos = hop_pos
            if collect is not None:
                collect.append(ep)
            else:
                self.edges.append(ep)
            var = dst
            path_nodes.append(dst)
        if optional and n_hops > 1 and collect is None:
            # multi-hop OPTIONAL MATCH (r13, verdict #4): the whole
            # chain is ONE all-or-nothing left-outer unit (Cypher's
            # semantics — per-hop splitting would keep partial bindings
            # Cypher discards). Validate the chain shape here with
            # positions, then stamp a shared chain_id for the compiler.
            if path_nodes[0] not in known:
                raise PatternSyntaxError(
                    f"multi-hop OPTIONAL MATCH at position {chain_pos} "
                    f"must start at an already-bound variable "
                    f"({path_nodes[0]!r} is new) — re-orient the path "
                    "to begin at the bound anchor")
            seen = {path_nodes[0]}
            for v in path_nodes[1:]:
                if v in known:
                    raise PatternSyntaxError(
                        f"multi-hop OPTIONAL MATCH at position "
                        f"{chain_pos}: chain variable {v!r} is already "
                        "bound — the all-or-nothing chain binds fresh "
                        "variables only; put the edge to a bound "
                        "variable in its own OPTIONAL MATCH clause")
                if v in seen:
                    raise PatternSyntaxError(
                        f"multi-hop OPTIONAL MATCH at position "
                        f"{chain_pos} revisits {v!r} — the chain must "
                        "be a simple path")
                seen.add(v)
            cid = self._chain_seq
            self._chain_seq += 1
            for idx in range(start_idx, len(self.edges)):
                self.edges[idx] = replace(self.edges[idx], chain_id=cid)

    def _shortest_path(self, optional: bool, collect: list | None) -> None:
        """``p = shortestPath((a)-[:T*1..k]->(b))`` (r12b) — distance
        semantics: the binding carries ``length(p)``, the minimum hop
        count connecting each (a, b) pair (see motif.EdgePat.path_var).
        Single edge only; not inside NOT or OPTIONAL MATCH.
        ``allShortestPaths`` (r15) is accepted as an alias: under
        distance semantics the two are identical per (a, b) pair —
        every pair keeps its min hop count; the one divergence from
        Neo4j is row MULTIPLICITY (Neo4j returns one row per tying
        path; the engine binds no path identity, so equal-length ties
        collapse to one row — document-level parity, not path-level)."""
        k, pvar, p = self.next()
        if not re.match(r"^[a-z][a-z0-9]*$", pvar):
            raise PatternSyntaxError(
                f"path variable {pvar!r} at position {p}: want "
                "[a-z][a-z0-9]* (the compiler's column-prefix contract)")
        if (pvar in self.nodes or pvar in self.edge_vars
                or pvar in self.path_vars or pvar in self.carried_nodes
                or pvar in self.carried_cols):
            raise PatternSyntaxError(
                f"path variable {pvar!r} at position {p} collides with "
                "an existing variable")
        if f"{pvar}_len" in self.carried_cols:
            raise PatternSyntaxError(
                f"path variable {pvar!r} at position {p}: its distance "
                f"column {pvar}_len collides with a column carried "
                "through WITH — the stage join would silently keep the "
                "carried copy; rename one of them")
        self.next()  # '='
        _, _, sp_pos = self.next()  # the shortestPath ident
        if optional:
            raise PatternSyntaxError(
                f"OPTIONAL MATCH shortestPath at position {sp_pos} is "
                "not supported — match the pair optionally and compute "
                "the distance in a separate MATCH")
        if collect is not None:
            raise PatternSyntaxError(
                f"shortestPath inside NOT at position {sp_pos} binds "
                "nothing — negate the pattern itself instead")
        self.expect("punct", "(")
        src = self._node()
        if not (self.at("punct", "-") or self.at("punct", "<-")):
            k2, v2, p2 = self.peek()
            raise PatternSyntaxError(
                f"expected an edge inside shortestPath at position {p2}, "
                f"got {v2!r}")
        ep_kw = self._edge_spec()
        dst = self._node()
        if self.at("punct", "-") or self.at("punct", "<-"):
            _, _, p2 = self.peek()
            raise PatternSyntaxError(
                f"shortestPath takes a single (variable-length) edge — "
                f"chain at position {p2} is not supported")
        self.expect("punct", ")")
        if ep_kw["var"] is not None:
            raise PatternSyntaxError(
                f"edge variable {ep_kw['var']!r} inside shortestPath is "
                "not supported — the binding carries length(p), not a "
                "relationship")
        del ep_kw["var"]
        self.path_vars[pvar] = p
        self.stage_path_vars.add(pvar)
        self.edges.append(EdgePat(src=src, dst=dst, optional=False,
                                  path_var=pvar, **ep_kw))

    def _maybe_length_ref(self) -> str | None:
        """If the cursor sits on ``length(p)`` with ``p`` an in-scope
        path variable, consume it and return ``p``; else None."""
        k0, v0, _ = self.peek()
        k1, v1, _ = self.peek(1)
        if not (k0 == "ident" and v0.lower() == "length"
                and (k1, v1) == ("punct", "(")):
            return None
        self.next()
        self.next()
        k, pvar, p = self.next()
        if k != "ident" or pvar not in self.stage_path_vars:
            have = ", ".join(sorted(self.stage_path_vars)) or "none"
            raise PatternSyntaxError(
                f"length() at position {p} takes an in-scope path "
                f"variable (have: {have})")
        self.expect("punct", ")")
        return pvar

    def _maybe_fn_ref(self, allow_labels: bool = False
                      ) -> tuple[str, str] | None:
        """Cypher's accessor functions (r13): ``id(n)`` → the node
        variable's id field, ``type(r)`` → the edge variable's
        rel_type, plus ``length(p)`` (delegated) — consumed and mapped
        to the same (var, field) shape as ``var.field``. With
        ``allow_labels`` (projection positions only), ``labels(n)`` →
        the node's label set as ONE sorted ';'-joined cell — the column
        is attached by a post-compile join on the variable's id (labels
        are not motif carry columns), so it exists only at RETURN/WITH
        boundaries, not in pattern-time WHERE (use a ``(n:Label)``
        predicate there)."""
        pv = self._maybe_length_ref()
        if pv is not None:
            return pv, "len"
        k0, v0, _ = self.peek()
        k1, v1, _ = self.peek(1)
        fn = v0.lower() if k0 == "ident" else None
        if fn not in ("id", "type", "labels") or (k1, v1) != ("punct", "("):
            return None
        self.next()
        _, _, fnpos = self.next()
        k, var, p = self.next()
        if k != "ident":
            raise PatternSyntaxError(
                f"{fn}() at position {p} takes a variable, got {var!r}")
        if fn == "type":
            if not self._is_edge_var(var):
                raise PatternSyntaxError(
                    f"type() at position {p} takes an in-scope edge "
                    f"variable ({var!r} is not one)")
            fld = "rel_type"
        else:
            if not self._is_node_var(var):
                raise PatternSyntaxError(
                    f"{fn}() at position {p} takes an in-scope node "
                    f"variable ({var!r} is not one)")
            if var in self.neg_only:
                raise PatternSyntaxError(
                    f"variable {var!r} exists only inside a NOT/exists() pattern "
                    "and binds no output columns")
            if fn == "labels":
                if not allow_labels:
                    raise PatternSyntaxError(
                        f"labels() at position {fnpos} is only valid in "
                        "RETURN/WITH items and aggregate arguments — in "
                        "WHERE, use a label predicate on the node "
                        "((n:Label))")
                if var in self.carried_nodes and self.stages:
                    # labels join after the stage compile; fine
                    pass
                self.labels_vars.add(var)
                fld = "labels"
            else:
                fld = "id"
        self.expect("punct", ")")
        return var, fld

    def _node(self) -> str:
        self.expect("punct", "(")
        var = None
        label = None
        name = None
        docnbr = None
        prop = None
        if self.at("ident"):
            var = self.next()[1]
        if self.at("punct", ":"):
            self.next()
            label = self._alt_idents()
        if self.at("punct", "{"):
            self.next()
            while True:
                key = self.expect_name()
                self.expect("punct", ":")
                k, v, p = self.next()
                if k != "str":
                    raise PatternSyntaxError(
                        f"property values must be quoted strings "
                        f"(position {p}, got {v!r})")
                val = _unescape(v[1:-1])
                if key == "name":
                    name = val
                elif key == "docnbr":
                    docnbr = val
                elif prop is None:
                    prop = (key, val)
                else:
                    raise PatternSyntaxError(
                        f"at most one non-name/docnbr property per node "
                        f"(position {p}) — the compiler's NodePat.prop "
                        "is a single map-equality")
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            self.expect("punct", "}")
        self.expect("punct", ")")
        if var is None:
            var = self._fresh_var()
        if not re.match(r"^[a-z][a-z0-9]*$", var):
            raise PatternSyntaxError(
                f"variable {var!r}: want [a-z][a-z0-9]* (the compiler's "
                "column-prefix contract)")
        if var in self.edge_vars:
            raise PatternSyntaxError(
                f"variable {var!r} is already an edge variable "
                f"(declared at position {self.edge_vars[var]})")
        if var in self.path_vars:
            raise PatternSyntaxError(
                f"variable {var!r} is already a path variable "
                f"(declared at position {self.path_vars[var]})")
        if var in self.carried_nodes:
            # re-mention of a variable carried bare through WITH (r12b):
            # it is already bound — a MATCH here re-anchors on it (the
            # compile joins on its id); new predicates are rejected
            # (filter BEFORE carrying, or compare in WHERE)
            if (label, name, docnbr, prop) != (None, None, None, None):
                raise PatternSyntaxError(
                    f"carried variable {var!r} cannot take new "
                    "predicates after WITH — filter before carrying it, "
                    "or use a WHERE comparison")
            if var not in self.nodes:
                self.nodes[var] = NodePat(var)
                self.join_vars.append(var)
            return var
        if var in self.carried_cols:
            raise PatternSyntaxError(
                f"variable {var!r} collides with a column carried "
                "through WITH — rename one of them")
        if self.carried_cols:
            # a NEW stage variable's derived carry columns must not
            # collide with carried columns either: the stage join keeps
            # the carried side's copy of every duplicate (it is
            # functionally dependent ONLY for re-anchored join
            # variables), so a collision here would silently return the
            # carried value instead of the motif's (ADVICE r12)
            clash = sorted(c for c in (f"{var}_{f}" for f in _CARRY)
                           if c in self.carried_cols)
            if clash:
                raise PatternSyntaxError(
                    f"variable {var!r}: its carry column(s) "
                    f"{', '.join(clash)} collide with column(s) carried "
                    "through WITH — the stage join would silently keep "
                    "the carried copy; rename the carried alias or the "
                    "variable")
        pat = NodePat(var, label=label, name=name, docnbr=docnbr, prop=prop)
        prev = self.nodes.get(var)
        if prev is not None:
            # re-mention of a bound variable: bare () re-use is fine; a
            # predicated re-mention of a previously-BARE variable refines
            # it (Cypher refinement, ADVICE r11); two different
            # predicated mentions conflict
            bare = NodePat(var)
            if prev == bare:
                self.nodes[var] = pat
            elif pat != bare and pat != prev:
                raise PatternSyntaxError(
                    f"variable {var!r} re-declared with different "
                    "predicates")
        else:
            self.nodes[var] = pat
        return var

    def _edge_spec(self) -> dict:
        """``-[:T*1..3]->`` / ``<-[:T]-`` / ``-[]-`` → EdgePat kwargs."""
        arrow_in = self.at("punct", "<-")
        self.next()  # '-' or '<-'
        rel_type = None
        var = None
        min_hops = max_hops = 1
        if self.at("punct", "["):
            self.next()
            if self.at("ident"):
                k, v, p = self.next()
                if not re.match(r"^[a-z][a-z0-9]*$", v):
                    raise PatternSyntaxError(
                        f"edge variable {v!r} at position {p}: want "
                        "[a-z][a-z0-9]* (the compiler's column-prefix "
                        "contract)")
                if (v in self.nodes or v in self.edge_vars
                        or v in self.path_vars
                        or v in self.carried_nodes
                        or v in self.carried_cols):
                    raise PatternSyntaxError(
                        f"edge variable {v!r} at position {p} collides "
                        "with an existing variable (each edge variable "
                        "binds one edge)")
                if f"{v}_rel_type" in self.carried_cols:
                    raise PatternSyntaxError(
                        f"edge variable {v!r} at position {p}: its "
                        f"carry column {v}_rel_type collides with a "
                        "column carried through WITH — the stage join "
                        "would silently keep the carried copy; rename "
                        "one of them")
                var = v
                self.edge_vars[v] = p
                self.stage_edge_vars.add(v)
            if self.at("punct", ":"):
                self.next()
                rel_type = self._alt_idents()
            if self.at("punct", "*"):
                _, _, p = self.next()
                if var is not None:
                    raise PatternSyntaxError(
                        f"edge variable {var!r} on a variable-length edge "
                        f"(position {p}) is not supported — a path binds "
                        "a LIST of relationships; use graph/traverse")
                min_hops, max_hops = self._hop_range()
            self.expect("punct", "]")
        # closing arrow
        if arrow_in:
            self.expect("punct", "-")
            direction = "in"
        elif self.at("punct", "->"):
            self.next()
            direction = "out"
        elif self.at("punct", "-"):
            self.next()
            direction = "both"
        else:
            k, v, p = self.peek()
            raise PatternSyntaxError(
                f"expected '->' or '-' after edge at position {p}, "
                f"got {v!r}")
        return dict(rel_type=rel_type, direction=direction,
                    min_hops=min_hops, max_hops=max_hops, var=var)

    def _alt_idents(self) -> str | tuple[str, ...]:
        """``A`` or the disjunction ``A|B|C`` (Cypher's label/rel-type
        alternation) — a plain string for one, a tuple for several."""
        names = [self.expect_name()]
        while self.at("punct", "|"):
            self.next()
            names.append(self.expect_name())
        return names[0] if len(names) == 1 else tuple(names)

    def _hop_range(self) -> tuple[int, int]:
        if self.at("num"):
            _, tok, pos = self.next()
            lo = _int_tok(tok, pos, "hop range")
            if self.at("punct", ".."):
                self.next()
                if self.at("num"):
                    _, tok2, pos2 = self.next()
                    return lo, _int_tok(tok2, pos2, "hop range")
                raise PatternSyntaxError(
                    "unbounded '*n..' hop range — the compiler caps at 8; "
                    "give an explicit upper bound or use "
                    "graph/traverse.k_hop")
            return lo, lo
        if self.at("punct", ".."):
            self.next()
            _, tok, pos = self.peek()
            return 1, _int_tok(self.expect("num"), pos, "hop range")
        raise PatternSyntaxError(
            "unbounded '*' reachability is not supported (reachability "
            "closure is graph/traverse.k_hop's frontier loop); give "
            "bounds like *1..3")

    # -- WHERE ------------------------------------------------------------
    def _where_terms(self) -> None:
        """The full WHERE boolean expression (r12b: OR + parenthesized
        groups, Cypher precedence — AND binds tighter). NOT patterns
        compile to anti-joins, not predicates, so they may appear only
        as TOP-LEVEL conjuncts (never under OR / inside parens) — the
        one structural restriction, rejected with position."""
        thunk, _ = self._bool_or(self._predicate, allow_negpat=True)
        if thunk is not None:
            self.where_fn.append(thunk)

    _NEG_CTX = ("under OR / inside a group — it compiles to an "
                "anti-join; AND it at the top level")

    def _bool_or(self, pred, allow_negpat: bool,
                 neg_ctx: str = _NEG_CTX):
        """``or := and (OR and)*`` — returns (thunk|None, saw_negpat);
        the thunk is None when every conjunct was a NOT pattern."""
        left, has_neg = self._bool_and(pred, allow_negpat, neg_ctx)
        while self.at("kw", "OR"):
            _, _, p = self.next()
            if has_neg or left is None:
                raise PatternSyntaxError(
                    f"OR at position {p}: a pattern predicate (NOT / "
                    "exists) compiles to an anti-/semi-join, not a "
                    "boolean predicate — it can only be AND-ed at the "
                    "top level")
            right, hn = self._bool_and(pred, False, neg_ctx)
            if hn or right is None:
                raise PatternSyntaxError(
                    f"OR at position {p}: a pattern predicate (NOT / "
                    "exists) compiles to an anti-/semi-join, not a "
                    "boolean predicate — it can only be AND-ed at the "
                    "top level")
            left = (lambda a=left, b=right: a() | b())  # noqa: E731
        return left, has_neg

    def _bool_and(self, pred, allow_negpat: bool, neg_ctx: str):
        """``and := unary (AND unary)*``; a unary is a NOT pattern or a
        positive existential pattern — ``exists((a)-[:T]->(b))`` or the
        bare Cypher form ``(a)-[:T]->(b)`` (r14) — (side-effects,
        top-level only: they compile to anti-/semi-joins), or a
        ``_bool_unary`` (boolean NOT / parenthesized sub-expression /
        one predicate — r15 splits general boolean NOT off from the
        pattern-negation anti-join via ``_not_is_pattern``)."""
        acc = None
        has_neg = False
        while True:
            k0, v0, _ = self.peek()
            k1, v1, _ = self.peek(1)
            if self.at("kw", "NOT") and self._not_is_pattern():
                if not allow_negpat:
                    _, _, p = self.peek()
                    raise PatternSyntaxError(
                        f"NOT pattern at position {p} is not allowed "
                        f"{neg_ctx}")
                self._not_pattern()
                has_neg = True
            elif (k0 == "ident" and v0.lower() == "exists"
                    and (k1, v1) == ("punct", "(")):
                if not allow_negpat:
                    _, _, p = self.peek()
                    raise PatternSyntaxError(
                        f"exists() pattern at position {p} is not "
                        f"allowed {neg_ctx}")
                self._exists_pattern()
                has_neg = True
            elif self.at("punct", "(") and (
                    self._looks_like_pattern()
                    or ((k1, v1) == ("punct", "(")
                        and self._looks_like_pattern(at=1))):
                # Cypher's bare pattern predicate (r14) — positive
                # existential, the dual of NOT (a)-[:T]->(b); r15 sees
                # through one redundant wrapper paren
                if not allow_negpat:
                    _, _, p = self.peek()
                    raise PatternSyntaxError(
                        f"pattern predicate at position {p} is not "
                        f"allowed {neg_ctx}")
                self._exists_pattern()
                has_neg = True
            else:
                t = self._bool_unary(pred, neg_ctx)
                acc = (t if acc is None
                       else (lambda a=acc, b=t: a() & b()))  # noqa: E731
            if self.at("kw", "AND"):
                self.next()
                continue
            break
        return acc, has_neg

    def _not_is_pattern(self) -> bool:
        """Cursor on NOT: does it negate a PATTERN — ``NOT
        (a)-[:T]->(b)`` / ``NOT exists(…)``, the anti-join forms —
        rather than a boolean sub-expression (r15)? Pure lookahead:
        exists() and a node-pattern-shaped ``(`` are patterns;
        everything else is Cypher's plain boolean NOT."""
        k1, v1, _ = self.peek(1)
        k2, v2, _ = self.peek(2)
        if (k1 == "ident" and v1.lower() == "exists"
                and (k2, v2) == ("punct", "(")):
            return True
        # shortestPath forms route to the pattern path for its pointed
        # "binds nothing inside NOT" reject (bare or p =-bound)
        if k1 == "ident" and v1.lower() in ("shortestpath",
                                            "allshortestpaths"):
            return True
        if k1 == "ident" and (k2, v2) == ("punct", "="):
            k3, v3, _ = self.peek(3)
            if (k3 == "ident" and v3.lower() in ("shortestpath",
                                                 "allshortestpaths")):
                return True
        if (k1, v1) != ("punct", "("):
            return False
        # see through ONE redundant wrapper paren (r15 review fix:
        # GPT/Neo4j-legal ``NOT ((a)-[:T]->(b))`` must stay an
        # anti-join, not a boolean NOT over a rejected group)
        return (self._looks_like_pattern(at=1)
                or ((k2, v2) == ("punct", "(")
                    and self._looks_like_pattern(at=2)))

    def _bool_unary(self, pred, neg_ctx: str):
        """One boolean unary: ``[NOT]* (group | predicate)``. Boolean
        NOT (r15) is Cypher's general negation — ``WHERE NOT a.name =
        'x'``, ``NOT (p OR q)``, ``NOT x CONTAINS 'y'`` — compiled to
        ``~pred`` (NULL-safe: ~NULL is NULL and the row drops, Cypher's
        three-valued rule); the pattern-negation anti-join is routed
        earlier by ``_not_is_pattern``. A parenthesized group that
        closes into a VALUE position falls through to the predicate
        (``(toInteger(x.f) + 1) * 2 > 50`` — ``_value_term`` owns that
        '(')."""
        if self.at("kw", "NOT"):
            self.next()
            inner = self._bool_unary(pred, neg_ctx)
            return lambda inner=inner: ~inner()
        if (self.at("punct", "(") and not self._looks_like_pattern()
                and not self._paren_opens_value()):
            self.next()
            sub, _ = self._bool_or(pred, False, neg_ctx)
            self.expect("punct", ")")
            return sub
        return pred()

    def _paren_opens_value(self) -> bool:
        """Cursor on a non-pattern ``(`` inside WHERE: does the group
        close into a VALUE position — its matching ``)`` followed by an
        arithmetic/comparison operator or a string-predicate word —
        rather than a boolean group (followed by AND/OR/clause
        keyword/EOF)? Pure matching-paren lookahead (r15): grouped
        value expressions (``WHERE (toInteger(x.f) + 1) * 2 > 50``) and
        grouped boolean sub-expressions are both legal, and the
        distinction is decidable only at the matching ``)``. Known
        residual ambiguity (Cypher shares it): ``(carriedcol) - 1`` is
        shadowed by the pattern-connector lookahead — don't parenthesize
        a bare column before a minus."""
        depth = 0
        j = self.i
        while j < len(self.toks) - 1:
            k, v, _ = self.toks[j]
            if k == "punct" and v == "(":
                depth += 1
            elif k == "punct" and v == ")":
                depth -= 1
                if depth == 0:
                    k2, v2, _ = self.toks[j + 1]
                    if k2 == "punct":
                        return (v2 in self._ARITH_PUNCTS
                                or v2 in _COMPARE_OPS or v2 == "=~")
                    return (k2 == "ident" and v2.upper() in
                            ("CONTAINS", "STARTS", "ENDS", "IS", "IN"))
            j += 1
        return False

    def _looks_like_pattern(self, at: int = 0) -> bool:
        """Cursor (or the token ``at`` positions ahead, r15 — the NOT
        lookahead) on ``(`` inside WHERE: does it open a NODE PATTERN
        (``(a)-…``, ``(a:L)…``, ``(:L)…``, ``({k: 'v'})…``, ``()-…``)
        rather than a parenthesized boolean group? Pure lookahead —
        nothing is consumed. The two grammars are disjoint: a boolean
        group's first token after ``(`` is a value/predicate start
        (ident followed by ``.``/operator, a function call, a literal,
        or a nested ``(``), while a node pattern's is a variable
        followed by ``)``/``:``/``{``, an anonymous ``:label``/``{…}``,
        or ``()`` — with the ``)`` case disambiguated by the connector
        (``-`` / ``<-``) that must follow."""
        k1, v1, _ = self.peek(at + 1)
        if (k1, v1) == ("punct", ":") or (k1, v1) == ("punct", "{"):
            return True          # (:Label…  /  ({k: 'v'}…
        if (k1, v1) == ("punct", ")"):
            k2, v2, _ = self.peek(at + 2)
            return k2 == "punct" and v2 in ("-", "<-")   # ()-[…
        if k1 not in ("ident", "kw"):
            return False
        k2, v2, _ = self.peek(at + 2)
        if (k2, v2) in (("punct", ":"), ("punct", "{")):
            return True          # (a:Label…  /  (a {…
        if (k2, v2) == ("punct", ")"):
            k3, v3, _ = self.peek(at + 3)
            return k3 == "punct" and v3 in ("-", "<-")   # (a)-[…
        return False

    def _exists_pattern(self) -> None:
        """``exists((a)-[:T]->(b))`` or the bare pattern-predicate form
        ``WHERE (a)-[:T]->(b)`` (r14) — the POSITIVE existential dual
        of ``NOT (a)-[:T]->(b)``, compiled to a left-SEMI join (filters
        bindings without multiplying them — a positive MATCH edge with
        a fresh variable would add one row per matching edge instead).
        Same structural rules as NOT: single edge, anchored on a bound
        variable, no edge variable, the other endpoint either bound or
        an auxiliary (optionally predicated: EXISTS-a-node-matching-P)
        that binds no output columns."""
        _, _, ex_pos = self.peek()
        wrapped = False
        if self.at("ident"):          # the exists( form
            self.next()
            self.expect("punct", "(")
            wrapped = True
        elif self.at("punct", "(") and not self._looks_like_pattern():
            # one redundant wrapper paren around the bare pattern
            # predicate (r15 review fix — GPT parenthesizes freely)
            self.next()
            wrapped = True
        known = set(self.nodes)
        exs: list[EdgePat] = []
        self._path(optional=False, collect=exs)
        if wrapped:
            self.expect("punct", ")")
        if len(exs) != 1:
            raise PatternSyntaxError(
                "an existential pattern takes a single edge (chain "
                "existence is not supported — test the final hop, or "
                "MATCH the chain positively and use DISTINCT)")
        ep = exs[0]
        if ep.var is not None:
            raise PatternSyntaxError(
                f"edge variable {ep.var!r} on an existential pattern "
                "binds nothing (exists() asserts pure existence)")
        if ep.min_hops != 1 or ep.max_hops != 1:
            raise PatternSyntaxError(
                "existential patterns are single-hop — MATCH a "
                "variable-length edge positively and use DISTINCT")
        new_vars = set(self.nodes) - known
        if ep.src in new_vars or ep.src in self.neg_only:
            raise PatternSyntaxError(
                f"existential pattern at position {ex_pos} must anchor "
                f"on an already-bound variable ({ep.src!r} exists only "
                "inside a NOT/exists() pattern and binds nothing)")
        if ep.dst in self.neg_only and ep.dst not in new_vars:
            raise PatternSyntaxError(
                f"existential pattern at position {ex_pos} references "
                f"{ep.dst!r}, which exists only inside another "
                "NOT/exists() pattern and binds nothing")
        self.neg_only |= new_vars
        self.edges.append(replace(ep, existential=True))

    def _not_pattern(self) -> None:
        """``NOT (a)-[:T]->(b)`` — the anti-join pattern negation
        (side-effect: appends a negated EdgePat). ``NOT exists(…)``
        (r14) is the same negation through Cypher's explicit
        existential wrapper."""
        _, _, not_pos = self.next()
        k0, v0, _ = self.peek()
        k1, v1, _ = self.peek(1)
        wrapped = (k0 == "ident" and v0.lower() == "exists"
                   and (k1, v1) == ("punct", "("))
        if wrapped:
            self.next()
            self.expect("punct", "(")
        elif self.at("punct", "(") and not self._looks_like_pattern():
            # one redundant wrapper paren: NOT ((a)-[:T]->(b)) — the
            # r15 review's misleading-reject finding
            self.next()
            wrapped = True
        known = set(self.nodes)
        negs: list[EdgePat] = []
        self._path(optional=False, collect=negs)
        if wrapped:
            self.expect("punct", ")")
        if len(negs) != 1:
            raise PatternSyntaxError(
                "NOT takes a single-edge pattern (chain negation "
                "is not supported — negate the final hop)")
        ep = negs[0]
        if ep.var is not None:
            raise PatternSyntaxError(
                f"edge variable {ep.var!r} on a negated pattern "
                "binds nothing (NOT asserts non-existence)")
        new_vars = set(self.nodes) - known
        if ep.src in new_vars or ep.src in self.neg_only:
            raise PatternSyntaxError(
                f"NOT pattern at position {not_pos} must anchor on "
                f"an already-bound variable ({ep.src!r} exists only "
                "inside a NOT/exists() pattern and binds nothing)")
        if ep.dst in self.neg_only and ep.dst not in new_vars:
            raise PatternSyntaxError(
                f"NOT pattern at position {not_pos} references "
                f"{ep.dst!r}, which exists only inside another "
                "NOT/exists() pattern and binds nothing")
        # a variable introduced ONLY inside the NOT binds no output
        # columns — RETURN/WHERE references to it are rejected at
        # parse time (ADVICE r11), preserving the positioned-422
        # contract on POST /pattern
        self.neg_only |= new_vars
        self.edges.append(EdgePat(
            src=ep.src, dst=ep.dst, rel_type=ep.rel_type,
            direction=ep.direction, min_hops=ep.min_hops,
            max_hops=ep.max_hops, negated=True))

    def _value_ref(self):
        """A WHERE value position: ``var.field`` / carried column /
        ``length(p)``, optionally wrapped in ``toLower(…)`` /
        ``toUpper(…)`` (r12b — the case-folding every GPT-emitted
        CONTAINS uses). Returns a kinded Column thunk (see ``_kinded``):
        ``id``/``len`` fields are numeric, corpus property fields are
        strings, carried columns are 'any' (their type is whatever the
        WITH stage computed)."""
        k, v, _ = self.peek()
        k1, v1, _ = self.peek(1)
        if (k == "ident" and v.lower() in ("tolower", "toupper")
                and (k1, v1) == ("punct", "(")):
            fn = "lower" if v.lower() == "tolower" else "upper"
            self.next()
            self.next()
            var, fld = self._field_ref()
            self.expect("punct", ")")
            col = fld if var is None else f"{var}_{fld}"
            return _kinded(lambda: getattr(F, fn)(F.col(col)), "str")
        var, fld = self._field_ref()
        col = fld if var is None else f"{var}_{fld}"
        if var is None:
            # a carried WITH column: its boundary-computed kind (r15
            # review fix; 'any' only when genuinely underivable)
            kind = self.carried_kinds.get(fld, "any")
        else:
            kind = "num" if fld in ("id", "len") else "str"
        return _kinded(lambda: F.col(col), kind)

    def _value_term(self):
        """One term of a value expression (r14, widened r15): a numeric
        literal (int or float, optional unary minus), a STRING literal
        (r15 — concatenation operand), a PARENTHESIZED sub-expression
        (r15 — GPT parenthesizes arithmetic freely), a searched CASE
        (r15 — usable anywhere a value is, not just as a RETURN item),
        a ``toInteger(…)`` / ``toFloat(…)`` cast (the corpus stores
        properties as STRINGS — compiled to try_cast, so a malformed
        value is NULL, Cypher's own rule, never an ANSI cast error),
        ``size(…)`` over a string value (r15 — Cypher's size(string) is
        its length; the list form lives in the aggregate rewrite
        ``size(collect(…))``), ``coalesce(…)``, or a ``_value_ref``
        (field / carried column / toLower/toUpper wrapper)."""
        k, v, pos = self.peek()
        k1, v1, _ = self.peek(1)
        if (k, v) == ("punct", "("):
            self.next()
            inner = self._value_expr()
            self.expect("punct", ")")
            return inner
        if k == "num":
            lit = _num_value(self.next()[1])
            return _kinded(lambda: F.lit(lit), "num")
        if (k, v) == ("punct", "-") and k1 == "num":
            self.next()
            lit = -_num_value(self.next()[1])
            return _kinded(lambda: F.lit(lit), "num")
        if k == "str":
            lit = _unescape(self.next()[1][1:-1])
            return _kinded(lambda: F.lit(lit), "str")
        if (k == "ident" and v.upper() == "CASE"
                and (k1, v1) != ("punct", ".")):
            # searched (CASE WHEN …) or simple (CASE subject WHEN …)
            # form — the one thing CASE cannot be here is a variable
            # named 'case' with a field access (Cypher reserves CASE;
            # the engine reserves it only in value positions)
            return self._case_expr()
        if (k == "ident" and v.lower() in ("tointeger", "tofloat")
                and (k1, v1) == ("punct", "(")):
            to_int = v.lower() == "tointeger"
            self.next()
            self.next()
            inner = self._value_expr()
            self.expect("punct", ")")
            if not to_int:
                return _kinded(lambda: inner().try_cast("double"), "num")
            if _kind_of(inner) == "num":
                # already numeric: direct try_cast — a bigint must NOT
                # round-trip through a double (precision loss past 2^53)
                return _kinded(lambda: inner().try_cast("bigint"), "num")
            # Neo4j's toInteger TRUNCATES numeric strings ('2.5' → 2;
            # ADVICE r14 — plain try_cast to BIGINT yielded NULL).
            # Integer-FORMATTED values take the exact direct cast (r15
            # review fix: an unconditional double hop silently rounded
            # '9007199254740993' and carried BIGINTs past 2^53); only
            # decimal/scientific forms hop through DOUBLE, truncating
            # toward zero. All casts are try_cast (malformed → NULL,
            # NaN/overflow → NULL, never an ANSI error). DuckDB oracle
            # mirror: CASE WHEN regexp_matches(s, '^\s*-?\d+\s*$') THEN
            # TRY_CAST(s AS BIGINT) ELSE TRY_CAST(trunc(TRY_CAST(s AS
            # DOUBLE)) AS BIGINT) END — DuckDB's bare double→bigint
            # cast ROUNDS, so trunc() is mandatory on the decimal arm.

            def to_int_col(inner=inner):
                s = inner().cast("string")
                return (F.when(s.rlike(r"^\s*-?\d+\s*$"),
                               s.try_cast("bigint"))
                        .otherwise(s.try_cast("double")
                                    .try_cast("bigint")))

            return _kinded(to_int_col, "num")
        if (k == "ident" and v.lower() == "tostring"
                and (k1, v1) == ("punct", "(")):
            # Cypher's toString (r15) — the explicit cast that makes
            # number-to-string concatenation legal under the kind rules
            # ('n=' + toString(count)). DuckDB oracle mirror:
            # CAST(x AS VARCHAR) — integer renderings agree; avoid
            # DOUBLE inputs in oracle-checked outputs (float formatting
            # differs between engines).
            self.next()
            self.next()
            inner = self._value_expr()
            self.expect("punct", ")")
            return _kinded(lambda: inner().cast("string"), "str")
        if (k == "ident" and v.lower() == "size"
                and (k1, v1) == ("punct", "(")):
            self.next()
            self.next()
            inner = self._value_expr()
            self.expect("punct", ")")
            if _kind_of(inner) == "num":
                raise PatternSyntaxError(
                    f"size() at position {pos} takes a string value "
                    "(Cypher's size(string) = length; the list form is "
                    "the aggregate rewrite size(collect(…)))")
            return _kinded(lambda: F.length(inner()).cast("bigint"),
                           "num")
        if (k == "ident" and v.lower() == "coalesce"
                and (k1, v1) == ("punct", "(")):
            # Cypher's coalesce (r14b): first non-NULL of its arguments
            # — the idiom GPT emits over OPTIONAL MATCH columns. Args
            # are value expressions or string literals.
            self.next()
            self.next()
            args = [self._case_value()]
            while self.at("punct", ","):
                self.next()
                args.append(self._case_value())
            self.expect("punct", ")")
            kinds = {_kind_of(a) for a in args}
            if {"num", "str"} <= kinds:
                raise PatternSyntaxError(
                    f"coalesce() at position {pos} mixes string and "
                    "numeric arguments — Spark would reject the plan "
                    "unpositioned; make the arguments one type")
            return _kinded(lambda: F.coalesce(*[a() for a in args]),
                           _kind_join(kinds))
        return self._value_ref()

    _ARITH_OPS = {
        "+": lambda a, b: a + b, "-": lambda a, b: a - b,
        "*": lambda a, b: a * b, "/": lambda a, b: a / b,
        # Cypher's modulo (r15) — Spark and DuckDB both follow the
        # dividend's sign, so the oracles mirror with a bare %
        "%": lambda a, b: a % b,
    }

    def _combine(self, a, b, op: str, pos: int):
        """Apply one arithmetic/concat operator with the r15 kind rules:
        ``+`` CONCATENATES when either side is a string (Cypher's rule;
        an 'any' side is cast to string — F.concat over the carried
        column), ADDS otherwise; a known string×number mix and any
        string under ``- * /`` are positioned rejects (they would
        surface as unpositioned ANSI cast errors at plan time)."""
        ka, kb = _kind_of(a), _kind_of(b)
        if op == "+" and "str" in (ka, kb):
            if "num" in (ka, kb):
                raise PatternSyntaxError(
                    f"'+' at position {pos} mixes a string and a "
                    "numeric operand — keep both sides strings for "
                    "concatenation, or cast with toInteger()/toFloat() "
                    "for addition")

            def concat(a=a, b=b, ka=ka, kb=kb):
                ca, cb = a(), b()
                if ka != "str":
                    ca = ca.cast("string")
                if kb != "str":
                    cb = cb.cast("string")
                return F.concat(ca, cb)

            return _kinded(concat, "str")
        if "str" in (ka, kb):
            raise PatternSyntaxError(
                f"'{op}' at position {pos} over a string operand — only "
                "'+' concatenates; cast with toInteger()/toFloat() for "
                "arithmetic")
        fn = self._ARITH_OPS[op]
        kind = "num" if (ka, kb) == ("num", "num") else "any"
        return _kinded(lambda a=a, b=b, fn=fn: fn(a(), b()), kind)

    def _value_expr(self):
        """A value expression (r14, widened r15): terms composed with
        ``+ - * /`` at arithmetic precedence (``* /`` bind tighter),
        left-associative, with parenthesized grouping (r15) and
        string concatenation (``+`` over strings, r15 — ``a.name +
        '-' + b.name`` is natural GPT output over the all-string
        corpus). Covers the GPT-emitted numeric questions ("tasks over
        2.5 hours", "hours per person") and RETURN shaping."""

        def mul():
            left = self._value_term()
            while (self.at("punct", "*") or self.at("punct", "/")
                    or self.at("punct", "%")):
                _, op, pos = self.next()
                left = self._combine(left, self._value_term(), op, pos)
            return left

        left = mul()
        while self.at("punct", "+") or self.at("punct", "-"):
            _, op, pos = self.next()
            left = self._combine(left, mul(), op, pos)
        return left

    def _predicate(self):
        """One comparison / string / null / membership predicate —
        returns a Column thunk. Value positions are full arithmetic
        expressions since r14 (``toFloat(th.content) / toInteger(
        p.content) > 8.5``)."""
        lhs = self._value_expr()
        sp = self._string_pred(lhs)
        if sp is not None:
            return sp
        k, op, p = self.next()
        if k == "punct" and op == "=~":
            # Cypher's regex match (r13): FULL-string semantics (Neo4j
            # anchors the whole string), so the pattern wraps in
            # ^(?:...)$ before compiling to Column.rlike
            k2, v2, p2 = self.next()
            if k2 != "str":
                raise PatternSyntaxError(
                    f"=~ needs a quoted regex literal at position {p2}, "
                    f"got {v2!r}")
            rx = "^(?:" + _unescape(v2[1:-1]) + ")$"
            return lambda: lhs().rlike(rx)
        if k != "punct" or op not in _COMPARE_OPS:
            raise PatternSyntaxError(
                f"expected comparison operator at position {p}, got {op!r}")
        if self.at("str"):
            lit = _unescape(self.next()[1][1:-1])
            rhs = _kinded(lambda: F.lit(lit), "str")
        else:
            rhs = self._value_expr()
        # comparison kind guard (r15 review fix): a statically known
        # string×number comparison would pass parse and die as an
        # unpositioned ANSI cast error at execution — the exact class
        # the kind system turns into positioned rejects ('any' sides
        # keep Cypher's plan-time typing)
        if {"num", "str"} <= {_kind_of(lhs), _kind_of(rhs)}:
            raise PatternSyntaxError(
                f"comparison at position {p} mixes a string and a "
                "numeric side — cast one side with toInteger()/"
                "toFloat()/toString()")
        ops = {"=": lambda a, b: a == b,
               "<>": lambda a, b: a != b, "!=": lambda a, b: a != b,
               "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
               ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}[op]
        return lambda: ops(lhs(), rhs())

    def _string_pred(self, col_fn):
        """Cypher's string/null predicates (r12b): ``CONTAINS 'x'``,
        ``STARTS WITH 'x'``, ``ENDS WITH 'x'``, ``IS [NOT] NULL`` — the
        four the reference's GPT seam emits constantly — over a Column
        THUNK (so ``toLower(x.f) CONTAINS …`` composes). Returns a
        Column thunk, or None when the cursor holds a comparison
        operator instead. (The post-filter ``IS NULL`` idiom over an
        OPTIONAL MATCH column lives in ``WITH … WHERE s IS NULL`` —
        since r13 a WHERE directly after the OPTIONAL clause is the
        MATCH-TIME predicate, Cypher's binding.)"""
        k, v, _ = self.peek()
        if k != "ident":
            return None
        vu = v.upper()
        if vu == "IS":
            self.next()
            neg = self.at("kw", "NOT")
            if neg:
                self.next()
            k2, v2, p2 = self.next()
            if k2 != "ident" or v2.upper() != "NULL":
                raise PatternSyntaxError(
                    f"expected NULL at position {p2}, got {v2!r}")
            if neg:
                return lambda: col_fn().isNotNull()
            return lambda: col_fn().isNull()
        if vu in ("STARTS", "ENDS", "CONTAINS"):
            self.next()
            if vu != "CONTAINS":
                self.expect("kw", "WITH")
            k2, v2, p2 = self.next()
            if k2 != "str":
                shape = "CONTAINS" if vu == "CONTAINS" else f"{vu} WITH"
                raise PatternSyntaxError(
                    f"{shape} needs a quoted string literal at position "
                    f"{p2}, got {v2!r}")
            lit = _unescape(v2[1:-1])
            fn = {"STARTS": "startswith", "ENDS": "endswith",
                  "CONTAINS": "contains"}[vu]
            return lambda: getattr(col_fn(), fn)(lit)
        if vu == "IN":
            # list membership over a literal list: x IN ['a', 'b'] /
            # x IN [1, 2] — compiled to Column.isin
            self.next()
            self.expect("punct", "[")
            lits: list = []
            while True:
                k2, v2, p2 = self.next()
                if k2 == "str":
                    lits.append(_unescape(v2[1:-1]))
                elif k2 == "num":
                    lits.append(_num_value(v2))
                else:
                    raise PatternSyntaxError(
                        f"IN list takes string/number literals "
                        f"(position {p2}, got {v2!r})")
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            self.expect("punct", "]")
            return lambda: col_fn().isin(*lits)
        return None

    def _is_edge_var(self, var: str) -> bool:
        """In scope as an edge variable: declared in the CURRENT stage,
        or carried bare through the last WITH."""
        return var in self.stage_edge_vars or var in self.carried_edges

    def _is_node_var(self, var: str) -> bool:
        return var in self.nodes or var in self.carried_nodes

    def _field_ref(self) -> tuple[str | None, str]:
        """``var.field`` → (var, field); a bare identifier naming a
        column carried through WITH (r12b) → (None, colname);
        ``length(p)`` over a path variable → (p, "len");
        ``id(n)`` / ``type(r)`` accessor functions (r13) → the
        corresponding carried field. Under an ORDER BY expression
        (r15), leaves resolve through ``_ref_override`` instead —
        OUTPUT columns only (accessor functions excluded: the pattern
        scope's columns may not survive the projection)."""
        if self._ref_override is not None:
            return self._ref_override()
        fr = self._maybe_fn_ref()
        if fr is not None:
            return fr
        k, var, p = self.next()
        if k != "ident":
            raise PatternSyntaxError(
                f"expected a variable at position {p}, got {var!r}")
        if not self.at("punct", "."):
            if var in self.carried_cols:
                return None, var
            _, v, p2 = self.peek()
            raise PatternSyntaxError(
                f"expected '.' at position {p2}, got {v!r} (bare "
                "identifiers in WHERE must be columns carried through "
                "WITH)")
        self.next()
        fld = self.expect("ident")
        if self._is_edge_var(var):
            if fld != "rel_type":
                raise PatternSyntaxError(
                    f"edge variable field {fld!r} is not carried — the "
                    "data model's whole edge payload is rel_type")
            return var, fld
        if not self._is_node_var(var):
            raise PatternSyntaxError(
                f"WHERE references unknown variable {var!r}")
        if var in self.neg_only:
            raise PatternSyntaxError(
                f"variable {var!r} exists only inside a NOT/exists() pattern and "
                "binds no output columns")
        if fld not in _CARRY:
            raise PatternSyntaxError(
                f"field {fld!r} is not carried (have: {', '.join(_CARRY)})")
        return var, fld

    # -- RETURN / WITH projection ------------------------------------------
    def _returns(self) -> None:
        if self.at("kw", "DISTINCT"):
            self.next()
            self.distinct = True
        if self.at("punct", "*"):
            # Cypher's ``RETURN *`` (r15b — GPT emits it constantly):
            # every NAMED variable in scope, in declaration order —
            # node variables expand to their carried columns, edge
            # variables to rel_type. Single-stage only (after a WITH,
            # list the carried items explicitly — the same stance as
            # the WITH * reject); anonymous, negation-only and path
            # variables are excluded (paths bind the DISTANCE — return
            # length(p) explicitly).
            _, _, star_pos = self.next()
            if self.stages:
                raise PatternSyntaxError(
                    f"'RETURN *' at position {star_pos} after a WITH "
                    "boundary is not supported — list the carried items "
                    "explicitly")
            if self.stage_path_vars:
                raise PatternSyntaxError(
                    f"'RETURN *' at position {star_pos} with a path "
                    "variable in scope — the engine binds the DISTANCE; "
                    "project the other variables and length(...) "
                    "explicitly")
            items = [(v, None, v) for v in self.nodes
                     if v not in self.anon_vars
                     and v not in self.neg_only]
            items += [(v, "rel_type", f"{v}_rel_type")
                      for v in self.edge_vars
                      if v in self.stage_edge_vars]
            if not items:
                raise PatternSyntaxError(
                    f"'RETURN *' at position {star_pos} has no named "
                    "variables to project")
            self.returns = items
            return
        self.returns, self.aggregates, _ = self._projection()

    def _projection(self) -> tuple[list, list, set[str]]:
        """The shared RETURN / WITH item list: field refs, bare
        variables, aggregates, and (after a WITH, r12b) carried-column
        references ``(None, colname, alias)``. Returns (items,
        aggregates, edge vars carried bare)."""
        items: list[tuple[str | None, str | None, str]] = []
        aggs: list[tuple] = []
        bare_edges: set[str] = set()
        seen: dict[str, int] = {}  # output column -> first position

        def claim(cols: list[str], pos: int) -> None:
            # duplicate output columns at a projection boundary would
            # only surface later as an unpositioned Spark ambiguous-
            # reference error — reject here instead (ADVICE r12)
            for c in cols:
                if c in seen:
                    raise PatternSyntaxError(
                        f"duplicate output column {c!r} at position "
                        f"{pos} — already produced by the item at "
                        f"position {seen[c]}; alias one of them")
                seen[c] = pos

        while True:
            k, v, item_pos = self.peek()
            k1, v1, _ = self.peek(1)
            if self._expr_item_ahead():
                # a VALUE EXPRESSION item (r14b, widened r15): casts,
                # literals, arithmetic/concat over field refs,
                # parenthesized groups, size(), and searched CASE —
                # ``RETURN toFloat(th.content) * 2 AS x``. Items carry
                # the sentinel var '__expr__' with the Column thunk in
                # the fld slot; _apply_projection evaluates it (a
                # grouping KEY when aggregates are present, Cypher's
                # implicit-grouping rule). The alias is required
                # (deterministic column name).
                expr = self._value_expr()
                if not self.at("kw", "AS"):
                    _, vv, p = self.peek()
                    raise PatternSyntaxError(
                        f"a value-expression item needs an explicit "
                        f"alias — expected AS at position {p}, got "
                        f"{vv!r}")
                self.next()
                alias = self.expect("ident")
                claim([alias], item_pos)
                items.append(("__expr__", expr, alias))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            if ((k == "ident" and v.lower() in _AGG_FNS
                    and (k1, v1) == ("punct", "("))
                    or self._size_collect_ahead()):
                ag = self._agg_item()
                claim([ag[-1]], item_pos)
                aggs.append(ag)
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            fr = self._maybe_fn_ref(allow_labels=True)
            if fr is not None:
                fvar, ffld = fr
                alias = (f"length_{fvar}" if ffld == "len"
                         else f"{fvar}_{ffld}")
                if self.at("kw", "AS"):
                    self.next()
                    alias = self.expect("ident")
                claim([alias], item_pos)
                items.append((fvar, ffld, alias))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            var = self.expect("ident")
            if var in self.stage_path_vars:
                raise PatternSyntaxError(
                    f"path variable {var!r} has no bare projection — the "
                    "engine binds the DISTANCE; return length({0})"
                    .format(var))
            is_edge = self._is_edge_var(var)
            if (not is_edge and not self._is_node_var(var)
                    and var in self.carried_cols
                    and not self.at("punct", ".")):
                # a column carried through WITH, referenced by its alias
                alias = var
                if self.at("kw", "AS"):
                    self.next()
                    alias = self.expect("ident")
                claim([alias], item_pos)
                items.append((None, var, alias))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            if not is_edge and not self._is_node_var(var):
                raise PatternSyntaxError(
                    f"RETURN references unknown variable {var!r}")
            if var in self.neg_only:
                raise PatternSyntaxError(
                    f"variable {var!r} exists only inside a NOT/exists() pattern "
                    "and binds no output columns")
            fld: str | None = None
            if self.at("punct", "."):
                self.next()
                fld = self.expect("ident")
                if is_edge and fld != "rel_type":
                    raise PatternSyntaxError(
                        f"edge variable field {fld!r} is not carried — "
                        "the data model's whole edge payload is rel_type")
                if not is_edge and fld not in _CARRY:
                    raise PatternSyntaxError(
                        f"field {fld!r} is not carried "
                        f"(have: {', '.join(_CARRY)})")
            elif is_edge:
                # bare edge variable expands to its one carried field
                fld = "rel_type"
                bare_edges.add(var)
            alias = f"{var}_{fld}" if fld else var
            if self.at("kw", "AS"):
                _, _, p = self.next()
                if fld is None:
                    raise PatternSyntaxError(
                        f"AS at position {p}: a bare variable expands to "
                        "its carried columns and cannot be aliased — "
                        "alias a field (var.field AS name)")
                alias = self.expect("ident")
            claim([f"{var}_{c}" for c in _CARRY] if fld is None
                  else [alias], item_pos)
            items.append((var, fld, alias))
            if self.at("punct", ","):
                self.next()
                continue
            break
        return items, aggs, bare_edges

    _ARITH_PUNCTS = ("+", "-", "*", "/", "%")

    def _expr_item_ahead(self) -> bool:
        """Pure lookahead: does the cursor open a VALUE EXPRESSION
        rather than a plain item? True for numeric literals (incl.
        unary minus), string literals (r15 concat operands),
        parenthesized groups (r15), searched CASE (r15),
        ``toInteger(`` / ``toFloat(`` / ``size(`` casts and wrappers
        (``size(collect(`` excluded — that is the aggregate rewrite),
        and a field ref / carried column immediately followed by an
        arithmetic operator (after a complete plain item the only
        legal tokens are ``,`` / AS / modifiers, so an operator there
        is unambiguous)."""
        k, v, _ = self.peek()
        k1, v1, _ = self.peek(1)
        if k == "num" or ((k, v) == ("punct", "-") and k1 == "num"):
            return True
        if k == "str" or (k, v) == ("punct", "("):
            return True
        if (k == "ident" and v.upper() == "CASE"
                and (k1, v1) != ("punct", ".")):
            return True
        if (k == "ident" and v.lower() in ("tointeger", "tofloat",
                                           "tolower", "toupper",
                                           "tostring", "coalesce")
                and (k1, v1) == ("punct", "(")):
            return True
        if (k == "ident" and v.lower() == "size"
                and (k1, v1) == ("punct", "(")
                and not self._size_collect_ahead()):
            return True
        if k == "ident" and (k1, v1) == ("punct", "."):
            k3, v3, _ = self.peek(3)
            return k3 == "punct" and v3 in self._ARITH_PUNCTS
        if k == "ident" and k1 == "punct" and v1 in self._ARITH_PUNCTS:
            return True
        return False

    def _size_collect_ahead(self) -> bool:
        """Pure lookahead for ``size(collect(`` — the list-length-over-
        collect aggregate rewrite (r15), dispatched to ``_agg_item``
        (count semantics) instead of the scalar size() term."""
        k, v, _ = self.peek()
        k1, v1, _ = self.peek(1)
        k2, v2, _ = self.peek(2)
        k3, v3, _ = self.peek(3)
        return (k == "ident" and v.lower() == "size"
                and (k1, v1) == ("punct", "(")
                and k2 == "ident" and v2.lower() == "collect"
                and (k3, v3) == ("punct", "("))

    def _at_word(self, w: str) -> bool:
        """Case-insensitive word check covering BOTH token kinds —
        CASE/WHEN/THEN/ELSE/END are deliberately not reserved (they stay
        usable as labels/property keys), so they tokenize as idents."""
        k, v, _ = self.peek()
        return k in ("ident", "kw") and v.upper() == w

    def _case_expr(self):
        """``CASE WHEN <pred> THEN <value> … [ELSE <value>] END`` —
        Cypher's searched CASE (r14 as a RETURN/WITH item; r15 anywhere
        a value expression is legal: WHERE positions — ``WHERE CASE …
        END = 1`` — aggregate arguments — ``sum(CASE WHEN … THEN 1 ELSE
        0 END)``, the conditional-aggregate staple — and nested in
        arithmetic). Predicates are the full WHERE boolean grammar
        minus pattern predicates (those compile to joins, not
        expressions); values are string literals or value expressions.
        Compiled to an ``F.when`` chain; without ELSE the non-matching
        rows are NULL (Cypher's rule). Branch values mixing string and
        numeric kinds are a positioned reject (Spark would reject the
        F.when chain unpositioned at plan time). r15 also accepts the
        SIMPLE form ``CASE subject WHEN v1 THEN r1 … END`` — compiled
        to the searched form with ``subject = vN`` equality conditions
        (subject-vs-WHEN-value kind mixes positioned-rejected)."""
        _, _, cpos = self.next()           # CASE
        subject = None
        if not self._at_word("WHEN"):
            subject = self._value_expr()
        branches: list[tuple] = []
        while self._at_word("WHEN"):
            _, _, wpos = self.next()
            if subject is None:
                cond, _ = self._bool_or(
                    self._predicate, allow_negpat=False,
                    neg_ctx="inside a CASE expression — pattern "
                            "predicates compile to joins, not "
                            "expressions")
            else:
                wv = self._case_value()
                ks = {_kind_of(subject), _kind_of(wv)}
                if {"num", "str"} <= ks:
                    raise PatternSyntaxError(
                        f"WHEN at position {wpos} compares the CASE "
                        "subject against a value of the other type "
                        "(string vs numeric) — cast one side")
                cond = (lambda s=subject, w=wv: s() == w())
            if not self._at_word("THEN"):
                _, v, p = self.peek()
                raise PatternSyntaxError(
                    f"expected THEN at position {p}, got {v!r}")
            self.next()
            branches.append((cond, self._case_value()))
        if not branches:
            raise PatternSyntaxError(
                f"CASE at position {cpos} needs at least one WHEN "
                "branch")
        other = None
        if self._at_word("ELSE"):
            self.next()
            other = self._case_value()
        if not self._at_word("END"):
            _, v, p = self.peek()
            raise PatternSyntaxError(
                f"expected END at position {p}, got {v!r}")
        self.next()
        vals = [v for _, v in branches] + ([other] if other is not None
                                           else [])
        kinds = {_kind_of(v) for v in vals}
        if {"num", "str"} <= kinds:
            raise PatternSyntaxError(
                f"CASE at position {cpos} mixes string and numeric "
                "branch values — Spark would reject the plan "
                "unpositioned; make the branches one type")

        def thunk(branches=branches, other=other):
            col = F.when(branches[0][0](), branches[0][1]())
            for c, vv in branches[1:]:
                col = col.when(c(), vv())
            return col.otherwise(other()) if other is not None else col

        return _kinded(thunk, _kind_join(kinds))

    def _case_value(self):
        """A CASE branch / coalesce argument: any value expression —
        string literals are value TERMS since r15, so this is pure
        delegation (kept as a named seam for the two call sites)."""
        return self._value_expr()

    def _agg_item(self) -> tuple:
        """``count(*)`` / ``count([DISTINCT] var[.field])`` /
        ``min|max|sum|avg(var.field)`` — Cypher aggregates with implicit
        grouping (the non-aggregate items become the keys). After a
        WITH (r12b) the argument may also be a carried column,
        ``(fn, None, colname, dist, alias)`` — its numeric-ness for
        sum/avg is the carried value's own (checked at plan time, like
        Cypher's runtime typing). ``size(collect(…))`` (r15) rewrites
        to count semantics: count skips NULLs exactly as collect does,
        and DISTINCT carries through to countDistinct."""
        if self._size_collect_ahead():
            self.next()                    # size
            self.expect("punct", "(")
            inner = self._agg_item()       # the collect(...), no AS yet
            _, var, fld, dist, in_alias = inner
            self.expect("punct", ")")
            alias = f"size_{in_alias}"
            if self.at("kw", "AS"):
                self.next()
                alias = self.expect("ident")
            return ("count", var, fld, dist, alias)
        fn = self.next()[1].lower()
        self.expect("punct", "(")
        dist = False
        if self.at("kw", "DISTINCT"):
            _, _, p = self.next()
            if fn not in ("count", "collect"):
                raise PatternSyntaxError(
                    f"DISTINCT inside {fn}() at position {p} is not "
                    "supported (count/collect only — min/max are "
                    "DISTINCT-invariant anyway)")
            dist = True
        var: str | None = None
        fld: str | None = None
        if self.at("punct", "*"):
            _, _, p = self.next()
            if fn != "count" or dist:
                raise PatternSyntaxError(
                    f"'*' at position {p} is only valid as count(*)")
        elif self._expr_item_ahead():
            # aggregate over a VALUE EXPRESSION (r14b): ``sum(toInteger(
            # th.content))``, ``avg(toFloat(x.f) * 2)``, ``sum(CASE WHEN
            # … THEN 1 ELSE 0 END)`` (r15) — the "total hours per
            # bulletin" / conditional-count GPT shapes. sum/avg over a
            # statically STRING-kinded expression (toLower, concat,
            # string CASE branches) is a positioned reject — under ANSI
            # it would otherwise surface as a runtime Spark cast error
            # (HTTP 500 on the /pattern seam) instead of the
            # positioned-422 contract (ADVICE r14). 'any'-kinded
            # expressions (carried columns) keep Cypher's plan-time
            # typing.
            _, _, epos = self.peek()
            expr = self._value_expr()
            if fn in ("sum", "avg") and _kind_of(expr) == "str":
                raise PatternSyntaxError(
                    f"{fn}() needs a numeric argument — the expression "
                    f"at position {epos} is string-typed; cast with "
                    "toInteger()/toFloat()")
            self.expect("punct", ")")
            alias = f"{fn}_expr"
            if self.at("kw", "AS"):
                self.next()
                alias = self.expect("ident")
            return (fn, "__expr__", expr, dist, alias)
        elif (fr := self._maybe_fn_ref(allow_labels=True)) is not None:
            # aggregate over an accessor function: min(length(p)),
            # count(DISTINCT type(r)), collect(id(n)) ... (r13)
            var, fld = fr
            if fn in ("sum", "avg") and fld not in ("id", "len"):
                raise PatternSyntaxError(
                    f"{fn}() needs a numeric argument and "
                    f"{fld!r} is not numeric")
            self.expect("punct", ")")
            alias = (f"{fn}_length_{var}" if fld == "len"
                     else f"{fn}_{var}_{fld}")
            if self.at("kw", "AS"):
                self.next()
                alias = self.expect("ident")
            return (fn, var, fld, dist, alias)
        else:
            k, var, p = self.next()
            if k != "ident":
                raise PatternSyntaxError(
                    f"expected a variable inside {fn}() at position {p}, "
                    f"got {var!r}")
            is_edge = self._is_edge_var(var)
            is_node = self._is_node_var(var)
            if (not is_edge and not is_node and var in self.carried_cols
                    and not self.at("punct", ".")):
                # aggregate over a carried column (r12b); a column the
                # boundary computed as a STRING is a positioned
                # sum/avg reject (r15 — same contract as the expr
                # branch), 'any' keeps Cypher's plan-time typing
                fld, var = var, None
                if (fn in ("sum", "avg")
                        and self.carried_kinds.get(fld) == "str"):
                    raise PatternSyntaxError(
                        f"{fn}() needs a numeric argument — carried "
                        f"column {fld!r} is string-typed; cast with "
                        "toInteger()/toFloat()")
                self.expect("punct", ")")
                alias = f"{fn}_{fld}"
                if self.at("kw", "AS"):
                    self.next()
                    alias = self.expect("ident")
                return (fn, None, fld, dist, alias)
            if not is_edge and not is_node:
                raise PatternSyntaxError(
                    f"aggregate references unknown variable {var!r}")
            if var in self.neg_only:
                raise PatternSyntaxError(
                    f"variable {var!r} exists only inside a NOT/exists() pattern "
                    "and binds no output columns")
            if self.at("punct", "."):
                self.next()
                fld = self.expect("ident")
                if is_edge and fld != "rel_type":
                    raise PatternSyntaxError(
                        f"edge variable field {fld!r} is not carried — "
                        "the data model's whole edge payload is rel_type")
                if not is_edge and fld not in _CARRY:
                    raise PatternSyntaxError(
                        f"field {fld!r} is not carried "
                        f"(have: {', '.join(_CARRY)})")
            else:
                # count(v): non-null bindings of the variable itself;
                # collect(v) of a NODE variable (r14) collects the WHOLE
                # node — rendered as one deterministic 'id:name' cell
                # per node (Cypher returns the node map; the reference's
                # flagship collects connected node records,
                # first-graph.py:172). Before r14 this silently
                # collapsed to collect(v.id) — a semantic surprise.
                if fn == "collect" and not is_edge:
                    fld = "__node__"
                else:
                    fld = "rel_type" if is_edge else "id"
            if fn in ("sum", "avg") and fld != "id":
                raise PatternSyntaxError(
                    f"{fn}() needs a numeric field and only 'id' is "
                    "numeric among the carried fields")
        self.expect("punct", ")")
        alias = ("count_star" if var is None
                 else f"{fn}_{var}" if fld == "__node__"
                 else f"{fn}_{var}_{fld}")
        if self.at("kw", "AS"):
            self.next()
            alias = self.expect("ident")
        return (fn, var, fld, dist, alias)


def render_match(node_pats: list[NodePat], edge_pats: list[EdgePat]) -> str:
    """The inverse of ``parse_match`` over the spec surface (WHERE
    comparisons and RETURN excepted): render a NodePat/EdgePat spec as
    canonical MATCH text — regular/optional edges one clause each in
    order, negated edges as ``WHERE NOT`` terms. Useful for logging the
    pattern a programmatic caller actually ran, and the hinge of the
    parser's property-based round-trip test (render → parse → same
    spec)."""
    pats = {p.var: p for p in node_pats}
    mentioned: set[str] = set()

    def node(var: str) -> str:
        p = pats[var]
        if var in mentioned:
            return f"({var})"
        mentioned.add(var)
        parts = [var]
        if p.label is not None:
            lb = p.label if isinstance(p.label, str) else "|".join(p.label)
            parts.append(f":{lb}")
        props = []
        if p.name is not None:
            props.append(f"name: '{_escape(p.name)}'")
        if p.docnbr is not None:
            props.append(f"docnbr: '{_escape(p.docnbr)}'")
        if p.prop is not None:
            props.append(f"{p.prop[0]}: '{_escape(p.prop[1])}'")
        if props:
            parts.append(" {" + ", ".join(props) + "}")
        return "(" + "".join(parts) + ")"

    def connector(ep: EdgePat) -> str:
        rt = (ep.rel_type if isinstance(ep.rel_type, (str, type(None)))
              else "|".join(ep.rel_type))
        inner = (ep.var or "") + (f":{rt}" if rt else "")
        if (ep.min_hops, ep.max_hops) != (1, 1) or ep.path_var:
            inner += f"*{ep.min_hops}..{ep.max_hops}"
        if ep.direction == "in":
            return f"<-[{inner}]-"
        arrow = "->" if ep.direction == "out" else "-"
        return f"-[{inner}]{arrow}"

    def edge(ep: EdgePat) -> str:
        txt = f"{node(ep.src)}{connector(ep)}{node(ep.dst)}"
        if ep.path_var:
            # distance-bound edge renders as its shortestPath form so
            # the round-trip re-parses to the same spec
            txt = f"{ep.path_var} = shortestPath({txt})"
        return txt

    clauses, opt_clauses, negs, exs = [], [], [], []
    i = 0
    while i < len(edge_pats):
        ep = edge_pats[i]
        if ep.negated:
            negs.append(ep)
            i += 1
            continue
        if ep.existential:
            # r14: a positive existential renders as WHERE exists(…) —
            # rendering it as a plain MATCH clause would re-parse to a
            # row-multiplying positive edge (different semantics)
            exs.append(ep)
            i += 1
            continue
        if ep.optional and ep.chain_id is not None:
            # a multi-hop optional chain renders as ONE clause so the
            # round-trip re-parses to the same all-or-nothing spec
            grp = [ep]
            i += 1
            while i < len(edge_pats) and edge_pats[i].chain_id == ep.chain_id:
                grp.append(edge_pats[i])
                i += 1
            txt = node(grp[0].src)
            prev = grp[0].src
            for g in grp:
                if g.src != prev:
                    raise ValueError(
                        f"optional chain {ep.chain_id} is not "
                        "head-to-tail — cannot render")
                txt += connector(g) + node(g.dst)
                prev = g.dst
            opt_clauses.append(f"OPTIONAL MATCH {txt}")
            continue
        if ep.optional:
            opt_clauses.append(f"OPTIONAL MATCH {edge(ep)}")
        else:
            clauses.append(f"MATCH {edge(ep)}")
        i += 1
    # WHERE NOT terms render after the POSITIVE clauses and before any
    # OPTIONAL clause: since r13 a WHERE directly after an OPTIONAL
    # MATCH binds to it as a match-time predicate (where NOT patterns
    # are rejected), so the trailing placement would not re-parse.
    # Clause order in the re-parse therefore differs from edge_pats
    # order when optionals precede negations — semantically harmless
    # (join order, not meaning); the round-trip test compares multisets.
    if (negs or exs) and not clauses:
        raise ValueError(
            "cannot render a pattern predicate with no positive clause: "
            "the WHERE would bind to an OPTIONAL MATCH clause as its "
            "match-time predicate (r13 Cypher binding), which rejects "
            "pattern predicates — add a positive MATCH clause")
    out = " ".join(clauses)
    terms = ([f"exists({edge(ep)})" for ep in exs]
             + [f"NOT {edge(ep)}" for ep in negs])
    if terms:
        out += " WHERE " + " AND ".join(terms)
    if opt_clauses:
        out += " " + " ".join(opt_clauses)
    return out


def parse_match(text: str) -> ParsedPattern:
    """Parse a MATCH pattern string into the motif spec. Raises
    ``PatternSyntaxError`` (a ValueError) with position + expectation on
    anything outside the supported subset."""
    return _Parser(text).parse()


def inject_labels(node_pats: list[NodePat], edge_pats: list[EdgePat],
                  rel_signatures: dict[str, tuple[str, str]]
                  ) -> tuple[list[NodePat], int]:
    """Write catalog labels onto UNLABELED pattern variables (r12,
    verdict #8): GPT-shaped terse patterns omit labels, but an unlabeled
    side cannot ride the label_counts broadcast (it must be assumed
    fact-sized — SCALE.md §7g measured 12 → 6 exchanges when the parsed
    key gained labels), so the planner hint is free performance whenever
    the catalog can prove the label.

    ``rel_signatures`` maps rel_type → its UNIQUE (src_label, dst_label)
    signature in storage orientation — callers must pre-filter to
    rel_types with exactly one signature (``GraphStore
    .catalog_relationships()`` has the counts). Injection is
    SEMANTICS-PRESERVING under that uniqueness: any node bound through a
    single-signature edge type necessarily carries the signature's label
    (the signature is derived from the same data). Skipped: already-
    labeled variables, untyped / disjunctive / variable-length edges,
    and undirected edges (storage orientation unknown).

    Returns the (possibly rewritten) node_pats and how many labels were
    injected."""
    new = {p.var: p for p in node_pats}
    injected = 0
    for ep in edge_pats:
        if not isinstance(ep.rel_type, str):
            continue  # untyped or disjunction: no unique signature
        if (ep.min_hops, ep.max_hops) != (1, 1) or ep.direction == "both":
            continue
        sig = rel_signatures.get(ep.rel_type)
        if sig is None:
            continue
        s_lab, d_lab = sig
        stor_src, stor_dst = ((ep.dst, ep.src) if ep.direction == "in"
                              else (ep.src, ep.dst))
        for var, lab in ((stor_src, s_lab), (stor_dst, d_lab)):
            p = new.get(var)
            if p is not None and p.label is None:
                new[var] = NodePat(p.var, label=lab, name=p.name,
                                   docnbr=p.docnbr, prop=p.prop)
                injected += 1
    return list(new.values()), injected


def match_pattern(nodes: DataFrame, edges: DataFrame, text: str,
                  edge_distinct: bool = False,
                  rel_signatures: dict[str, tuple[str, str]] | None = None,
                  **motif_kwargs) -> DataFrame:
    """Text → bindings: parse ``text`` and compile it with
    ``match_motif`` (all of whose kwargs — label_counts,
    broadcast_node_sides, … — pass through). A RETURN clause projects
    (bare variables expand to their carried columns); without one, all
    bound variables' columns come back.

    ``edge_distinct=True`` (r12) restores Cypher's relationship
    uniqueness with Cypher's own scoping: the pairwise edge-tuple
    inequality predicate (``motif.edge_distinct_where``) is built PER
    MATCH CLAUSE, so edges in different MATCH / OPTIONAL MATCH clauses
    may still bind the same stored edge — exactly as in Cypher.

    ``rel_signatures`` (r12, with ``label_counts``): unique per-rel_type
    (src_label, dst_label) catalog signatures — unlabeled variables get
    their provable labels injected before compilation (``inject_labels``)
    so terse GPT-shaped patterns ride the broadcast hints by default.

    WITH stages (r12b) compile left-to-right: each boundary applies its
    projection/aggregation, modifiers and trailing WHERE, and a stage's
    follow-on MATCH compiles as its OWN motif joined back to the carried
    rows on the re-anchored variables' ``<var>_id`` columns (an
    equi-join — the carried side is typically post-aggregation-small and
    AQE picks the broadcast; the motif side keeps the catalog's
    label_counts hints)."""
    spec = parse_match(text)

    def compile_motif(node_pats: list[NodePat], edge_pats: list[EdgePat],
                      clauses: list[tuple[int, ...]],
                      where: Column | None,
                      opt_wheres: dict | None = None) -> DataFrame:
        nps = node_pats
        if rel_signatures:
            nps, _ = inject_labels(nps, edge_pats, rel_signatures)
        w = where
        if edge_distinct:
            for group in clauses:
                ed = edge_distinct_where([edge_pats[i] for i in group])
                if ed is not None:
                    w = ed if w is None else (w & ed)
        ow = None
        if opt_wheres:
            # AND each clause's match-time thunks into one Column
            ow = {}
            for idx, thunks in opt_wheres.items():
                col = thunks[0]()
                for th in thunks[1:]:
                    col = col & th()
                ow[idx] = col
        return match_motif(nodes, edges, nps, edge_pats,
                           where=w, optional_wheres=ow, **motif_kwargs)

    def _labels_needed(items, aggs) -> set[str]:
        vs = {var for var, fld, _ in (items or []) if fld == "labels"}
        vs |= {a[1] for a in (aggs or []) if a[2] == "labels"}
        return vs

    def _attach_labels(df: DataFrame, vars_: set[str]) -> DataFrame:
        """labels(v) columns (r13): labels are not motif carry columns,
        so each referenced variable's label set joins in by id at the
        projection boundary — flattened to ONE sorted ';'-joined cell
        (scalar-output rule). Left join preserves NULL-filled optional
        rows; the join is id-keyed (no broadcast forced — nodes can be
        fact-sized)."""
        for v in sorted(vars_):
            lab = nodes.select(
                F.col("id").alias(f"{v}_id"),
                F.concat_ws(";", F.sort_array("labels"))
                 .alias(f"{v}_labels"))
            df = df.join(lab, on=f"{v}_id", how="left")
        return df

    def compile_query(sp: ParsedPattern) -> DataFrame:
        out = compile_motif(sp.node_pats, sp.edge_pats, sp.clauses,
                            sp.where_column(), sp.optional_wheres)
        for st in sp.stages:
            out = _attach_labels(
                out, _labels_needed(st.items, st.aggregates))
            out = _apply_projection(out, st.items, st.aggregates,
                                    st.distinct)
            out = _apply_modifiers(out, st.order_by, st.skip, st.limit)
            for th in st.post_where:
                out = out.filter(th())
            if st.edge_pats:
                m = compile_motif(st.node_pats, st.edge_pats, st.clauses,
                                  None, st.optional_wheres)
                keys = [f"{v}_id" for v in st.join_vars]
                # the re-anchored variables' non-id carry columns exist
                # on both sides with identical values (functionally
                # dependent on the id) — keep the carried side's copies
                dup = (set(out.columns) & set(m.columns)) - set(keys)
                out = out.join(m.drop(*dup), on=keys)
                stage_where = None
                for th in st.where_fn:
                    c = th()
                    stage_where = (c if stage_where is None
                                   else (stage_where & c))
                if stage_where is not None:
                    out = out.filter(stage_where)
        out = _attach_labels(
            out, _labels_needed(sp.returns, sp.aggregates))
        out = _apply_projection(out, sp.returns, sp.aggregates,
                                sp.distinct)
        out = _apply_modifiers(out, sp.order_by, sp.skip, sp.limit)
        return out

    out = compile_query(spec)
    if spec.unions:
        # UNION [ALL] between full queries (r13): branches compile
        # independently and combine by column NAME (the parser enforced
        # identical column sets); bare UNION de-duplicates across the
        # WHOLE result, SQL/Cypher semantics (flags are homogeneous)
        for _, br in spec.unions:
            out = out.unionByName(compile_query(br))
        if not spec.unions[0][0]:
            out = out.distinct()
    return out


def _apply_projection(out: DataFrame, items, aggregates,
                      distinct: bool) -> DataFrame:
    """One RETURN / WITH boundary's projection: implicit-grouping
    aggregation when aggregates are present, plain select otherwise;
    ``items is None`` (RETURN-less pattern) keeps all binding columns.
    Item/aggregate ``var=None`` references a carried column by name."""

    def col_of(var, fld):
        return F.col(fld if var is None else f"{var}_{fld}")

    if items is not None and aggregates:
        # Cypher implicit grouping: non-aggregate items are the keys
        keys = []
        for var, fld, alias in items:
            if var == "__expr__":
                # a CASE expression item (r14) — fld holds the thunk
                keys.append(fld().alias(alias))
            elif fld is None:
                keys.extend(F.col(f"{var}_{c}") for c in _CARRY)
            else:
                keys.append(col_of(var, fld).alias(alias))
        aggs = []
        for fn, var, fld, dist, alias in aggregates:
            if var is None and fld is None:
                aggs.append(F.count(F.lit(1)).alias(alias))
                continue
            if var == "__expr__":
                # aggregate over a value expression (r14b) — fld holds
                # the Column thunk; falls through to the shared
                # count/collect/plain dispatch below
                c = fld()
            elif fld == "__node__":
                # collect(v) of a whole node (r14): one deterministic
                # 'id:name' cell per node — id is the node's identity,
                # name the human anchor; a NULL id (optional miss)
                # makes the whole cell NULL so collect skips it,
                # Cypher's rule
                c = F.when(
                    F.col(f"{var}_id").isNotNull(),
                    F.concat_ws(":", F.col(f"{var}_id").cast("string"),
                                F.coalesce(F.col(f"{var}_name"),
                                           F.lit(""))))
            else:
                c = col_of(var, fld)
            if fn == "count":
                aggs.append((F.countDistinct(c) if dist
                             else F.count(c)).alias(alias))
            elif fn == "collect":
                # Cypher's collect() list aggregate (r13) — the
                # reference's flagship result shape (first-graph.py:
                # 168-176 groups connected-node names per match). The
                # driver canonicalizer forbids array outputs, so the
                # list is flattened DETERMINISTICALLY: sort_array over
                # the collected values (numeric order for numeric
                # fields), then ';'-joined as one string cell. collect
                # skips NULLs (Cypher's rule; an all-NULL group yields
                # the empty string — Cypher's []).
                coll = F.sort_array(F.collect_set(c) if dist
                                    else F.collect_list(c))
                aggs.append(F.concat_ws(
                    ";", F.transform(coll, lambda x: x.cast("string"))
                ).alias(alias))
            else:
                aggs.append(getattr(F, fn)(c).alias(alias))
        out = out.groupBy(*keys).agg(*aggs) if keys else out.agg(*aggs)
    elif items is not None:
        cols = []
        for var, fld, alias in items:
            if var == "__expr__":
                cols.append(fld().alias(alias))
            elif fld is None:
                cols.extend(F.col(f"{var}_{c}") for c in _CARRY)
            else:
                cols.append(col_of(var, fld).alias(alias))
        out = out.select(*cols)
    if distinct:
        out = out.distinct()
    return out


def _apply_modifiers(out: DataFrame, order_by, skip, limit) -> DataFrame:
    if order_by:
        # entries are (output column name, asc) or, for ORDER BY
        # expressions (r15), (Column thunk over output columns, asc) —
        # orderBy computes the key on the fly, no hidden column needed
        def key(c):
            return F.col(c) if isinstance(c, str) else c()

        out = out.orderBy(*[key(c) if asc else key(c).desc()
                            for c, asc in order_by])
    if skip:
        out = out.offset(skip)
    if limit is not None:
        out = out.limit(limit)
    return out
