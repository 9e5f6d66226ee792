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
* clauses: ``MATCH p1, p2``, additional ``MATCH`` / ``OPTIONAL MATCH``
  (every edge in an OPTIONAL MATCH clause is left-outer);
* ``WHERE`` with AND-ed terms: ``NOT (a)-[:T]->(b)`` negative patterns
  (the ``negated`` anti-join form; the right node may be anonymous with
  predicates — NOT-EXISTS-a-node-matching-P) and comparisons
  ``a.field OP b.field`` / ``a.field OP 'literal'`` over the carried
  fields (id/name/content/docnbr) with OP in = <> != < <= > >=;
* ``RETURN [DISTINCT] a.field [AS alias], b, …`` — projected by
  ``match_pattern``; a bare variable expands to its carried columns;
* RETURN aggregates with Cypher's IMPLICIT GROUPING (r12):
  ``count(*)``, ``count([DISTINCT] var[.field])``, and
  ``min/max/sum/avg(var.field)`` — non-aggregate RETURN items become
  the grouping keys, exactly Cypher's semantics (``RETURN a.docnbr,
  count(DISTINCT ln.name)`` groups by docnbr). A pattern whose RETURN
  is all-aggregates produces the global 1-row aggregate;
* trailing result modifiers after RETURN (r12): ``ORDER BY item
  [ASC|DESC], …``, ``SKIP n``, ``LIMIT n`` — items are output columns
  (aliases, or var.field mapped through its alias); compiled to
  orderBy/offset/limit. Without RETURN they stay rejected (Cypher's
  own rule). LIMIT without a total ORDER BY is nondeterministic under
  ties, exactly as in Cypher — oracle-checked callers must order by a
  unique key.

Rejected with explicit errors (parse-time, not plan-time): OR in
WHERE, unbounded ``*``, shortest-path functions, any trailing clause
(ORDER BY/LIMIT belong to the DataFrame, not the pattern language),
RETURN/WHERE references to a negation-only auxiliary variable (it
binds no output columns), multi-hop OPTIONAL MATCH paths (each hop
must be its own OPTIONAL MATCH clause — the compiler's leaf rule), and
edge variables on negated or variable-length patterns.

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
from dataclasses import dataclass, field

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
      | (?P<num>\d+)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<punct><=|>=|<>|!=|\.\.|<-|->|[()\[\]{}:,.\-<>=*|])
    )""",
    re.VERBOSE,
)

_COMPARE_OPS = {"=", "<>", "!=", "<", "<=", ">", ">="}
_KEYWORDS = {"MATCH", "OPTIONAL", "WHERE", "NOT", "AND", "OR", "RETURN",
             "DISTINCT", "AS", "ORDER", "BY", "SKIP", "LIMIT", "ASC",
             "DESC"}
_AGG_FNS = {"count", "min", "max", "sum", "avg"}


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
class ParsedPattern:
    """The compiled-from-text spec: feed node_pats/edge_pats/where to
    ``match_motif`` (``match_pattern`` does, then applies ``returns``)."""

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
        self.nodes: dict[str, NodePat] = {}
        self.edges: list[EdgePat] = []
        self.edge_vars: dict[str, int] = {}  # var -> declaration position
        self.neg_only: set[str] = set()  # vars living only in NOT patterns
        self.clauses: list[tuple[int, ...]] = []
        self.where_fn: list = []
        self.returns: list[tuple[str, str | None, str]] | None = None
        self.aggregates: list[tuple] = []  # (fn, var, fld, distinct, alias)
        self.order_by: list[tuple[str, bool]] = []
        self.skip: int | None = None
        self.limit: int | None = None
        self.distinct = False
        self._anon = 0

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
        first_optional = self.at("kw", "OPTIONAL")
        if first_optional:
            self.next()
        self.expect("kw", "MATCH")
        self._clause_group(optional=first_optional)
        while self.at("kw", "MATCH") or self.at("kw", "OPTIONAL"):
            optional = self.at("kw", "OPTIONAL")
            if optional:
                self.next()
            self.expect("kw", "MATCH")
            self._clause_group(optional=optional)
        if self.at("kw", "WHERE"):
            self.next()
            self._where_terms()
        if self.at("kw", "RETURN"):
            self.next()
            self._returns()
            self._modifiers()
        k, v, p = self.peek()
        if k != "eof":
            raise PatternSyntaxError(
                f"unexpected {v!r} at position {p} (ORDER BY / SKIP / "
                "LIMIT are only valid after RETURN; other trailing "
                "clauses are not part of the pattern language — apply "
                "them on the returned DataFrame)")
        if not self.edges:
            raise PatternSyntaxError(
                "pattern has no edge — a single-node MATCH is a table "
                "scan, not a motif; use the store API directly")
        return ParsedPattern(list(self.nodes.values()), self.edges,
                             self.where_fn, self.returns, self.distinct,
                             self.clauses, tuple(self.edge_vars),
                             self.aggregates, self.order_by, self.skip,
                             self.limit)

    def _modifiers(self) -> None:
        """Trailing ``ORDER BY item [ASC|DESC], … SKIP n LIMIT n`` (r12)
        — Cypher's result modifiers, valid only after RETURN. Items
        resolve to OUTPUT columns (an alias, or var.field which maps
        through its RETURN alias when the item was aliased)."""
        outs = self._output_columns()
        if self.at("kw", "ORDER"):
            self.next()
            self.expect("kw", "BY")
            while True:
                col = self._order_item(outs)
                asc = True
                if self.at("kw", "ASC"):
                    self.next()
                elif self.at("kw", "DESC"):
                    self.next()
                    asc = False
                self.order_by.append((col, asc))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        if self.at("kw", "SKIP"):
            self.next()
            self.skip = int(self.expect("num"))
        if self.at("kw", "LIMIT"):
            self.next()
            self.limit = int(self.expect("num"))

    def _output_columns(self) -> set[str]:
        cols: set[str] = set()
        for var, fld, alias in self.returns or []:
            if fld is None:
                cols.update(f"{var}_{c}" for c in _CARRY)
            else:
                cols.add(alias)
        cols.update(item[-1] for item in self.aggregates)
        return cols

    def _order_item(self, outs: set[str]) -> str:
        k, v, p = self.next()
        if k != "ident":
            raise PatternSyntaxError(
                f"expected a column in ORDER BY at position {p}, "
                f"got {v!r}")
        if self.at("punct", "."):
            self.next()
            fld = self.expect("ident")
            # an aliased RETURN item is ordered through its alias
            col = f"{v}_{fld}"
            for rvar, rfld, ralias in self.returns or []:
                if rvar == v and rfld == fld:
                    col = ralias
                    break
        else:
            col = v
        if col not in outs:
            raise PatternSyntaxError(
                f"ORDER BY references {col!r}, which is not an output "
                f"column (have: {', '.join(sorted(outs))})")
        return col

    def _clause_group(self, optional: bool) -> None:
        start = len(self.edges)
        self._path(optional)
        while self.at("punct", ","):
            self.next()
            self._path(optional)
        self.clauses.append(tuple(range(start, len(self.edges))))

    def _fresh_var(self) -> str:
        while True:
            v = f"anon{self._anon}"
            self._anon += 1
            if v not in self.nodes:
                return v

    def _path(self, optional: bool, collect: list | None = None) -> None:
        var = self._node()
        n_hops = 0
        while self.at("punct", "-") or self.at("punct", "<-"):
            _, _, hop_pos = self.peek()
            ep_kw = self._edge_spec()
            dst = self._node()
            ep = EdgePat(src=var, dst=dst, optional=optional, **ep_kw)
            n_hops += 1
            if optional and n_hops > 1:
                # plan-time the compiler requires the optional variable
                # to be a leaf — a chained optional hop ALWAYS violates
                # that; reject here with position instead (ADVICE r11)
                raise PatternSyntaxError(
                    f"multi-hop OPTIONAL MATCH path at position {hop_pos} "
                    "— the optional variable must be a leaf; split each "
                    "hop into its own OPTIONAL MATCH clause")
            if collect is not None:
                collect.append(ep)
            else:
                self.edges.append(ep)
            var = dst

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
                if v in self.nodes or v in self.edge_vars:
                    raise PatternSyntaxError(
                        f"edge variable {v!r} at position {p} collides "
                        "with an existing variable (each edge variable "
                        "binds one edge)")
                var = v
                self.edge_vars[v] = p
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
            lo = int(self.next()[1])
            if self.at("punct", ".."):
                self.next()
                if self.at("num"):
                    return lo, int(self.next()[1])
                raise PatternSyntaxError(
                    "unbounded '*n..' hop range — the compiler caps at 8; "
                    "give an explicit upper bound or use "
                    "graph/traverse.k_hop")
            return lo, lo
        if self.at("punct", ".."):
            self.next()
            return 1, int(self.expect("num"))
        raise PatternSyntaxError(
            "unbounded '*' reachability is not supported (reachability "
            "closure is graph/traverse.k_hop's frontier loop); give "
            "bounds like *1..3")

    # -- WHERE ------------------------------------------------------------
    def _where_terms(self) -> None:
        self._where_term()
        while True:
            if self.at("kw", "AND"):
                self.next()
                self._where_term()
                continue
            if self.at("kw", "OR"):
                _, _, p = self.next()
                raise PatternSyntaxError(
                    f"OR at position {p} is not supported — the motif "
                    "compiler ANDs all predicates; run two patterns and "
                    "union the results")
            break

    def _where_term(self) -> None:
        if self.at("kw", "NOT"):
            _, _, not_pos = self.next()
            known = set(self.nodes)
            negs: list[EdgePat] = []
            self._path(optional=False, collect=negs)
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
            if ep.src in new_vars:
                raise PatternSyntaxError(
                    f"NOT pattern at position {not_pos} must anchor on "
                    f"an already-bound variable ({ep.src!r} appears only "
                    "inside the negation)")
            # a variable introduced ONLY inside the NOT binds no output
            # columns — RETURN/WHERE references to it are rejected at
            # parse time (ADVICE r11), preserving the positioned-422
            # contract on POST /pattern
            self.neg_only |= new_vars
            self.edges.append(EdgePat(
                src=ep.src, dst=ep.dst, rel_type=ep.rel_type,
                direction=ep.direction, min_hops=ep.min_hops,
                max_hops=ep.max_hops, negated=True))
            return
        var, fld = self._field_ref()
        k, op, p = self.next()
        if k != "punct" or op not in _COMPARE_OPS:
            raise PatternSyntaxError(
                f"expected comparison operator at position {p}, got {op!r}")
        if self.at("str"):
            lit = _unescape(self.next()[1][1:-1])
            rhs = lambda: F.lit(lit)  # noqa: E731
        elif self.at("num"):
            litn = int(self.next()[1])
            rhs = lambda: F.lit(litn)  # noqa: E731
        else:
            v2, f2 = self._field_ref()
            rhs = lambda: F.col(f"{v2}_{f2}")  # noqa: E731
        lhs = lambda: F.col(f"{var}_{fld}")  # noqa: E731
        ops = {"=": lambda a, b: a == b,
               "<>": lambda a, b: a != b, "!=": lambda a, b: a != b,
               "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
               ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}[op]
        self.where_fn.append(lambda: ops(lhs(), rhs()))

    def _field_ref(self) -> tuple[str, str]:
        var = self.expect("ident")
        self.expect("punct", ".")
        fld = self.expect("ident")
        if var in self.edge_vars:
            if fld != "rel_type":
                raise PatternSyntaxError(
                    f"edge variable field {fld!r} is not carried — the "
                    "data model's whole edge payload is rel_type")
            return var, fld
        if var not in self.nodes:
            raise PatternSyntaxError(
                f"WHERE references unknown variable {var!r}")
        if var in self.neg_only:
            raise PatternSyntaxError(
                f"variable {var!r} exists only inside a NOT pattern and "
                "binds no output columns")
        if fld not in _CARRY:
            raise PatternSyntaxError(
                f"field {fld!r} is not carried (have: {', '.join(_CARRY)})")
        return var, fld

    # -- RETURN -----------------------------------------------------------
    def _returns(self) -> None:
        if self.at("kw", "DISTINCT"):
            self.next()
            self.distinct = True
        self.returns = []
        while True:
            k, v, _ = self.peek()
            k1, v1, _ = self.peek(1)
            if (k == "ident" and v.lower() in _AGG_FNS
                    and (k1, v1) == ("punct", "(")):
                self._agg_item()
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            var = self.expect("ident")
            is_edge = var in self.edge_vars
            if not is_edge and var not in self.nodes:
                raise PatternSyntaxError(
                    f"RETURN references unknown variable {var!r}")
            if var in self.neg_only:
                raise PatternSyntaxError(
                    f"variable {var!r} exists only inside a NOT pattern "
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
            alias = f"{var}_{fld}" if fld else var
            if self.at("kw", "AS"):
                _, _, p = self.next()
                if fld is None:
                    raise PatternSyntaxError(
                        f"AS at position {p}: a bare variable expands to "
                        "its carried columns and cannot be aliased — "
                        "alias a field (var.field AS name)")
                alias = self.expect("ident")
            self.returns.append((var, fld, alias))
            if self.at("punct", ","):
                self.next()
                continue
            break

    def _agg_item(self) -> None:
        """``count(*)`` / ``count([DISTINCT] var[.field])`` /
        ``min|max|sum|avg(var.field)`` — Cypher aggregates with implicit
        grouping (the non-aggregate RETURN items become the keys)."""
        fn = self.next()[1].lower()
        self.expect("punct", "(")
        dist = False
        if self.at("kw", "DISTINCT"):
            _, _, p = self.next()
            if fn != "count":
                raise PatternSyntaxError(
                    f"DISTINCT inside {fn}() at position {p} is not "
                    "supported (count only — min/max are DISTINCT-"
                    "invariant anyway)")
            dist = True
        var: str | None = None
        fld: str | None = None
        if self.at("punct", "*"):
            _, _, p = self.next()
            if fn != "count" or dist:
                raise PatternSyntaxError(
                    f"'*' at position {p} is only valid as count(*)")
        else:
            k, var, p = self.next()
            if k != "ident":
                raise PatternSyntaxError(
                    f"expected a variable inside {fn}() at position {p}, "
                    f"got {var!r}")
            is_edge = var in self.edge_vars
            if not is_edge and var not in self.nodes:
                raise PatternSyntaxError(
                    f"aggregate references unknown variable {var!r}")
            if var in self.neg_only:
                raise PatternSyntaxError(
                    f"variable {var!r} exists only inside a NOT pattern "
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
                # count(v): non-null bindings of the variable itself
                fld = "rel_type" if is_edge else "id"
            if fn in ("sum", "avg") and fld != "id":
                raise PatternSyntaxError(
                    f"{fn}() needs a numeric field and only 'id' is "
                    "numeric among the carried fields")
        self.expect("punct", ")")
        alias = "count_star" if var is None else f"{fn}_{var}_{fld}"
        if self.at("kw", "AS"):
            self.next()
            alias = self.expect("ident")
        self.aggregates.append((fn, var, fld, dist, alias))


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

    def edge(ep: EdgePat) -> str:
        rt = (ep.rel_type if isinstance(ep.rel_type, (str, type(None)))
              else "|".join(ep.rel_type))
        inner = (ep.var or "") + (f":{rt}" if rt else "")
        if (ep.min_hops, ep.max_hops) != (1, 1):
            inner += f"*{ep.min_hops}..{ep.max_hops}"
        if ep.direction == "in":
            return f"{node(ep.src)}<-[{inner}]-{node(ep.dst)}"
        arrow = "->" if ep.direction == "out" else "-"
        return f"{node(ep.src)}-[{inner}]{arrow}{node(ep.dst)}"

    clauses, negs = [], []
    for ep in edge_pats:
        if ep.negated:
            negs.append(ep)
        else:
            kw = "OPTIONAL MATCH" if ep.optional else "MATCH"
            clauses.append(f"{kw} {edge(ep)}")
    out = " ".join(clauses)
    if negs:
        out += " WHERE " + " AND ".join(f"NOT {edge(ep)}" for ep in negs)
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
    so terse GPT-shaped patterns ride the broadcast hints by default."""
    spec = parse_match(text)
    node_pats = spec.node_pats
    if rel_signatures:
        node_pats, _ = inject_labels(node_pats, spec.edge_pats,
                                     rel_signatures)
    where = spec.where_column()
    if edge_distinct:
        for group in spec.clauses:
            ed = edge_distinct_where([spec.edge_pats[i] for i in group])
            if ed is not None:
                where = ed if where is None else (where & ed)
    out = match_motif(nodes, edges, node_pats, spec.edge_pats,
                      where=where, **motif_kwargs)
    if spec.returns is not None and spec.aggregates:
        # Cypher implicit grouping: non-aggregate items are the keys
        keys = []
        for var, fld, alias in spec.returns:
            if fld is None:
                keys.extend(F.col(f"{var}_{c}") for c in _CARRY)
            else:
                keys.append(F.col(f"{var}_{fld}").alias(alias))
        aggs = []
        for fn, var, fld, dist, alias in spec.aggregates:
            if var is None:
                aggs.append(F.count(F.lit(1)).alias(alias))
                continue
            c = F.col(f"{var}_{fld}")
            if fn == "count":
                aggs.append((F.countDistinct(c) if dist
                             else F.count(c)).alias(alias))
            else:
                aggs.append(getattr(F, fn)(c).alias(alias))
        out = out.groupBy(*keys).agg(*aggs) if keys else out.agg(*aggs)
    elif spec.returns is not None:
        cols = []
        for var, fld, alias in spec.returns:
            if fld is None:
                cols.extend(F.col(f"{var}_{c}") for c in _CARRY)
            else:
                cols.append(F.col(f"{var}_{fld}").alias(alias))
        out = out.select(*cols)
    if spec.distinct:
        out = out.distinct()
    if spec.order_by:
        out = out.orderBy(*[F.col(c) if asc else F.col(c).desc()
                            for c, asc in spec.order_by])
    if spec.skip:
        out = out.offset(spec.skip)
    if spec.limit is not None:
        out = out.limit(spec.limit)
    return out
