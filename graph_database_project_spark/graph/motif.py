"""Declarative graph-pattern (motif) matching compiled to nodes/edges
equi-joins — the Spark-first re-expression of the reference's core query
shape: its NL→Cypher contract lets GPT emit *arbitrary*
``MATCH (a:L1 {prop})-[:T]->(b:L2) RETURN …`` patterns over the
35-label/34-reltype catalog (first-graph.py:102-136 schema prompt, :141
query contract). Instead of a Cypher interpreter, a pattern here is a
small declarative spec (node predicates, typed directed edges) that
compiles to a left-deep join plan over the two GraphStore DataFrames —
Catalyst then orders/broadcasts/prunes it like any relational plan.

Semantics: a match is a *homomorphism* from pattern variables to graph
nodes — distinct variables MAY bind the same node (use a ``where``
inequality to forbid it), and the result is the SET of variable bindings
(parallel edges between the same node pair collapse: the edge relation
is de-duplicated to (src, dst) per edge pattern before joining, so
binding multiplicity comes only from node bindings).

DEFAULT DEVIATION from Cypher: Cypher additionally enforces
*relationship uniqueness* within one MATCH — two edge patterns in the
same pattern cannot bind the same stored edge (so e.g. a 2-step pattern
never walks the same edge forward-then-back). By DEFAULT this compiler
admits such bindings (pure homomorphism semantics, like SQL/GQL
``REPEATABLE EDGES``): a pattern ported verbatim from the reference's
Cypher surface can therefore return EXTRA rows where two edge variables
coincide. Callers recover Cypher edge-distinctness either by adding
``where`` inequalities over the endpoint variables (the shipped
``graph_motif_shared`` query does exactly this: ``a1_id != a2_id``
forbids the two included_in patterns from binding one edge) or — r12 —
by passing ``edge_distinct=True``, which compiles the pairwise
edge-tuple inequalities automatically (``edge_distinct_where`` below;
the text front-end's ``match_pattern(..., edge_distinct=True)`` applies
it PER MATCH CLAUSE, which is Cypher's actual scoping).

Scale shape: every hop is an equi-join keyed on 64-bit node ids — the
edge relation shuffles by key (or rides a broadcast when the bound side
is selective), never a cartesian (the compiler REJECTS disconnected
patterns rather than emitting a cross product). Node patterns with a
selective predicate (name / docnbr / property) are broadcast: at 100 TB
the typical motif starts from a dim-sized seed set and drags only
matched edge partitions through each hop, exactly like the k-hop
traversal plan (traverse.py:28).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

# columns carried per bound variable, prefixed "<var>_<col>"
_CARRY = ["id", "name", "content", "docnbr"]

_VAR_RE = re.compile(r"^[a-z][a-z0-9]*$")

# How the var-length expansion materializes its multi-consumer relations
# (the loop-invariant edge set + each intermediate hop). All three keep
# the SAME O(k) logical sharing; they differ in WHEN the shared relation
# computes:
#   "eager" — localCheckpoint(eager=True): one Spark job per relation at
#       construction (the r15 shape). Serial job latency at small SF.
#   "lazy"  — localCheckpoint(eager=False): the same LogicalRDD plan
#       shape, but the RDD computes inside the FIRST consuming job and
#       is persisted for every later reference — zero extra jobs, same
#       single computation per hop.
#   "none"  — no boundary: the plan re-expands per reference (the r14
#       shape, O(k^2) joins — kept only as the A/B control).
# r16 default: "lazy" (VERDICT r15 #2 A/B, scripts/motif_ckpt_ab_r16.py
# — lazy ≤ eager on every interleaved min/median at sf0.1 while cutting
# the per-query driver job count by 2-3, and the O(k) sharing at scale
# is identical). Env override SPARK_GRAFT_MOTIF_CKPT is for A/B probes,
# not production.
_CKPT_MODE = __import__("os").environ.get("SPARK_GRAFT_MOTIF_CKPT", "lazy")


def _hop_materialize(df: DataFrame) -> DataFrame:
    if _CKPT_MODE == "none":
        return df
    return df.localCheckpoint(eager=(_CKPT_MODE == "eager"))


@dataclass(frozen=True)
class NodePat:
    """One pattern variable: ``(var:label {name:, docnbr:, prop:})``.

    All predicates are optional and AND-ed; ``prop`` is a (key, value)
    equality over the node's ``props`` map — the analogue of Cypher's
    inline property map. ``label`` may be a tuple of labels —
    DISJUNCTION (Cypher's ``:A|B``): the node matches if it carries ANY
    of them.
    """

    var: str
    label: str | tuple[str, ...] | None = None
    name: str | None = None
    docnbr: str | None = None
    prop: tuple[str, str] | None = None


@dataclass(frozen=True)
class EdgePat:
    """One typed edge: ``(src)-[:rel_type]->(dst)`` with ``direction``
    ``out`` (src→dst in storage), ``in`` (storage dst→src — i.e. the
    pattern arrow points backwards), or ``both`` (undirected match).
    ``rel_type=None`` matches any relationship type.

    ``negated=True`` is Cypher's ``WHERE NOT (src)-[:T]->(dst)``: an
    existential anti-filter compiled to a left-anti join. Its src must
    already be bound; its dst may be an auxiliary pattern variable that
    appears ONLY in this edge (NOT-EXISTS-a-node-matching-P semantics) —
    the auxiliary variable binds nothing and contributes no output
    columns.

    ``existential=True`` (r14) is the POSITIVE dual — Cypher's
    ``WHERE (src)-[:T]->(dst)`` / ``WHERE exists(…)`` pattern
    predicate, compiled to a left-SEMI join: bindings are FILTERED to
    those where such an edge exists, without multiplying rows (a plain
    positive edge with a fresh variable would bind it — one output row
    per matching edge; the existential binds nothing). Same shape rules
    as ``negated``: src already bound, dst either bound too (pair
    semi) or an auxiliary appearing only here (EXISTS-a-node-matching-P
    via semi against edges ⋈ aux-pattern); no edge variable, not
    optional, single hop.

    ``rel_type`` may be a tuple — DISJUNCTION (Cypher's ``-[:A|B]->``):
    the edge matches any of the listed types (still de-duplicated to
    distinct (src, dst) pairs afterwards).

    ``min_hops``/``max_hops`` give Cypher's variable-length form
    ``-[:T*min..max]->`` with REACHABILITY semantics: the edge relation
    is expanded to the DISTINCT (src, dst) pairs connected by a path of
    min..max edges of the given type/direction (node pairs, not paths —
    the same set the k-hop traversal returns; path-multiplicity
    semantics would be a different, factorially larger relation).
    max_hops is capped at 8 — beyond that use graph/traverse.k_hop's
    frontier loop, which checkpoints per hop.

    ``optional=True`` is Cypher's OPTIONAL MATCH for one edge: a
    left-outer join — bindings without the edge keep NULLs in the
    optional variable's columns. The optional variable must be a leaf
    (not referenced by any later edge), because a later inner join
    through a NULL would silently re-drop the preserved rows.

    ``chain_id`` (r13) groups consecutive optional edges into ONE
    multi-hop ``OPTIONAL MATCH (a)-[:T]->(b)-[:U]->(c)`` clause with
    Cypher's ALL-OR-NOTHING null semantics: the chain's inner motif
    (edges + node patterns) is compiled as inner joins and the whole
    thing left-joins the anchor ONCE — a binding either matches the
    entire path or carries NULLs for every chain variable. Splitting
    per hop is NOT equivalent (per-hop left-outer can bind hop 1 and
    NULL hop 2; Cypher then discards the partial binding). Chain edges
    must be consecutive in ``edge_pats``, head-to-tail (each edge's src
    is the previous edge's dst), start at a bound anchor, and bind only
    fresh leaf variables (intermediates referenced by exactly their two
    chain edges). Two optional edges in SEPARATE clauses keep
    ``chain_id=None`` and retain the per-clause (per-hop) semantics —
    which is Cypher's behavior for separate OPTIONAL MATCH clauses.

    ``var`` is Cypher's edge variable ``-[r:T]->`` (r12): the binding
    carries the bound edge's relationship type as ``<var>_rel_type``
    (the reference's data model has no edge properties — SURVEY §1.1 —
    so rel_type IS the whole edge payload). An edge with a variable is
    de-duplicated per (src, dst, rel_type) TRIPLE instead of pair, so an
    untyped ``-[r]->`` returns one binding per distinct type connecting
    a pair — exactly Cypher's per-relationship multiplicity. Not allowed
    on negated edges (nothing binds) or variable-length edges (a path
    binds a LIST of relationships — out of scope; use the k_hop
    traversal).

    ``path_var`` is Cypher's ``p = shortestPath((a)-[:T*1..k]->(b))``
    (r12b) with DISTANCE semantics: the variable-length pair relation
    additionally carries ``<path_var>_len`` — the MINIMUM hop count
    (within min_hops..max_hops) connecting each bound pair, i.e. the
    BFS distance when min_hops is 1. The engine binds the distance, not
    a path object: the reference's data model has no edge identity to
    enumerate a path with, and Cypher callers overwhelmingly consume
    ``length(p)``. Mutually exclusive with ``var``/``negated``/
    ``optional``; requires max_hops ≥ min_hops ≥ 1 (same ≤8 cap as the
    reachability form — beyond that use graph/traverse.k_hop)."""

    src: str
    dst: str
    rel_type: str | tuple[str, ...] | None = None
    direction: str = "out"
    negated: bool = False
    min_hops: int = 1
    max_hops: int = 1
    optional: bool = False
    var: str | None = None
    path_var: str | None = None
    chain_id: int | None = None
    existential: bool = False


def _node_side(nodes: DataFrame, pat: NodePat) -> tuple[DataFrame, bool]:
    """The filtered, var-prefixed projection of one node pattern; second
    element says whether the pattern is selective (broadcast-worthy)."""
    rel = nodes
    if pat.label is not None:
        labels = (pat.label,) if isinstance(pat.label, str) else pat.label
        cond = F.array_contains("labels", labels[0])
        for lb in labels[1:]:
            cond = cond | F.array_contains("labels", lb)
        rel = rel.filter(cond)
    if pat.name is not None:
        rel = rel.filter(F.col("name") == pat.name)
    if pat.docnbr is not None:
        rel = rel.filter(F.col("docnbr") == pat.docnbr)
    if pat.prop is not None:
        k, v = pat.prop
        rel = rel.filter(F.col("props")[k] == v)
    selective = any(x is not None for x in (pat.name, pat.docnbr, pat.prop))
    proj = rel.select(*[F.col(c).alias(f"{pat.var}_{c}") for c in _CARRY])
    return proj, selective


def _edge_rel(edges: DataFrame, pat: EdgePat,
              deduped: bool = False) -> DataFrame:
    """The (src, dst) pair set for one edge pattern — de-duplicated so
    parallel edges / multi-batch re-ingest don't inflate bindings. With
    an edge variable the set keeps ``rel_type`` (dedup per triple).

    ``deduped`` (r13): the caller vouches the edge relation is already
    unique per (src, dst, rel_type) — the GraphStore ingest/MERGE
    contract (shred.py dropDuplicates; store.merge's anti-join) — so
    the per-pattern ``distinct()`` and its shuffle are SKIPPED whenever
    uniqueness follows from the contract: a single rel_type (pairs
    unique), or any typed/untyped pattern WITH an edge variable
    (triples unique). Still de-duplicated: undirected ``both`` patterns
    (the two orientations can collide on reciprocal edges) and
    untyped/disjunctive patterns without an edge variable (one pair can
    carry several types). One shuffle saved per motif hop — at 100 TB
    the hop joins shuffle by key anyway, but the extra full-relation
    distinct ahead of them was pure waste."""
    er = edges
    if pat.rel_type is not None:
        types = ((pat.rel_type,) if isinstance(pat.rel_type, str)
                 else pat.rel_type)
        er = er.filter(F.col("rel_type").isin(*types))
    extra = [F.col("rel_type")] if pat.var else []
    er = er.select("src", "dst", *extra)
    if pat.direction == "in":
        er = er.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                       *extra)
    elif pat.direction == "both":
        er = er.unionByName(
            er.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                      *extra))
    elif pat.direction != "out":
        raise ValueError(f"bad direction {pat.direction!r}")
    unique_by_contract = (deduped and pat.direction != "both"
                          and (pat.var is not None
                               or isinstance(pat.rel_type, str)))
    if not unique_by_contract:
        er = er.distinct()
    if pat.max_hops > 1:
        # r15 optimization: a DataFrame plan re-expands a subtree PER
        # REFERENCE (no CTE sharing — the CLAUDE.md multi-consumer rule),
        # and the exact-h chain below references ``er`` once per hop and
        # each hop's pair set twice (the next hop's join + the union), so
        # the unrolled plan re-ran hop h's joins and dedup shuffles
        # (max_hops - h) extra times: graph_motif_shortestpath (1..4)
        # executed 31 hash exchanges / 10 er derivations per run,
        # graph_motif_varlength (1..3) 18/6. Materializing the loop-
        # invariant ``er`` and each intermediate hop once (the same
        # localCheckpoint idiom every graph loop here uses) makes the
        # expansion O(max_hops): each hop's join + distinct runs exactly
        # once. Same rows out — this is pure plan shape. Each CONSUMER of
        # a materialized relation gets a fresh-attribute re-projection:
        # union branches sharing one LogicalRDD's attribute ids trip
        # Union.rewriteConstraints ("key not found" on constraint
        # attributes outside the child's output).
        er = _hop_materialize(er)

        def _ref(ck: DataFrame) -> DataFrame:
            return ck.select(*[F.col(c).alias(c) for c in ck.columns])
    else:
        def _ref(ck: DataFrame) -> DataFrame:
            return ck
    if pat.path_var is not None:
        if not (1 <= pat.min_hops <= pat.max_hops <= 8):
            raise ValueError(
                f"bad hop range {pat.min_hops}..{pat.max_hops} (want 1<=min"
                "<=max<=8; use graph/traverse.k_hop beyond that)")
        # shortest-path DISTANCE relation: each exact-h pair set stamped
        # with h, folded to the per-pair minimum — min over {h : a path
        # of exactly h edges exists} IS the BFS distance (min_hops=1);
        # with a higher lower bound it is the shortest admissible length
        cur = er
        acc = (_ref(er).withColumn("len", F.lit(1).cast("long"))
               if pat.min_hops <= 1 else None)
        for h in range(2, pat.max_hops + 1):
            cur = (_ref(cur).alias("a")
                   .join(_ref(er).alias("b"),
                         F.col("a.dst") == F.col("b.src"))
                   .select(F.col("a.src").alias("src"),
                           F.col("b.dst").alias("dst"))
                   .distinct())
            if h < pat.max_hops:
                # referenced by the next hop's join AND (possibly) the
                # union — materialize once; the last hop has a single
                # consumer, so it stays unshared
                cur = _hop_materialize(cur)
            if h >= pat.min_hops:
                step = _ref(cur).withColumn("len", F.lit(h).cast("long"))
                acc = step if acc is None else acc.unionByName(step)
        return acc.groupBy("src", "dst").agg(F.min("len").alias("len"))
    if (pat.min_hops, pat.max_hops) == (1, 1):
        return er
    if pat.var is not None:
        raise ValueError(
            "an edge variable on a variable-length edge is not supported "
            "(a path binds a list of relationships; use graph/traverse)")
    if not (1 <= pat.min_hops <= pat.max_hops <= 8):
        raise ValueError(
            f"bad hop range {pat.min_hops}..{pat.max_hops} (want 1<=min"
            "<=max<=8; use graph/traverse.k_hop beyond that)")
    # variable-length expansion: exact-h pair sets chained by equi-join,
    # unioned over the requested range — reachability (DISTINCT pairs).
    # The cross-hop dedup runs ONCE on the final union (r15) instead of
    # per hop: unioning per-hop-distinct sets then distinct-ing the lot
    # is the same set with max_hops-2 fewer full-accumulator shuffles.
    cur = er
    sets = [_ref(er)] if pat.min_hops <= 1 else []
    for h in range(2, pat.max_hops + 1):
        cur = (_ref(cur).alias("a")
               .join(_ref(er).alias("b"), F.col("a.dst") == F.col("b.src"))
               .select(F.col("a.src").alias("src"),
                       F.col("b.dst").alias("dst"))
               .distinct())
        if h < pat.max_hops:
            cur = _hop_materialize(cur)
        if h >= pat.min_hops:
            sets.append(_ref(cur))
    acc = sets[0]
    for s in sets[1:]:
        acc = acc.unionByName(s)
    return acc.distinct() if len(sets) > 1 else acc


def edge_distinct_where(edge_pats: list[EdgePat]) -> Column | None:
    """Cypher relationship-uniqueness over a group of edge patterns as a
    pairwise binding predicate (r12): for every pair of POSITIVE,
    non-optional, single-hop edge patterns whose rel_type constraints
    could bind the same stored edge (type sets overlap, or either is
    untyped), require their bound (src, dst) endpoint tuples to differ —
    direction-normalized to storage orientation, and compared UNORDERED
    when either pattern is undirected (``both``: the binding's storage
    orientation is not observable, so the conservative unordered compare
    is used). With the store's pair-level dedup (parallel same-type
    same-endpoint edges collapse on ingest) this equals Cypher's
    relationship uniqueness exactly.

    Excluded from the constraint (documented scoping):
    * negated edges — they assert NON-existence and bind nothing;
    * optional edges — Cypher scopes uniqueness per MATCH clause and
      OPTIONAL MATCH is always its own clause (also, a NULL endpoint
      from a preserved row would NULL-poison the predicate and silently
      drop the row the outer join preserved).

    Raises on a variable-length positive edge: a path binds MANY
    relationships and its intermediate endpoints are not in the binding,
    so uniqueness is not expressible over the output columns.

    Returns None when no pair needs a constraint."""
    pos = [ep for ep in edge_pats
           if not ep.negated and not ep.optional and not ep.existential]
    for ep in pos:
        if (ep.min_hops, ep.max_hops) != (1, 1):
            raise ValueError(
                "edge_distinct with a variable-length edge pattern is not "
                "supported (path-internal relationships are not in the "
                "binding); add explicit where inequalities instead")

    def tset(ep: EdgePat) -> set[str] | None:
        if ep.rel_type is None:
            return None
        return ({ep.rel_type} if isinstance(ep.rel_type, str)
                else set(ep.rel_type))

    def stored(ep: EdgePat) -> tuple[str, str]:
        # storage-orientation endpoint VARIABLE names
        return ((ep.dst, ep.src) if ep.direction == "in"
                else (ep.src, ep.dst))

    def tuples_equal(pa: tuple[str, str], pb: tuple[str, str]) -> Column:
        # shared variables make components statically true — compare
        # names first so e.g. (ln,a1) vs (ln,a2) compiles to the single
        # conjunct a1_id == a2_id, not a trivially-true ln_id == ln_id
        parts = [F.col(f"{va}_id") == F.col(f"{vb}_id")
                 for va, vb in zip(pa, pb) if va != vb]
        if not parts:
            return F.lit(True)  # identical variable pair: always same
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out

    conds: list[Column] = []
    for i in range(len(pos)):
        for j in range(i + 1, len(pos)):
            a, b = pos[i], pos[j]
            ta, tb = tset(a), tset(b)
            if ta is not None and tb is not None and not (ta & tb):
                continue  # type-disjoint patterns can never share an edge
            sa, sb = stored(a), stored(b)
            same = tuples_equal(sa, sb)
            if "both" in (a.direction, b.direction):
                same = same | tuples_equal(sa, (sb[1], sb[0]))
            conds.append(~same)
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def match_motif(
    nodes: DataFrame,
    edges: DataFrame,
    node_pats: list[NodePat],
    edge_pats: list[EdgePat],
    where: Column | None = None,
    broadcast_node_sides: bool = False,
    label_counts: dict[str, int] | None = None,
    broadcast_max_nodes: int = 100_000,
    edge_distinct: bool = False,
    optional_wheres: dict[int, Column] | None = None,
    edges_deduped: bool = False,
) -> DataFrame:
    """Compile a motif to a DataFrame of variable bindings.

    Output columns: ``<var>_id / _name / _content / _docnbr`` for every
    pattern variable (negated-edge auxiliary variables excepted — they
    bind nothing), plus ``<evar>_rel_type`` for every edge variable, one
    row per distinct binding. Edge patterns are
    processed in order; each must touch at least one already-bound
    variable (a disconnected pattern would be a cartesian product — the
    compiler raises instead). An edge between two already-bound
    variables becomes an existence (left-semi) filter — the closing edge
    of a cycle; a ``negated`` edge becomes a NOT-EXISTS (left-anti)
    filter, against the bound pair or against any node matching its
    auxiliary pattern.

    ``broadcast_node_sides``: hint that EVERY node-pattern side is
    dim-sized (not just selective ones). Needed when the store tables
    are checkpointed/LogicalRDD relations whose sizes Catalyst cannot
    see (defaultSizeInBytes makes it assume huge → shuffle joins for
    node sides that are actually tiny). Set it when label-filtered node
    sets are known dim-sized (the XML corpus; any label whose
    cardinality the catalog bounds); leave False when a label can be
    fact-sized — the edge relation must remain the streamed side.

    ``label_counts``: the principled form of the same decision — the
    store's own catalog statistics (``GraphStore.catalog_labels()``
    collected to a dict). A node side whose label count is ≤
    ``broadcast_max_nodes`` broadcasts; unlabeled or unknown labels do
    not. This is the engine supplying the statistics Catalyst cannot
    derive through a checkpoint — per-label, so a motif mixing a
    dim-sized label with a fact-sized one broadcasts only the former.

    ``edge_distinct``: compile Cypher's relationship-uniqueness as a
    pairwise binding filter over ALL positive non-optional edge patterns
    (``edge_distinct_where`` — this object-API form treats the whole
    spec as ONE MATCH clause; the text front-end scopes per clause).
    Default False: homomorphism semantics, the documented deviation.

    ``edges_deduped`` (r13): the caller vouches ``edges`` is unique per
    (src, dst, rel_type) — the GraphStore contract — letting
    ``_edge_rel`` skip the per-pattern distinct (one shuffle per hop)
    wherever uniqueness follows. Results are identical under the
    contract; passing it with a non-deduped relation inflates binding
    multiplicity (caller's responsibility).

    ``optional_wheres`` (r13): Cypher's MATCH-TIME ``WHERE`` on an
    OPTIONAL MATCH clause — edge index (the clause's first optional
    edge) → predicate Column. The predicate joins the LEFT-JOIN
    CONDITION: the optional pattern matches only where pattern AND
    predicate hold, and anchor rows are preserved (NULL-filled) either
    way — utterly different from filtering the joined result, which
    would drop the preserved rows (the ``where`` parameter's post-filter
    semantics). The predicate may reference any already-bound variable
    plus the clause's own; on a chain it applies at the final anchor
    left join (conjunction over the whole chain row — Cypher's
    all-or-nothing unit).
    """
    pats = {p.var: p for p in node_pats}
    if len(pats) != len(node_pats):
        raise ValueError("duplicate pattern variable")
    for v in pats:
        if not _VAR_RE.match(v):
            raise ValueError(f"bad variable name {v!r} (want [a-z][a-z0-9]*)")
    if not edge_pats:
        raise ValueError("motif needs at least one edge pattern")
    evars: set[str] = set()
    for ep in edge_pats:
        if ep.src not in pats or ep.dst not in pats:
            raise ValueError(f"edge references unknown variable: {ep}")
        if ep.var is not None:
            if not _VAR_RE.match(ep.var):
                raise ValueError(f"bad edge variable name {ep.var!r} "
                                 "(want [a-z][a-z0-9]*)")
            if ep.var in pats or ep.var in evars:
                raise ValueError(
                    f"edge variable {ep.var!r} collides with another "
                    "variable (each edge variable binds one edge)")
            if ep.negated or ep.existential:
                raise ValueError(
                    f"edge variable {ep.var!r} on a NOT/exists pattern "
                    "binds nothing (it asserts pure (non-)existence)")
            evars.add(ep.var)
        if ep.path_var is not None:
            if not _VAR_RE.match(ep.path_var):
                raise ValueError(f"bad path variable name {ep.path_var!r} "
                                 "(want [a-z][a-z0-9]*)")
            if ep.path_var in pats or ep.path_var in evars:
                raise ValueError(
                    f"path variable {ep.path_var!r} collides with another "
                    "variable")
            if ep.var is not None or ep.negated or ep.optional:
                raise ValueError(
                    f"path variable {ep.path_var!r} cannot combine with "
                    "an edge variable, negation, or OPTIONAL (shortest-"
                    "path binds a positive distance)")
            evars.add(ep.path_var)

    def _dim_sized(p: NodePat) -> bool:
        if broadcast_node_sides:
            return True
        if label_counts is None or p.label is None:
            return False
        labels = (p.label,) if isinstance(p.label, str) else p.label
        ns = [label_counts.get(lb) for lb in labels]
        # a disjunction is dim-sized only when EVERY branch is catalog-
        # bounded (one unknown label could be fact-sized)
        if any(n is None for n in ns):
            return False
        return sum(ns) <= broadcast_max_nodes

    # (projection, broadcast-worthy) per var: selective predicates and
    # catalog-bounded labels both qualify
    sides = {}
    for v, p in pats.items():
        proj, selective = _node_side(nodes, p)
        sides[v] = (proj, selective or _dim_sized(p))

    ep0 = edge_pats[0]
    if ep0.negated or ep0.existential:
        raise ValueError("first edge pattern cannot be negated or "
                         "existential (nothing is bound yet)")
    for ep in edge_pats:
        if ep.existential and (ep.negated or ep.optional):
            raise ValueError("an existential edge cannot also be "
                             "negated or optional")
        if ep.existential and (ep.path_var is not None
                               or ep.max_hops != 1):
            raise ValueError("existential patterns are single-hop "
                             "(use a positive variable-length edge "
                             "and DISTINCT instead)")
    refs: dict[str, int] = {}
    for ep in edge_pats:
        refs[ep.src] = refs.get(ep.src, 0) + 1
        refs[ep.dst] = refs.get(ep.dst, 0) + 1
    bound: set[str] = set()
    aux: set[str] = set()

    def bind(result: DataFrame | None, var: str, on_edge_col) -> DataFrame:
        """Join an unbound variable's node relation onto the result via
        the current edge column; broadcast the node side when the
        pattern is selective (seed-sized at any scale) or the caller
        declared all node sides dim-sized."""
        rel, bcast = sides[var]
        rel = F.broadcast(rel) if bcast else rel
        bound.add(var)
        if result is None:
            return rel
        return result.join(rel, on_edge_col == F.col(f"{var}_id"))

    result = bind(None, ep0.src, None)
    consumed: set[int] = set()
    for i, ep in enumerate(edge_pats):
        if i in consumed:
            continue
        if ep.src not in bound and ep.dst not in bound:
            raise ValueError(
                f"disconnected pattern at edge {i} ({ep.src}->{ep.dst}): "
                "every edge must touch an already-bound variable")
        if ep.optional and ep.chain_id is not None:
            # multi-hop OPTIONAL MATCH chain (r13): compile the chain's
            # inner motif (edge ⋈ node per hop, inner joins) and
            # left-join it onto the anchor ONCE — all-or-nothing null
            # semantics; a per-hop split would keep partial bindings
            # Cypher discards
            chain = [ep]
            j = i + 1
            while (j < len(edge_pats)
                   and edge_pats[j].chain_id == ep.chain_id):
                chain.append(edge_pats[j])
                consumed.add(j)
                j += 1
            if len(chain) < 2:
                raise ValueError(
                    f"optional chain {ep.chain_id} has a single edge — "
                    "use a plain optional edge (chain_id=None)")
            anchor = chain[0].src
            if anchor not in bound:
                raise ValueError(
                    f"optional chain must start at its bound anchor "
                    f"({anchor!r} is not bound) — re-orient the chain")
            sub = None
            prev = anchor
            for k, cep in enumerate(chain):
                if cep.negated or cep.existential \
                        or cep.path_var is not None or not cep.optional:
                    raise ValueError(
                        "optional-chain edges must be plain optional "
                        "patterns (no negation / exists / shortestPath)")
                if cep.src != prev:
                    raise ValueError(
                        f"optional chain must be head-to-tail: edge {k} "
                        f"starts at {cep.src!r}, expected {prev!r}")
                vnext = cep.dst
                if vnext in bound:
                    raise ValueError(
                        f"optional-chain variable {vnext!r} is already "
                        "bound — chain variables must be fresh leaves")
                want = 2 if k + 1 < len(chain) else 1
                if refs[vnext] != want:
                    raise ValueError(
                        f"optional-chain variable {vnext!r} must be a "
                        f"leaf of the chain (referenced by exactly its "
                        f"chain edge{'s' if want == 2 else ''}) — a "
                        "later inner join through a NULL would re-drop "
                        "the preserved rows")
                cer = _edge_rel(edges, cep, edges_deduped)
                ecarry = ([cer["rel_type"].alias(f"{cep.var}_rel_type")]
                          if cep.var else [])
                orel, osel = sides[vnext]
                if osel:
                    orel = F.broadcast(orel)
                step = (cer.join(orel, cer["dst"] == F.col(f"{vnext}_id"))
                        .select(cer["src"].alias("_ck"), *ecarry,
                                *[f"{vnext}_{c}" for c in _CARRY]))
                if sub is None:
                    sub = step.withColumnRenamed("_ck", "_opt_key")
                else:
                    sub = (sub.join(step,
                                    F.col(f"{prev}_id") == F.col("_ck"))
                           .drop("_ck"))
                bound.add(vnext)
                prev = vnext
            cond = F.col(f"{anchor}_id") == F.col("_opt_key")
            ow = (optional_wheres or {}).get(i)
            if ow is not None:
                # Cypher match-time WHERE: part of the join condition,
                # so anchor rows failing it are preserved NULL-filled
                cond = cond & ow
            result = result.join(sub, cond, "left").drop("_opt_key")
            continue
        er = _edge_rel(edges, ep, edges_deduped)
        if ep.optional:
            # OPTIONAL MATCH: left-outer binding of a leaf variable
            if ep.negated:
                raise ValueError("an edge cannot be both optional and "
                                 "negated")
            if ep.src in bound and ep.dst in bound:
                raise ValueError("optional closing edges are not "
                                 "supported (the existence filter would "
                                 "be a no-op)")
            bvar, ovar, bcol, ocol = (
                (ep.src, ep.dst, "src", "dst") if ep.src in bound
                else (ep.dst, ep.src, "dst", "src"))
            if refs[ovar] != 1:
                raise ValueError(
                    f"optional variable {ovar!r} must be a leaf "
                    "(referenced by exactly that one edge)")
            orel, osel = sides[ovar]
            if osel:
                orel = F.broadcast(orel)
            ecarry = ([er["rel_type"].alias(f"{ep.var}_rel_type")]
                      if ep.var else [])
            rel = (er.join(orel, er[ocol] == F.col(f"{ovar}_id"))
                   .select(er[bcol].alias("_opt_key"), *ecarry,
                           *[f"{ovar}_{c}" for c in _CARRY]))
            cond = F.col(f"{bvar}_id") == F.col("_opt_key")
            ow = (optional_wheres or {}).get(i)
            if ow is not None:
                # Cypher match-time WHERE (r13): part of the join
                # condition — anchor rows failing it stay, NULL-filled
                cond = cond & ow
            result = result.join(rel, cond, "left").drop("_opt_key")
            bound.add(ovar)
            continue
        if ep.existential or ep.negated:
            # pattern PREDICATES (one shared compile — duals by join
            # type): existential (r14) is Cypher's positive
            # ``WHERE (a)-[:T]->(b)`` — a left-SEMI keeps each binding
            # AT MOST ONCE (filters, never multiplies); negated is
            # ``WHERE NOT …`` — the left-ANTI NOT-EXISTS filter.
            kind, how = (("existential", "left_semi") if ep.existential
                         else ("negated", "left_anti"))
            if ep.src in bound and ep.dst in bound:
                result = result.join(
                    er,
                    (F.col(f"{ep.src}_id") == er["src"])
                    & (F.col(f"{ep.dst}_id") == er["dst"]),
                    how,
                )
                continue
            bvar, avar, edge_col = (
                (ep.src, ep.dst, "src") if ep.src in bound
                else (ep.dst, ep.src, "dst"))
            if refs[avar] != 1 or avar in bound:
                raise ValueError(
                    f"{kind}-edge auxiliary variable {avar!r} must "
                    "appear in exactly that one edge")
            # [NOT] EXISTS an edge to ANY node matching the auxiliary
            # pattern: semi/anti join against (edges ⋈ aux-node-pattern)
            arel, asel = sides[avar]
            if asel:
                arel = F.broadcast(arel)
            hit = (er.join(arel,
                           er["dst" if edge_col == "src" else "src"]
                           == F.col(f"{avar}_id"))
                   .select(er[edge_col].alias("_pred_key")))
            result = result.join(
                hit, F.col(f"{bvar}_id") == F.col("_pred_key"), how)
            aux.add(avar)
            continue
        ecarry = ([F.col("rel_type").alias(f"{ep.var}_rel_type")]
                  if ep.var else
                  [F.col("len").alias(f"{ep.path_var}_len")]
                  if ep.path_var else [])
        if ep.src in bound and ep.dst in bound:
            if ep.var or ep.path_var:
                # closing edge WITH a variable: inner join carrying the
                # bound type (one row per distinct type on the pair —
                # Cypher's per-relationship multiplicity) or the path
                # length (shortest-path distance on the closing pair)
                e = er.select(F.col("src").alias(f"_e{i}_src"),
                              F.col("dst").alias(f"_e{i}_dst"), *ecarry)
                result = (result.join(
                    e,
                    (F.col(f"{ep.src}_id") == F.col(f"_e{i}_src"))
                    & (F.col(f"{ep.dst}_id") == F.col(f"_e{i}_dst")))
                    .drop(f"_e{i}_src", f"_e{i}_dst"))
            else:
                # closing edge of a cycle: existence filter, no new cols
                result = result.join(
                    er,
                    (F.col(f"{ep.src}_id") == er["src"])
                    & (F.col(f"{ep.dst}_id") == er["dst"]),
                    "left_semi",
                )
        elif ep.src in bound:
            e = er.select(F.col("src").alias(f"_e{i}_src"),
                          F.col("dst").alias(f"_e{i}_dst"), *ecarry)
            result = result.join(
                e, F.col(f"{ep.src}_id") == F.col(f"_e{i}_src"))
            result = bind(result, ep.dst, F.col(f"_e{i}_dst"))
            result = result.drop(f"_e{i}_src", f"_e{i}_dst")
        else:
            e = er.select(F.col("src").alias(f"_e{i}_src"),
                          F.col("dst").alias(f"_e{i}_dst"), *ecarry)
            result = result.join(
                e, F.col(f"{ep.dst}_id") == F.col(f"_e{i}_dst"))
            result = bind(result, ep.src, F.col(f"_e{i}_src"))
            result = result.drop(f"_e{i}_src", f"_e{i}_dst")
    unbound = set(pats) - bound - aux
    if unbound:
        raise ValueError(f"variables never reached by an edge: {unbound}")
    if edge_distinct:
        ed = edge_distinct_where(edge_pats)
        if ed is not None:
            result = result.filter(ed)
    if where is not None:
        result = result.filter(where)
    return result
