import sys; sys.path.insert(0, "/root/repo")
from graph_database_project_spark.session import get_spark
from graph_database_project_spark.registry import all_queries
from pyspark.sql import types as T
spark = get_spark("golden-gen2")
qs = all_queries()
names = ["xml_label_counts", "xml_rel_signatures", "xml_khop_flagship",
         "xml_shared_linenumbers", "xml_subtree_content", "xml_title_hierarchy",
         "xml_connected_components",
         # r10: declarative motif-matcher keys (operators/motifq.py) —
         # same static corpus, same golden-constant discipline
         "graph_motif_chain", "graph_motif_fanout", "graph_motif_shared",
         "graph_motif_negation", "graph_motif_varlength",
         # r11: MATCH-string front-end keys (parse_match -> match_motif)
         "graph_motif_parsed", "graph_motif_optional",
         # r12: edge-distinctness mode + edge variables, from text
         "graph_motif_edge_distinct", "graph_motif_edge_var",
         # r12: RETURN aggregates (implicit grouping) from text
         "graph_motif_aggregate",
         # r12b: WITH pipeline stages (aggregate -> HAVING -> re-anchor)
         "graph_motif_pipeline",
         # r12b: shortestPath distance semantics (length(p) histogram)
         "graph_motif_shortestpath",
         # r12b: string predicates (CONTAINS / STARTS WITH)
         "graph_motif_textpred",
         # r13: collect() list aggregate (WITH-composed, flattened cells)
         "graph_motif_collect",
         # r13: multi-hop OPTIONAL MATCH chain (all-or-nothing nulls)
         "graph_motif_optional_chain",
         # r13: UNION between MATCH queries (whole-result dedup)
         "graph_motif_union",
         # r13: match-time WHERE on OPTIONAL MATCH (Cypher binding)
         "graph_motif_optional_where",
         # r14: numeric WHERE expressions (casts + arithmetic + floats)
         "graph_motif_numeric",
         # r14: positive existential pattern predicate (left-semi)
         "graph_motif_exists",
         # r14: whole-node collect() ('id:name' cells)
         "graph_motif_collect_node",
         # r14: searched CASE in RETURN (implicit-grouping key)
         "graph_motif_case",
         # r14b: aggregates over value expressions (sum/avg of casts)
         "graph_motif_numeric_agg",
         # r15: parenthesized grouping + ORDER BY expression
         "graph_motif_weighted",
         # r15: conditional aggregates (sum(CASE WHEN ...))
         "graph_motif_cond_agg",
         # r15: string concat '+', size(string), size(collect(...))
         "graph_motif_size_concat",
         # r15b: boolean NOT, simple CASE, %, toString, ORDER BY agg
         "graph_motif_boolexpr"]
out = []
out.append('"""Golden-constant DuckDB oracles for the sf-invariant ``xml_*`` queries.')
out.append('')
out.append("The xml_* queries read the reference's STATIC 3-document corpus")
out.append('(`boeing_service_bulletin_{1,2,3}.xml`) and take no input from sf_dir, so')
out.append('their exact outputs are fixed. Each oracle below pins those hand-verified')
out.append('values as a constant VALUES table — a true value check (any behavior change')
out.append('in shred/traverse/store hash-mismatches at the driver), the same goldens')
out.append('tests/test_graph_xml.py asserts, now enforced end-to-end. Regenerate after')
out.append('an INTENDED semantic change with scripts/gen_xml_golden.py.')
out.append('')
out.append('``xml_subtree_content`` participates via md5(prose) + length cells (see')
out.append('q_xml_subtree_content) so its constant table stays reviewable.')
out.append('"""')
out.append('')
out.append('from __future__ import annotations')
out.append('')

def sqlt(dt):
    if isinstance(dt, T.LongType): return "BIGINT"
    if isinstance(dt, T.StringType): return "VARCHAR"
    if isinstance(dt, T.DoubleType): return "DOUBLE"
    raise ValueError(dt)

for n in names:
    df = qs[n](spark, "/root/testdata/sf0.01")
    cols = [(f.name, sqlt(f.dataType)) for f in df.schema.fields]
    rows = [tuple(r) for r in df.collect()]
    var = "GOLDEN_" + n.upper()
    out.append(f"{var}_COLS = {cols!r}")
    out.append(f"{var}_ROWS = [")
    for r in sorted(rows):
        out.append(f"    {r!r},")
    out.append("]")
    out.append("")

out.append('''
def _values_sql(cols, rows):
    """Render a typed constant table: SELECT * FROM (VALUES ...) t(cols)."""
    def lit(v, t):
        if v is None:
            return f"CAST(NULL AS {t})"
        if t == "BIGINT":
            return f"CAST({int(v)} AS BIGINT)"
        if t == "DOUBLE":
            return f"CAST({float(v)!r} AS DOUBLE)"
        return "'" + str(v).replace("'", "''") + "'"
    vals = ",\\n  ".join(
        "(" + ", ".join(lit(v, t) for (_, t), v in zip(cols, row)) + ")"
        for row in rows
    )
    names = ", ".join(c for c, _ in cols)
    return f"SELECT * FROM (VALUES\\n  {vals}\\n) AS t({names})"


ORACLE = {
''')
for n in names:
    var = "GOLDEN_" + n.upper()
    out.append(f'    "{n}": _values_sql({var}_COLS, {var}_ROWS),')
out.append("}")
open("/root/repo/graph_database_project_spark/operators/xml_golden.py", "w").write("\n".join(out) + "\n")
print("written", sum(len(l) for l in out), "chars")
spark.stop()
