"""Thin HTTP lifecycle wrapper — the reference's Flask app surface
(first-graph.py:40-75: POST /gpt4-chat taking {"messages": [...]};
Procfile:1 gunicorn) re-expressed with only the stdlib so it runs in this
container. The engine work all happens in plans/nl2query.py; this module
is transport only.

Routes:
  GET  /health    → {"status": "ok", "n_queries": N}
  GET  /graph     → {"nodes": [...], "edges": [...]} of the ingested
                    bulletin graph (capped; visualize.graph_payload).
                    Optional ?seed=<name>&depth=<k> restricts to that
                    node's k-hop downward neighborhood — the reference's
                    per-query view (templates/visualise.html:13-17)
  GET  /visualize → self-contained HTML canvas force-layout of /graph —
                    the reference's templates/visualise.html (neovis.js)
                    re-expressed with zero external dependencies;
                    forwards ?seed=&depth= to /graph
  POST /chat    → body {"messages": [{"role": "user", "content": "..."}]}
                  runs the multi-turn NL lifecycle (answer_chat) and
                  returns {"sql", "rows", "answer"}; graph-shaped
                  questions ("what is connected to X") that no relational
                  rule grounds fall through to the graph lifecycle
                  (answer_graph → k-hop expansion over the bulletin graph).
                  An optional "media_b64" (aliases: "image_b64",
                  "audio_b64") attaches a base64 payload — decoded through
                  the REAL codec battery (multimodal.describe_media: png/
                  bmp/ppm/wav/y4m), its descriptor returned as "media" and
                  woven into the answer. This is the reference front-end's
                  image-upload / speech-input seam (static/script.js:19-67,
                  129-173) with an actually-implemented server side (the
                  reference's /gpt4-image route never existed); speech
                  arrives as a WAV whose transcript, when the browser has
                  one (Web Speech is client-side), is just another text
                  message. A media-only body (no text) is answered with
                  the decoded descriptor alone.
  POST /pattern → body {"pattern": "MATCH (a:L)-[:T]->(b) RETURN …"}
                  compiles the MATCH text (graph/pattern.py) against
                  the bulletin graph and returns the first ROW_CAP
                  bindings; syntax outside the supported subset is a
                  422 with the parser's positioned message — the
                  reference's NL→pattern→result lifecycle end-to-end
                  over HTTP (first-graph.py:141,148-157)
  POST /query   → body {"name": "<registry key>"} runs a registered
                  query and returns its first ROW_CAP rows
  POST /explain → body {"name": "<registry key>"} returns the query's
                  formatted physical plan. stream_* keys are rejected
                  with 422 (their construction IS execution — an
                  availableNow drain). Iterative/memoized batch keys
                  (k-means index build, XML ingest, checkpointed loops)
                  DO run real Spark jobs during plan construction, and a
                  checkpointed loop's returned plan is the post-
                  checkpoint scan — such responses carry an explicit
                  "note" saying so

Not a production server: single SparkSession, threaded handler, no auth —
the same scope as the reference's demo app. A real deployment would put
Spark Connect behind this instead of a driver-local session.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

ROW_CAP = 100

# Batch keys whose query CONSTRUCTION executes Spark jobs (session-memoized
# builds and eager-checkpointed iterative loops), so /explain on them is not
# side-effect-free and — for checkpointed loops — the plan it returns is the
# post-checkpoint scan, not the loop body. Matched by exact key or prefix.
EAGER_ON_BUILD_KEYS = {"sim_ivf_topk", "sim_ivfpq_topk",
                       "embedding_pca_power", "dedup_minhash_lsh",
                       "quantile_sketch_merge",  # checkpointed 1-row bounds
                       "quantile_sketch_grouped",  # checkpointed bounds + day-hist
                       "theta_sketch_setops",  # checkpointed final K-row sketch
                       "drift_histogram_tv",  # checkpointed bounds + slice hist
                       "dedup_prefix_filter",  # checkpointed candidate pairs
                       "nl2query_followup",
                       # r05 materialize-once refactors: these checkpoint a
                       # multi-consumer derived relation at construction
                       "setop_ops", "mutation_merge_upsert",
                       "sim_knn_per_vector", "dedup_embedding_cosine",
                       "multimodal_phash_neardup", "text_cooccur_pmi",
                       "text_bm25_search", "text_unigram_logprob",
                       "semantic_decontaminate", "join_bloom_prune",
                       "join_size_estimate",  # checkpointed key base
                       "embedding_mrl_audit",  # checkpointed winner relation
                       "ts_lttb_downsample",  # checkpointed bucket anchors
                       "cardinality_hll_grouped",  # checkpointed registers
                       "text_hybrid_rrf",  # checkpointed per-doc tf sidecar
                       "assoc_basket_rules",  # checkpointed (order, brand) relation
                       "ts_cusum_changepoint",  # checkpointed day series
                       "bpe_learn_merges",  # checkpointed vocab + per-round winners
                       "bpe_token_count",  # same learn loop at construction
                       "ts_seasonal_decompose",  # checkpointed day series
                       "ts_rollup_incremental",
                       # r15 materialize-once refactors (same family)
                       "funnel_retention_cohorts",  # checkpointed activity + cohorts
                       "q02_min_cost_supplier",  # checkpointed unit-cost agg
                       "vocab_growth_heaps",  # checkpointed doc_id bounds
                       "sim_ivf_recall_curve"}  # checkpointed probe + candidates
# every graph_ key runs an eager-checkpointed loop or edge materialization
# EXCEPT the pure-aggregation degree histogram (lazy — exact-key exempt)
EAGER_ON_BUILD_PREFIXES = ("xml_", "graph_")
EAGER_EXEMPT_KEYS = {"graph_degree_histogram"}

EAGER_ON_BUILD_NOTE = (
    "plan construction for this query executes Spark jobs (memoized index/"
    "ingest build or eager-checkpointed iterative loop); for checkpointed "
    "loops the plan shown is the post-checkpoint scan, not the loop body"
)


def _media_sentence(media: dict) -> str:
    """Deterministic one-liner describing a decoded attachment."""
    if media["kind"] == "image":
        return (f"[attachment: {media['format']} image "
                f"{media['width']}x{media['height']}, "
                f"pixel mean {media['pixel_mean']}]")
    if media["kind"] == "audio":
        return (f"[attachment: {media['format']} audio "
                f"{media['duration_s']}s @ {media['sample_rate']} Hz, "
                f"{media['n_channels']} ch, rms {media['rms']}]")
    return (f"[attachment: {media['format']} video "
            f"{media['width']}x{media['height']}, "
            f"{media['n_frames']} frames @ {media['fps']} fps]")


def _eager_on_build(name: str) -> bool:
    if name in EAGER_EXEMPT_KEYS:
        return False
    return name in EAGER_ON_BUILD_KEYS or name.startswith(EAGER_ON_BUILD_PREFIXES)


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


def _serialize(rows) -> list[dict]:
    return [{k: _jsonable(v) for k, v in r.asDict().items()} for r in rows]


def _rows(df) -> list[dict]:
    return _serialize(df.limit(ROW_CAP).collect())


def create_server(spark: SparkSession, sf_dir: str,
                  host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the server; caller runs serve_forever() /
    handle_request(). port=0 binds an ephemeral port (server.server_port)."""
    from .plans.nl2query import answer_chat, explain_result, resolve_question
    from .registry import all_queries

    queries = all_queries()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test output
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            from urllib.parse import parse_qs, urlsplit

            parts = urlsplit(self.path)
            if parts.path == "/":
                # the reference's chat surface (templates/index.html) —
                # self-contained static page posting to /chat
                from .chat_page import CHAT_HTML
                body = CHAT_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif parts.path == "/health":
                self._send(200, {"status": "ok", "n_queries": len(queries)})
            elif parts.path == "/graph":
                from .visualize import graph_payload
                qargs = parse_qs(parts.query)
                seed = (qargs.get("seed") or [None])[0]
                color = (qargs.get("color") or ["label"])[0]
                if color not in ("label", "community"):
                    self._send(
                        400, {"error": "color must be 'label' or 'community'"})
                    return
                try:
                    depth = int((qargs.get("depth") or ["3"])[0])
                    if not 1 <= depth <= 6:
                        raise ValueError
                except ValueError:
                    self._send(400, {"error": "depth must be an int in [1, 6]"})
                    return
                try:
                    self._send(200, graph_payload(spark, seed=seed, depth=depth,
                                                  color=color))
                except Exception as exc:  # pragma: no cover - defensive
                    self._send(500, {"error": f"{type(exc).__name__}: {exc}"})
            elif parts.path == "/visualize":
                from .visualize import VISUALIZE_HTML
                body = VISUALIZE_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(data, dict):
                    raise ValueError("body must be a JSON object")
            except ValueError:  # bad Content-Length, bad JSON, non-object body
                self._send(400, {"error": "invalid JSON object body"})
                return
            try:
                if self.path == "/chat":
                    messages = data.get("messages") or []
                    history = [m["content"] for m in messages
                               if m.get("role", "user") == "user"]
                    media = None
                    # presence-based, not truthiness: an explicit empty
                    # attachment must be REJECTED (422 via describe_media),
                    # not silently answered as text-only (r09 review)
                    b64 = next((data[k] for k in
                                ("media_b64", "image_b64", "audio_b64")
                                if k in data), None)
                    if b64 is not None:
                        import base64 as _b64

                        from .operators.multimodal import describe_media
                        try:
                            raw = _b64.b64decode(b64, validate=True)
                        except Exception:
                            self._send(400, {"error": "invalid base64 in "
                                                      "media payload"})
                            return
                        media = describe_media(raw)  # ValueError → 422
                    if media is not None and not history:
                        # media-only turn: the decoded descriptor IS the
                        # answer (no question to ground)
                        self._send(200, {
                            "sql": None, "rows": [], "media": media,
                            "answer": _media_sentence(media),
                        })
                        return
                    if not history:
                        self._send(400, {"error": "No messages provided"})
                        return
                    try:
                        sql, df = answer_chat(spark, sf_dir, history)
                    except ValueError:
                        # no relational rule grounds the question — try the
                        # graph lifecycle (the reference's flagship chat is
                        # exactly this shape: "what is connected to X")
                        from .operators.xmlq import _store
                        from .plans.nl2query import answer_graph
                        sql, df = ("-- graph k-hop expansion (no SQL form)",
                                   answer_graph(spark, _store(spark),
                                                resolve_question(history)))
                    collected = df.limit(ROW_CAP).collect()
                    answer = explain_result(history[-1], collected)
                    payload = {
                        "sql": sql,
                        "rows": _serialize(collected),
                        "answer": (f"{_media_sentence(media)} {answer}"
                                   if media is not None else answer),
                    }
                    if media is not None:
                        payload["media"] = media
                    self._send(200, payload)
                elif self.path == "/pattern":
                    # the reference's NL→pattern→result lifecycle over
                    # HTTP, minus the LLM: the body carries the MATCH
                    # text its GPT seam would emit (first-graph.py:141)
                    # and the parser+compiler answer it. Malformed
                    # patterns raise PatternSyntaxError (a ValueError) —
                    # the outer handler turns that into the 422 contract.
                    pattern = data.get("pattern")
                    if not pattern or not isinstance(pattern, str):
                        self._send(400, {"error":
                                         "body needs a 'pattern' string"})
                        return
                    # r12: optional Cypher relationship-uniqueness mode
                    # (per MATCH clause) + catalog label injection for
                    # terse unlabeled text — both levers of the pattern
                    # surface reachable over HTTP
                    edge_distinct = bool(data.get("edge_distinct", False))
                    from .graph.pattern import match_pattern
                    from .operators.motifq import _label_stats
                    from .operators.xmlq import _store
                    from .plans.nl2query import _catalog_rel_signatures
                    st = _store(spark)
                    df = match_pattern(
                        st.nodes, st.edges, pattern,
                        edge_distinct=edge_distinct,
                        rel_signatures=_catalog_rel_signatures(spark, st),
                        label_counts=_label_stats(spark),
                        edges_deduped=True)
                    payload = {"pattern": pattern,
                               "edge_distinct": edge_distinct}
                    if data.get("explain"):
                        # r12b: plan introspection without execution —
                        # the §7g/§7h scale levers (broadcasts, exchange
                        # count) reviewable over HTTP for any pattern.
                        # r13 (ADVICE): explain="final" EXECUTES the
                        # pattern (collect on the same DataFrame — a
                        # sink write would run its own execution and
                        # leave this frame's isFinalPlan false) and
                        # reads the AQE-finalized plan, so the counts
                        # reflect what actually ran.
                        import re as _re
                        final = data.get("explain") == "final"
                        if final:
                            df.collect()
                        plan = (df._jdf.queryExecution().executedPlan()
                                .toString())
                        payload["plan"] = plan[:20000]
                        payload["n_exchanges"] = len(_re.findall(
                            r"Exchange hashpartitioning", plan))
                        payload["n_broadcasts"] = plan.count(
                            "BroadcastHashJoin")
                        # the counts come from the PRE-EXECUTION plan
                        # (AQE isFinalPlan=false) — at runtime AQE may
                        # convert shuffle joins to broadcast or coalesce
                        # exchanges, so treat them as upper bounds
                        # (ADVICE r12; the repo's own plan-reading rule)
                        payload["plan_stage"] = (
                            "final (post-execution; AQE-finalized "
                            "counts)" if final else
                            "initial (pre-execution; AQE may re-plan — "
                            "n_exchanges/n_broadcasts are the static "
                            "plan's counts, not necessarily the "
                            "executed ones)")
                    else:
                        payload["rows"] = _rows(df)
                    self._send(200, payload)
                elif self.path == "/query":
                    name = data.get("name")
                    if name not in queries:
                        self._send(404, {"error": f"unknown query {name!r}"})
                        return
                    self._send(200, {"name": name,
                                     "rows": _rows(queries[name](spark, sf_dir))})
                elif self.path == "/explain":
                    name = data.get("name")
                    if name not in queries:
                        self._send(404, {"error": f"unknown query {name!r}"})
                        return
                    from .operators.streamq import DRAIN_ON_BUILD_KEYS
                    if name in DRAIN_ON_BUILD_KEYS:
                        # these queries drain availableNow during
                        # construction — "explaining" one would execute it
                        # and leak a memory-sink table per call; their
                        # per-microbatch shape is audited in tests instead
                        self._send(422, {"error":
                                         "streaming queries execute on build; "
                                         "no post-hoc plan available"})
                        return
                    df = queries[name](spark, sf_dir)
                    plan = spark._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted")
                    payload = {"name": name, "plan": plan}
                    if _eager_on_build(name):
                        payload["note"] = EAGER_ON_BUILD_NOTE
                    self._send(200, payload)
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except ValueError as exc:  # untranslatable question, bad identifier
                self._send(422, {"error": str(exc)})
            except Exception as exc:  # pragma: no cover - defensive
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:  # pragma: no cover - manual entry point
    import os

    from .io import DEFAULT_SF_DIR
    from .session import get_spark

    spark = get_spark("gdp-api")
    server = create_server(spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                                 DEFAULT_SF_DIR),
                           port=int(os.environ.get("PORT", 8080)))
    print(f"listening on {server.server_address}")
    server.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
