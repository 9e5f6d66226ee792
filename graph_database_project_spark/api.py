"""Thin HTTP lifecycle wrapper — the reference's Flask app surface
(first-graph.py:40-75: POST /gpt4-chat taking {"messages": [...]};
Procfile:1 gunicorn) re-expressed with only the stdlib so it runs in this
container. The engine work all happens in plans/nl2query.py; this module
is transport only.

Routes:
  GET  /health    → {"status": "ok", "n_queries": N}
  GET  /graph     → {"nodes": [...], "edges": [...]} of the ingested
                    bulletin graph (capped; visualize.graph_payload)
  GET  /visualize → self-contained HTML canvas force-layout of /graph —
                    the reference's templates/visualise.html (neovis.js)
                    re-expressed with zero external dependencies
  POST /chat    → body {"messages": [{"role": "user", "content": "..."}]}
                  runs the multi-turn NL lifecycle (answer_chat) and
                  returns {"sql", "rows", "answer"}
  POST /query   → body {"name": "<registry key>"} runs a registered
                  query and returns its first ROW_CAP rows
  POST /explain → body {"name": "<registry key>"} returns the query's
                  formatted physical plan without executing the batch
                  plan (stream_* keys are rejected with 422: their
                  construction IS execution — an availableNow drain)

Not a production server: single SparkSession, threaded handler, no auth —
the same scope as the reference's demo app. A real deployment would put
Spark Connect behind this instead of a driver-local session.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

ROW_CAP = 100


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
    from .plans.nl2query import answer_chat, explain_result
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
            if self.path == "/health":
                self._send(200, {"status": "ok", "n_queries": len(queries)})
            elif self.path == "/graph":
                from .visualize import graph_payload
                try:
                    self._send(200, graph_payload(spark))
                except Exception as exc:  # pragma: no cover - defensive
                    self._send(500, {"error": f"{type(exc).__name__}: {exc}"})
            elif self.path == "/visualize":
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
                    if not history:
                        self._send(400, {"error": "No messages provided"})
                        return
                    sql, df = answer_chat(spark, sf_dir, history)
                    collected = df.limit(ROW_CAP).collect()
                    self._send(200, {
                        "sql": sql,
                        "rows": _serialize(collected),
                        "answer": explain_result(history[-1], collected),
                    })
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
                    self._send(200, {"name": name, "plan": plan})
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
