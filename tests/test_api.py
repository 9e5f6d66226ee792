"""HTTP lifecycle wrapper: real socket, real requests, stdlib client."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from graph_database_project_spark.api import create_server

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def server(spark):
    srv = create_server(spark, SF_SMOKE)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _post(url: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    with urllib.request.urlopen(f"{server}/health") as resp:
        body = json.loads(resp.read())
    assert resp.status == 200 and body["status"] == "ok"
    assert body["n_queries"] >= 90


def test_chat_multi_turn(server):
    code, body = _post(f"{server}/chat", {"messages": [
        {"role": "user", "content": "total revenue per nation in region 'ASIA'"},
        {"role": "assistant", "content": "(5 rows)"},
        {"role": "user", "content": "and for EUROPE?"},
    ]})
    assert code == 200
    assert "r_name = 'EUROPE'" in body["sql"]
    assert body["rows"] and {"n_name", "revenue"} <= set(body["rows"][0])
    assert "row(s)" in body["answer"]


def test_chat_empty_messages_is_400(server):
    code, body = _post(f"{server}/chat", {"messages": []})
    assert code == 400 and "No messages" in body["error"]


def test_chat_untranslatable_is_422(server):
    code, body = _post(f"{server}/chat", {"messages": [
        {"role": "user", "content": "please do something unspecified"}]})
    assert code == 422 and "no rule" in body["error"]


def test_query_endpoint_runs_registry_key(server):
    code, body = _post(f"{server}/query", {"name": "q01_pricing_summary"})
    assert code == 200 and body["rows"]
    assert "sum_qty" in body["rows"][0] or len(body["rows"][0]) > 2


def test_query_unknown_key_is_404(server):
    code, body = _post(f"{server}/query", {"name": "nope"})
    assert code == 404
