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


def test_graph_endpoint_serves_nodes_and_edges(server):
    import json
    import urllib.request

    with urllib.request.urlopen(f"{server}/graph") as r:
        assert r.status == 200
        g = json.loads(r.read())
    assert g["nodes"] and g["edges"]
    ids = {n["id"] for n in g["nodes"]}
    labels = {n["label"] for n in g["nodes"]}
    assert "ServiceBulletin" in labels
    # every served edge endpoint must resolve to a served node
    assert all(e["src"] in ids and e["dst"] in ids for e in g["edges"])
    # completeness: the full reference corpus fits under the caps — serve
    # ALL of it (golden node/edge totals from xml_golden)
    from graph_database_project_spark.operators.xml_golden import (
        GOLDEN_XML_LABEL_COUNTS_ROWS, GOLDEN_XML_REL_SIGNATURES_ROWS)

    assert len(g["nodes"]) == sum(n for _, n in GOLDEN_XML_LABEL_COUNTS_ROWS)
    assert len(g["edges"]) == sum(n for *_, n in GOLDEN_XML_REL_SIGNATURES_ROWS)


def test_visualize_endpoint_serves_selfcontained_html(server):
    import urllib.request

    with urllib.request.urlopen(f"{server}/visualize") as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        html = r.read().decode()
    assert "<canvas" in html and "fetch(\"/graph\")" in html
    # self-contained: no external script/style fetches (reference pulls
    # neovis.js from a CDN; this page must work offline)
    assert "http://" not in html and "https://" not in html


def test_explain_endpoint_returns_physical_plan(server):
    code, body = _post(f"{server}/explain", {"name": "q01_pricing_summary"})
    assert code == 200 and body["name"] == "q01_pricing_summary"
    assert "Physical Plan" in body["plan"]
    # the audited plan properties are visible through the API
    assert "HashAggregate" in body["plan"]


def test_explain_unknown_key_is_404(server):
    code, body = _post(f"{server}/explain", {"name": "nope"})
    assert code == 404


def test_explain_streaming_key_is_422(server):
    code, body = _post(f"{server}/explain", {"name": "stream_tumbling_hourly"})
    assert code == 422 and "streaming" in body["error"]


def test_explain_batch_twin_of_streaming_family_is_allowed(server):
    """stream_session_window is the batch twin (no drain on build) — its
    plan must be explainable; only drain-on-build keys get 422."""
    code, body = _post(f"{server}/explain", {"name": "stream_session_window"})
    assert code == 200 and "Physical Plan" in body["plan"]
