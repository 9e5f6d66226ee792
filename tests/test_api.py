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
    # relational rules fail first, then the graph fallback — the surfaced
    # error is whichever lifecycle rejected last
    assert code == 422 and "rule matches question" in body["error"]


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


def test_graph_endpoint_seeded_neighborhood(server):
    """?seed=&depth= restricts the payload to the seed's k-hop downward
    neighborhood — the reference's per-query view."""
    with urllib.request.urlopen(
            f"{server}/graph?seed=737-00-1028&depth=1") as r:
        g1 = json.loads(r.read())
    with urllib.request.urlopen(f"{server}/graph") as r:
        g_all = json.loads(r.read())
    assert 0 < len(g1["nodes"]) < len(g_all["nodes"])
    names = {n["name"] for n in g1["nodes"]}
    assert "737-00-1028" in names
    ids = {n["id"] for n in g1["nodes"]}
    assert all(e["src"] in ids and e["dst"] in ids for e in g1["edges"])
    # depth grows monotonically
    with urllib.request.urlopen(
            f"{server}/graph?seed=737-00-1028&depth=3") as r:
        g3 = json.loads(r.read())
    assert len(g3["nodes"]) > len(g1["nodes"])


def test_graph_endpoint_bad_depth_is_400(server):
    try:
        urllib.request.urlopen(f"{server}/graph?seed=x&depth=zap")
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_chat_graph_question_falls_through_to_khop(server):
    """The reference's flagship chat shape — no relational rule grounds it,
    so it must route to the graph lifecycle, not 422."""
    code, body = _post(f"{server}/chat", {"messages": [
        {"role": "user",
         "content": "what is connected to bulletin '737-00-1028'?"}]})
    assert code == 200, body
    assert body["rows"] and body["rows"][0]["seed_name"] == "737-00-1028"
    assert body["rows"][0]["n_connected"] > 0
    assert "graph k-hop" in body["sql"]


def test_visualize_endpoint_serves_selfcontained_html(server):
    import urllib.request

    with urllib.request.urlopen(f"{server}/visualize") as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        html = r.read().decode()
    assert "<canvas" in html and "fetch(\"/graph\" + location.search)" in html
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


def test_explain_eager_on_build_key_carries_note(server):
    """Iterative/memoized keys execute jobs during plan construction; the
    response must say so (ADVICE r04: '/explain claims no execution')."""
    code, body = _post(f"{server}/explain", {"name": "graph_connected_components"})
    assert code == 200 and "Physical Plan" in body["plan"]
    assert "post-checkpoint" in body.get("note", "")
    # a plain relational key stays note-free
    code, body = _post(f"{server}/explain", {"name": "q01_pricing_summary"})
    assert code == 200 and "note" not in body


def test_explain_streaming_key_is_422(server):
    code, body = _post(f"{server}/explain", {"name": "stream_tumbling_hourly"})
    assert code == 422 and "streaming" in body["error"]


def test_explain_batch_twin_of_streaming_family_is_allowed(server):
    """stream_session_window is the batch twin (no drain on build) — its
    plan must be explainable; only drain-on-build keys get 422."""
    code, body = _post(f"{server}/explain", {"name": "stream_session_window"})
    assert code == 200 and "Physical Plan" in body["plan"]


def test_graph_endpoint_community_coloring(server):
    import json
    import urllib.request

    with urllib.request.urlopen(f"{server}/graph?color=community") as r:
        assert r.status == 200
        g = json.loads(r.read())
    comms = [n["community"] for n in g["nodes"]]
    # every node gets a community id and communities are plural (one per
    # depth-1 section across the 3 bulletins)
    assert all(c is not None for c in comms)
    assert len(set(comms)) > 3
    # the community notion must CORRELATE with structure: most edges stay
    # inside one community (the LPA coloring this replaced had 100 % of
    # edges crossing — anti-correlated colors)
    byid = {n["id"]: n["community"] for n in g["nodes"]}
    cross = sum(1 for e in g["edges"] if byid[e["src"]] != byid[e["dst"]])
    assert cross < 0.5 * len(g["edges"]), (cross, len(g["edges"]))
    with urllib.request.urlopen(f"{server}/graph") as r:
        g2 = json.loads(r.read())
    assert all("community" not in n for n in g2["nodes"])

    import urllib.error
    try:
        urllib.request.urlopen(f"{server}/graph?color=zap")
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_chat_search_question_ranks_documents(server):
    """The r05 'search documents for ...' rule is reachable through the
    same HTTP chat lifecycle as every other grammar rule — the reference's
    content-question flow (ask about stored documents, get ranked
    answers) served by BM25 instead of an LLM."""
    code, body = _post(f"{server}/chat", {"messages": [
        {"role": "user", "content": "search documents for 'vector join stream'"},
    ]})
    assert code == 200
    assert "bm25" in body["sql"].lower()
    rows = body["rows"]
    assert rows and {"doc_id", "bm25"} <= set(rows[0])
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_explain_eager_note_accuracy(server):
    """The eager-on-build note must track reality in both directions: the
    lazy graph_degree_histogram (pure aggregation, exempt) stays
    note-free, while a materialize-once r05 key (setop_ops checkpoints
    its epoch sides at construction) carries it."""
    code, body = _post(f"{server}/explain", {"name": "graph_degree_histogram"})
    assert code == 200 and "note" not in body
    code, body = _post(f"{server}/explain", {"name": "setop_ops"})
    assert code == 200 and "note" in body


def test_root_chat_page_roundtrip(server):
    """GET / serves the reference's chat surface (templates/index.html:
    text + image + speech affordances) and the page's wire contract —
    POST /chat with the accumulated transcript — completes a full chat
    round-trip, including the image-marker turn the page emits for an
    attachment."""
    with urllib.request.urlopen(f"{server}/") as resp:
        html = resp.read().decode()
        ctype = resp.headers["Content-Type"]
    assert resp.status == 200 and "text/html" in ctype
    # the three input affordances + the endpoint the page posts to
    for needle in ("id=\"q\"", "type=\"file\"", "SpeechRecognition",
                   "fetch('/chat'", "id=\"log\""):
        assert needle in html, needle
    # drive the page's exact wire shape through /chat
    code, body = _post(f"{server}/chat", {"messages": [
        {"role": "user", "content": "total revenue per nation in region 'ASIA'"},
    ]})
    assert code == 200 and body["rows"] and body["answer"]
    # the image branch prefixes a marker; resolve_question strips it, so
    # the follow-up after an attachment still grounds and answers
    code, body = _post(f"{server}/chat", {"messages": [
        {"role": "user", "content": "total revenue per nation in region 'ASIA'"},
        {"role": "assistant", "content": "(rows)"},
        {"role": "user",
         "content": "[image attached: wing.png, 1234 bytes] and for EUROPE?"},
    ]})
    assert code == 200 and body["rows"], body


def test_chat_image_attachment_roundtrip(server):
    """Verdict-#8 seam: a base64 PNG rides the chat body, the server
    decodes it through the REAL codec (decode_png: zlib, CRC, filters),
    and the decoded descriptor both returns as "media" and prefixes the
    grounded NL answer."""
    import base64

    from graph_database_project_spark.operators.multimodal import (
        _png_bytes, _ppm_dims)

    raw = _png_bytes(40, "the quick brown fox")
    w, h = _ppm_dims(40)
    code, body = _post(f"{server}/chat", {
        "messages": [{"role": "user",
                      "content": "total revenue per nation in region 'ASIA'"}],
        "image_b64": base64.b64encode(raw).decode(),
    })
    assert code == 200, body
    assert body["media"]["format"] == "png"
    assert (body["media"]["width"], body["media"]["height"]) == (w, h)
    assert body["rows"] and {"n_name", "revenue"} <= set(body["rows"][0])
    assert body["answer"].startswith("[attachment: png image")
    assert "row(s)" in body["answer"]  # the NL lifecycle still answered


def test_chat_audio_attachment_media_only(server):
    """A speech capture with no transcript (Web Speech is client-side;
    the reference sends audio nowhere) still gets a decoded answer: WAV
    stats from the stdlib-codec path, no 400."""
    import base64

    from graph_database_project_spark.operators.multimodal import (
        _wav_bytes, _wav_frames, decode_wav)

    raw = _wav_bytes(15, "hello world")
    nch, rate, nfr, dur, rms = decode_wav(raw)
    assert nfr == _wav_frames(15)
    code, body = _post(f"{server}/chat", {
        "messages": [],
        "audio_b64": base64.b64encode(raw).decode(),
    })
    assert code == 200, body
    assert body["media"]["kind"] == "audio"
    assert body["media"]["n_frames"] == nfr
    assert body["media"]["rms"] == rms
    assert body["answer"].startswith("[attachment: wav audio")
    assert body["rows"] == [] and body["sql"] is None


def test_chat_bad_media_payloads(server):
    """Invalid base64 → 400; well-formed base64 of an unrecognizable
    payload → 422 (same contract as an untranslatable question)."""
    import base64

    code, body = _post(f"{server}/chat", {
        "messages": [{"role": "user", "content": "hi"}],
        "media_b64": "not-base64!!",
    })
    assert code == 400 and "base64" in body["error"]
    code, body = _post(f"{server}/chat", {
        "messages": [{"role": "user", "content": "hi"}],
        "media_b64": base64.b64encode(b"GIF89a not supported").decode(),
    })
    assert code == 422 and "unrecognized media" in body["error"]


def test_chat_truncated_wav_is_422(server):
    """Recognized-but-corrupt payloads must be a client error, not a
    server crash: a WAV with an intact RIFF/WAVE header and a cut body
    raises inside the stdlib codec (wave.Error/EOFError), which
    describe_media normalizes to ValueError -> 422 (r09 review)."""
    import base64

    from graph_database_project_spark.operators.multimodal import _wav_bytes

    raw = _wav_bytes(15, "hello world")[:30]  # header survives, body cut
    code, body = _post(f"{server}/chat", {
        "messages": [],
        "audio_b64": base64.b64encode(raw).decode(),
    })
    assert code == 422 and "malformed WAV" in body["error"]
    # explicit empty attachment: rejected (422 via unrecognized), never
    # silently answered as text-only
    code, body = _post(f"{server}/chat", {
        "messages": [{"role": "user", "content": "hi"}],
        "media_b64": "",
    })
    assert code == 422 and "unrecognized media" in body["error"]


def test_pattern_endpoint_compiles_match_text(server):
    """The reference lifecycle over HTTP: pattern text in, bindings out
    (a 2-hop pattern with a property predicate and a RETURN projection)."""
    code, body = _post(f"{server}/pattern", {"pattern":
        "MATCH (sb:ServiceBulletin {docnbr: '737-00-1029'})"
        "-[:HAS_HEADER]->(h:header)-[:HAS_SUBJECT]->(subj:subject) "
        "RETURN sb.docnbr AS docnbr, subj.content AS subject"})
    assert code == 200
    assert body["rows"] == [{"docnbr": "737-00-1029",
                             "subject": "ENGINE FUEL AND CONTROL - "
                                        "Engine Fuel Pump Replacement"}]


def test_pattern_endpoint_optional_and_where(server):
    code, body = _post(f"{server}/pattern", {"pattern":
        "MATCH (ln:LineNumber)-[:included_in]->(a1:Airplane), "
        "(ln)-[:included_in]->(a2:Airplane) WHERE a1.docnbr < a2.docnbr "
        "RETURN DISTINCT a1.docnbr AS doc_a, a2.docnbr AS doc_b"})
    assert code == 200
    pairs = {(r["doc_a"], r["doc_b"]) for r in body["rows"]}
    assert all(a < b for a, b in pairs) and pairs


def test_pattern_endpoint_with_pipeline(server):
    """r12b: a WITH pipeline (aggregate -> HAVING -> re-anchored MATCH)
    served over HTTP — the registry key's exact pattern text."""
    from graph_database_project_spark.operators.motifq import (
        _PIPELINE_PATTERN)

    code, body = _post(f"{server}/pattern", {"pattern": _PIPELINE_PATTERN})
    assert code == 200
    rows = [(r["docnbr"], r["parent"], r["out_deg"]) for r in body["rows"]]
    assert rows == [("737-00-1028", "planning_information", 3),
                    ("737-00-1029", "planning_information", 4),
                    ("737-00-1030", "planning_information", 3)]
    # a WITH query not ending in RETURN keeps the positioned-422 contract
    code, body = _post(f"{server}/pattern",
                       {"pattern": "MATCH (a)-[:T]->(b) WITH a"})
    assert code == 422 and "must end with RETURN" in body["error"]


def test_pattern_endpoint_shortestpath(server):
    """r12b: shortestPath distance semantics over HTTP — the registry
    key's exact pattern text, plus the positioned-422 contract for a
    bare (unbound) shortestPath."""
    from graph_database_project_spark.operators.motifq import (
        _SHORTESTPATH_PATTERN)

    code, body = _post(f"{server}/pattern",
                       {"pattern": _SHORTESTPATH_PATTERN})
    assert code == 200
    rows = {(r["docnbr"], r["hops"]): r["n_nodes"] for r in body["rows"]}
    assert rows[("737-00-1029", 1)] == 6 and rows[("737-00-1028", 4)] == 341
    code, body = _post(f"{server}/pattern", {
        "pattern": "MATCH shortestPath((a)-[*1..2]->(b)) RETURN a.id"})
    assert code == 422 and "path variable" in body["error"]


def test_pattern_endpoint_explain(server):
    """r12b: explain=true returns the physical plan + scale levers
    (exchange/broadcast counts) WITHOUT executing the pattern."""
    code, body = _post(f"{server}/pattern", {
        "pattern": "MATCH (sb:ServiceBulletin)-[:HAS_HEADER]->(h:header) "
                   "RETURN sb.docnbr AS docnbr",
        "explain": True})
    assert code == 200 and "rows" not in body
    assert "BroadcastHashJoin" in body["plan"]
    assert body["n_broadcasts"] >= 1 and body["n_exchanges"] >= 0
    # ADVICE r12: the payload must say the counts come from the
    # PRE-execution plan (AQE may re-plan joins/exchanges at runtime)
    assert "pre-execution" in body["plan_stage"]


def test_pattern_endpoint_malformed_is_422(server):
    code, body = _post(f"{server}/pattern",
                       {"pattern": "MATCH (a)-[r:T*]->(b) RETURN r"})
    assert code == 422
    assert "edge variable" in body["error"]
    code, body = _post(f"{server}/pattern",
                       {"pattern": "MATCH (a)-[:T]->(b) LIMIT 5"})
    assert code == 422


def test_pattern_endpoint_missing_body_is_400(server):
    code, body = _post(f"{server}/pattern", {})
    assert code == 400


def test_pattern_endpoint_edge_distinct_and_injection(server):
    """r12: the two pattern levers over HTTP — edge_distinct toggles
    Cypher relationship-uniqueness (fewer bindings on the shared-line
    shape), and a TERSE unlabeled pattern compiles via catalog label
    injection (it would otherwise still answer, just unbroadcast)."""
    shared = ("MATCH (a1:Airplane)<-[:included_in]-(ln:LineNumber)"
              "-[:included_in]->(a2:Airplane) "
              "RETURN count(*) AS n")
    code, homo = _post(f"{server}/pattern", {"pattern": shared})
    code2, dist = _post(f"{server}/pattern",
                        {"pattern": shared, "edge_distinct": True})
    assert code == 200 and code2 == 200
    assert dist["edge_distinct"] is True
    assert dist["rows"][0]["n"] < homo["rows"][0]["n"]
    # terse text: no labels anywhere — the catalog proves them
    code3, body = _post(f"{server}/pattern", {"pattern":
        "MATCH (sb {docnbr: '737-00-1029'})-[:HAS_HEADER]->(h)"
        "-[:HAS_SUBJECT]->(subj) RETURN subj.content AS subject"})
    assert code3 == 200
    assert "ENGINE FUEL" in body["rows"][0]["subject"]


def test_pattern_endpoint_r13_surface(server):
    """r13: collect(), UNION, multi-hop optional chains, and match-time
    optional WHERE all reachable over HTTP — the registry keys' exact
    pattern texts, plus the positioned-422 contract for the new
    rejects."""
    from graph_database_project_spark.operators.motifq import (
        _COLLECT_PATTERN, _OPTIONAL_CHAIN_PATTERN,
        _OPTIONAL_WHERE_PATTERN, _UNION_PATTERN)

    code, body = _post(f"{server}/pattern", {"pattern": _UNION_PATTERN})
    assert code == 200
    assert sorted(r["docnbr"] for r in body["rows"]) == \
        ["737-00-1028", "737-00-1029"]
    code, body = _post(f"{server}/pattern", {"pattern": _COLLECT_PATTERN})
    assert code == 200 and len(body["rows"]) == 49
    assert all(";" in r["docs"] for r in body["rows"])  # flattened lists
    code, body = _post(f"{server}/pattern",
                       {"pattern": _OPTIONAL_CHAIN_PATTERN})
    assert code == 200
    code, body = _post(f"{server}/pattern",
                       {"pattern": _OPTIONAL_WHERE_PATTERN})
    assert code == 200 and len(body["rows"]) == 6
    # 422 contract: mixed UNION/UNION ALL, and a NOT in an optional
    # match-time WHERE
    code, body = _post(f"{server}/pattern", {
        "pattern": "MATCH (a)-[:T]->(b) RETURN a.name AS n "
                   "UNION ALL MATCH (c)-[:U]->(d) RETURN c.name AS n "
                   "UNION MATCH (e)-[:V]->(f) RETURN e.name AS n"})
    assert code == 422 and "cannot mix" in body["error"]
    code, body = _post(f"{server}/pattern", {
        "pattern": "MATCH (a)-[:T]->(b) OPTIONAL MATCH (b)-[:U]->(c) "
                   "WHERE NOT (b)-[:V]->(z) RETURN a.name"})
    assert code == 422 and "match-time" in body["error"]


def test_pattern_endpoint_explain_final(server):
    """r13 (ADVICE): explain='final' executes the pattern and reads the
    AQE-finalized plan from the same DataFrame, so the counts reflect
    the executed plan (isFinalPlan=true), not the static one."""
    pat = ("MATCH (sb:ServiceBulletin)-[:HAS_HEADER]->(h:header) "
           "RETURN sb.docnbr AS docnbr")
    code, body = _post(f"{server}/pattern", {"pattern": pat,
                                             "explain": "final"})
    assert code == 200 and "rows" not in body
    assert "final" in body["plan_stage"]
    assert "isFinalPlan=true" in body["plan"]
    assert body["n_broadcasts"] >= 1


def test_pattern_endpoint_r14_surface(server):
    """Numeric expressions, exists(), and CASE served over HTTP — the
    registry keys' exact pattern text plus a positioned 422 for a
    float in an int-only position."""
    from graph_database_project_spark.operators.motifq import (
        _CASE_PATTERN, _EXISTS_PATTERN, _NUMERIC_PATTERN)

    code, body = _post(f"{server}/pattern", {"pattern": _NUMERIC_PATTERN})
    assert code == 200
    assert [(r["docnbr"], r["hours"]) for r in body["rows"]] == [
        ("737-00-1028", "50"), ("737-00-1029", "30")]

    code, body = _post(f"{server}/pattern", {"pattern": _EXISTS_PATTERN})
    assert code == 200
    assert all(r["parent"] == "work_instructions" for r in body["rows"])
    assert len(body["rows"]) == 3

    code, body = _post(f"{server}/pattern", {"pattern": _CASE_PATTERN})
    assert code == 200
    assert [r["band"] for r in body["rows"]] == ["heavy", "light", "medium"]

    code, body = _post(f"{server}/pattern", {"pattern":
        "MATCH (a:task)-[:HAS_NAME]->(b) RETURN b.content AS c LIMIT 1.5"})
    assert code == 422
    assert "integer" in body["error"] and "position" in body["error"]
