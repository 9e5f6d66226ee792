"""Graph visualization page — the engine-side twin of the reference's
``templates/visualise.html`` (neovis.js bound to a Neo4j bolt URL,
visualise.html:7) and its node/edge browsing story. The reference pulls
rendering from a CDN and data from live Neo4j; this container has neither,
so the page is fully self-contained: vanilla-JS canvas force-directed
layout, data from the engine's own ``GET /graph`` JSON (nodes/edges of the
ingested bulletin graph, served by api.py).

Transport-layer only — no query logic lives here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

# Caps keep the demo page responsive while covering the full reference
# corpus (687 nodes / 2632 edges) with headroom — the reference renders it
# without paging either.
NODE_CAP = 800
EDGE_CAP = 4000


def graph_payload(spark: SparkSession, seed: str | None = None,
                  depth: int = 3, color: str = "label") -> dict:
    """Nodes/edges of the ingested reference graph as JSON-ready dicts.
    Label = first label (the shredder's primary), defaulted server-side for
    label-less nodes (a null label would reach the page's hue() and blank
    the draw loop). Capped deterministically by id so node/edge sets stay
    consistent. Edges are restricted to the served node set BEFORE the cap,
    so capping can never leave a served node spuriously disconnected.

    With ``seed`` set, the node set is restricted to the seed's k-hop
    downward neighborhood (GraphStore.khop_from — the reference's per-query
    view, templates/visualise.html:13-17, which renders the chat query's
    result subgraph rather than the whole graph).

    ``color='community'`` attaches a structural community id so the page
    colors document STRUCTURE instead of XML tag labels. Community = the
    depth-1 section subtree a node belongs to (min section id when a
    shared entity node sits under several), computed by k_hop over the
    downward (HAS_*) containment edges from each bulletin's direct
    children. Label propagation was measured and rejected for THIS graph:
    a document hierarchy is tree/bipartite-shaped, and synchronous LPA
    oscillates on bipartite structure — after its fixed rounds every
    single edge ended cross-community (687 nodes, 69 labels, 2632/2632
    edges crossing), i.e. colors anti-correlated with structure. LPA
    remains the right tool on graphs with odd cycles (its registered
    query runs on one); subtree membership is the right community notion
    for a containment hierarchy."""
    from .operators.xmlq import _store

    st = _store(spark)
    base = st.nodes
    if seed is not None:
        reached = st.khop_from(F.col("name") == seed, depth=depth) \
            .select(F.col("node").alias("id")).distinct()
        base = base.join(reached, "id", "left_semi")
    sel = base.select(
        "id",
        F.coalesce(F.element_at("labels", 1), F.lit("node")).alias("label"),
        "name")
    if color == "community":
        from .graph.traverse import k_hop

        # downward containment = includes/effects plus the HAS_<tag>
        # family; their inverses (included_in / IS_PART_OF / affected_by)
        # would climb back to the root and merge every section
        down = (st.edges.filter(
            F.col("rel_type").startswith("HAS_")
            | F.col("rel_type").isin("includes", "effects"))
            .select("src", "dst"))
        roots = (st.nodes
                 .filter(F.array_contains("labels", "ServiceBulletin"))
                 .select(F.col("id").alias("src")))
        seeds = (down.join(roots, "src")
                 .select(F.col("dst").alias("seed"),
                         F.col("dst").alias("node")).distinct())
        comm = (k_hop(seeds, down, depth=12)
                .groupBy("node").agg(F.min("seed").alias("community"))
                .withColumnRenamed("node", "id"))
        sel = (sel.join(comm, "id", "left")
               .withColumn("community",
                           F.coalesce("community", F.col("id"))))
    nodes = sel.orderBy("id").limit(NODE_CAP).collect()
    ids = {r["id"] for r in nodes}
    edges = (
        st.edges.select("src", "dst", "rel_type")
        .filter(F.col("src").isin(list(ids)) & F.col("dst").isin(list(ids)))
        .orderBy("src", "dst", "rel_type").limit(EDGE_CAP).collect()
    )
    def node_json(r):
        d = {"id": r["id"], "label": r["label"], "name": r["name"]}
        if color == "community":
            d["community"] = r["community"]
        return d
    return {
        "nodes": [node_json(r) for r in nodes],
        "edges": [{"src": r["src"], "dst": r["dst"], "rel": r["rel_type"]}
                  for r in edges],
    }


VISUALIZE_HTML = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>Graph view</title>
<style>
  body { margin: 0; font-family: sans-serif; background: #111; color: #ddd; }
  #bar { padding: 6px 10px; background: #1b1b1b; font-size: 13px; }
  #cv { display: block; }
  #tip { position: fixed; pointer-events: none; background: #000c;
         padding: 2px 6px; border-radius: 3px; font-size: 12px;
         visibility: hidden; }
</style>
</head>
<body>
<div id="bar">bulletin graph &mdash; drag to pan, wheel to zoom, hover for names</div>
<canvas id="cv"></canvas>
<div id="tip"></div>
<script>
"use strict";
const cv = document.getElementById("cv"), ctx = cv.getContext("2d");
const tip = document.getElementById("tip");
let W, H; function size() { W = cv.width = innerWidth; H = cv.height = innerHeight - 30; }
size(); addEventListener("resize", size);

// deterministic label -> hue (null/missing label tolerated: server defaults
// it, but a stale payload must not blank the whole draw loop)
function hue(s) { let h = 0; for (const c of s || "") h = (h * 31 + c.charCodeAt(0)) % 360; return h; }

let nodes = [], edges = [], byId = new Map();
let panX = 0, panY = 0, zoom = 1, dragging = false, lx = 0, ly = 0;

// forward ?seed=&depth= so /visualize?seed=X renders that neighborhood
fetch("/graph" + location.search).then(r => r.json()).then(g => {
  nodes = g.nodes.map((n, i) => ({
    ...n,
    x: W / 2 + Math.cos(i * 2.399963) * (8 + 14 * Math.sqrt(i)),
    y: H / 2 + Math.sin(i * 2.399963) * (8 + 14 * Math.sqrt(i)),
    vx: 0, vy: 0,
  }));
  byId = new Map(nodes.map(n => [n.id, n]));
  edges = g.edges.filter(e => byId.has(e.src) && byId.has(e.dst));
  requestAnimationFrame(tick);
});

function forces() {
  // spring along edges
  for (const e of edges) {
    const a = byId.get(e.src), b = byId.get(e.dst);
    const dx = b.x - a.x, dy = b.y - a.y;
    const d = Math.hypot(dx, dy) || 1, f = (d - 60) * 0.004;
    a.vx += f * dx / d; a.vy += f * dy / d;
    b.vx -= f * dx / d; b.vy -= f * dy / d;
  }
  // grid-bucketed repulsion (O(n) per frame, not O(n^2))
  const cell = 80, grid = new Map();
  for (const n of nodes) {
    const k = (n.x / cell | 0) + ":" + (n.y / cell | 0);
    (grid.get(k) || grid.set(k, []).get(k)).push(n);
  }
  for (const n of nodes) {
    const cx = n.x / cell | 0, cy = n.y / cell | 0;
    for (let gx = cx - 1; gx <= cx + 1; gx++)
      for (let gy = cy - 1; gy <= cy + 1; gy++)
        for (const m of grid.get(gx + ":" + gy) || []) {
          if (m === n) continue;
          const dx = n.x - m.x, dy = n.y - m.y;
          const d2 = dx * dx + dy * dy + 0.01;
          if (d2 < 6400) { const f = 120 / d2; n.vx += f * dx; n.vy += f * dy; }
        }
    n.vx *= 0.85; n.vy *= 0.85; n.x += n.vx; n.y += n.vy;
  }
}

function draw() {
  ctx.clearRect(0, 0, W, H);
  ctx.save(); ctx.translate(panX, panY); ctx.scale(zoom, zoom);
  ctx.strokeStyle = "#444"; ctx.lineWidth = 0.6; ctx.beginPath();
  for (const e of edges) {
    const a = byId.get(e.src), b = byId.get(e.dst);
    ctx.moveTo(a.x, a.y); ctx.lineTo(b.x, b.y);
  }
  ctx.stroke();
  for (const n of nodes) {
    // ?color=community payloads carry a community id — color by structure
    const key = n.community != null ? "c" + n.community : n.label;
    ctx.fillStyle = `hsl(${hue(key)},65%,55%)`;
    ctx.beginPath(); ctx.arc(n.x, n.y, 4, 0, 7); ctx.fill();
  }
  ctx.restore();
}

let frame = 0;
function tick() { if (frame++ < 600) forces(); draw(); requestAnimationFrame(tick); }

cv.addEventListener("mousedown", e => { dragging = true; lx = e.x; ly = e.y; });
addEventListener("mouseup", () => dragging = false);
cv.addEventListener("mousemove", e => {
  if (dragging) { panX += e.x - lx; panY += e.y - ly; lx = e.x; ly = e.y; return; }
  const x = (e.x - panX) / zoom, y = (e.y - 30 - panY) / zoom;
  const n = nodes.find(n => (n.x - x) ** 2 + (n.y - y) ** 2 < 36);
  tip.style.visibility = n ? "visible" : "hidden";
  if (n) { tip.textContent = n.label + ": " + (n.name || n.id)
             + (n.community != null ? " [community " + n.community + "]" : "");
           tip.style.left = e.x + 12 + "px"; tip.style.top = e.y + 8 + "px"; }
});
cv.addEventListener("wheel", e => {
  e.preventDefault();
  zoom *= e.deltaY < 0 ? 1.1 : 0.9;
});
</script>
</body>
</html>
"""
