"""The chat page the reference serves at ``/`` (templates/index.html:17-27:
text input + image attach + speech record; static/script.js:19-67 image
branch, :69-127 text branch posting the accumulated transcript to /chat,
:129-173 Web Speech dictation), re-expressed as ONE self-contained static
page against this engine's JSON ``POST /chat`` contract — same pattern as
``visualize.py``'s embedded HTML.

Behavior parity, engine-first:

* Text: the form posts the FULL transcript as ``{"messages": [{role,
  content}, ...]}`` so the NL→query planner's follow-up resolution
  (plans/nl2query.py) sees the conversation, and renders ``answer``,
  ``sql``, and the first result rows.
* Image attach: previewed in the transcript client-side; the server turn
  sends a text marker with the filename/size. The reference's own
  ``/gpt4-image`` server route is dead code (never implemented in
  first-graph.py), and this engine's multimodal surface lives in the
  registered ``multimodal_*`` operators — the page does not invent a
  fake inference endpoint.
* Speech: Web Speech dictation into the input when the browser exposes
  ``SpeechRecognition``; the button hides otherwise (same graceful
  degradation the reference relies on implicitly).
"""

from __future__ import annotations

CHAT_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1.0">
<title>Graph Engine Chat</title>
<style>
  body { margin:0; font-family: system-ui, sans-serif; background:#f0f2f5; }
  .chat { max-width: 760px; margin: 0 auto; height: 100vh;
          display: flex; flex-direction: column; }
  header { padding: 12px 16px; background: #1f6feb; color: #fff; }
  header h1 { margin: 0; font-size: 18px; }
  #log { flex: 1; overflow-y: auto; padding: 16px; }
  .msg { max-width: 80%; margin: 6px 0; padding: 8px 12px;
         border-radius: 10px; white-space: pre-wrap; word-break: break-word; }
  .sent { background: #1f6feb; color: #fff; margin-left: auto; }
  .recv { background: #fff; border: 1px solid #d0d7de; }
  .sql  { font-family: monospace; font-size: 12px; color: #57606a; }
  .msg img { max-width: 100%; border-radius: 6px; }
  table { border-collapse: collapse; font-size: 12px; margin-top: 6px; }
  td, th { border: 1px solid #d0d7de; padding: 2px 6px; }
  form { display: flex; gap: 8px; padding: 12px 16px; background: #fff;
         border-top: 1px solid #d0d7de; }
  #q { flex: 1; padding: 8px; border: 1px solid #d0d7de; border-radius: 6px; }
  button, label.btn { padding: 8px 12px; border: 1px solid #d0d7de;
         border-radius: 6px; background: #f6f8fa; cursor: pointer; }
  button[type=submit] { background: #1f6feb; color: #fff; border: 0; }
  #img { display: none; }
  .rec { background: #cf222e !important; color: #fff; }
</style>
</head>
<body>
<div class="chat">
  <header><h1>Graph Engine Chat</h1></header>
  <div id="log"></div>
  <form id="f">
    <input id="q" type="text" placeholder="Ask about the graph or the tables"
           autocomplete="off">
    <label class="btn" for="img" title="Attach image">&#128206;</label>
    <input id="img" type="file" accept="image/*">
    <button id="mic" type="button" title="Dictate">&#127908;</button>
    <button type="submit">Send</button>
  </form>
</div>
<script>
const log = document.getElementById('log');
const form = document.getElementById('f');
const input = document.getElementById('q');
const img = document.getElementById('img');
const transcript = [];   // {role, content} — what POST /chat receives

function add(cls, node) {
  const div = document.createElement('div');
  div.className = 'msg ' + cls;
  if (typeof node === 'string') div.textContent = node; else div.appendChild(node);
  log.appendChild(div);
  log.scrollTop = log.scrollHeight;
  return div;
}

function rowsTable(rows) {
  if (!rows || !rows.length) return null;
  // DOM construction with textContent — result cells carry corpus text
  // (XML node content, document bodies); innerHTML would execute any
  // markup embedded in the data
  const cols = Object.keys(rows[0]);
  const t = document.createElement('table');
  const head = t.insertRow();
  for (const c of cols) {
    const th = document.createElement('th');
    th.textContent = c;
    head.appendChild(th);
  }
  for (const r of rows.slice(0, 10)) {
    const tr = t.insertRow();
    for (const c of cols) tr.insertCell().textContent = String(r[c]);
  }
  return t;
}

async function send(content) {
  transcript.push({role: 'user', content});
  try {
    const resp = await fetch('/chat', {
      method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({messages: transcript}),
    });
    const data = await resp.json();
    if (!resp.ok) { add('recv', 'Error: ' + (data.error || resp.status)); return; }
    transcript.push({role: 'assistant', content: data.answer || ''});
    const wrap = document.createElement('div');
    const a = document.createElement('div');
    a.textContent = data.answer || '(no answer)';
    wrap.appendChild(a);
    if (data.sql) {
      const s = document.createElement('div');
      s.className = 'sql';
      s.textContent = data.sql;
      wrap.appendChild(s);
    }
    const t = rowsTable(data.rows);
    if (t) wrap.appendChild(t);
    add('recv', wrap);
  } catch (err) {
    add('recv', 'Error: ' + err.message);
  }
}

form.addEventListener('submit', async (e) => {
  e.preventDefault();
  if (img.files.length > 0) {           // image branch: preview + marker turn
    const file = img.files[0];
    const reader = new FileReader();
    reader.onload = (ev) => {
      const el = document.createElement('img');
      el.src = ev.target.result;
      add('sent', el);
    };
    reader.readAsDataURL(file);
    await send('[image attached: ' + file.name + ', ' + file.size + ' bytes] ' +
               (input.value || ''));
    img.value = ''; input.value = '';
    return;
  }
  const q = input.value.trim();
  if (!q) return;
  add('sent', q);
  input.value = '';
  await send(q);
});

// Speech dictation — only when the browser provides it
const SR = window.SpeechRecognition || window.webkitSpeechRecognition;
const mic = document.getElementById('mic');
if (SR) {
  const rec = new SR();
  rec.continuous = false; rec.interimResults = false; rec.lang = 'en-US';
  let on = false;
  mic.addEventListener('click', () => {
    if (on) { rec.stop(); return; }
    on = true; mic.classList.add('rec'); rec.start();
  });
  rec.addEventListener('result', (e) => {
    input.value = (input.value + ' ' + e.results[0][0].transcript).trim();
  });
  rec.addEventListener('end', () => { on = false; mic.classList.remove('rec'); });
} else {
  mic.style.display = 'none';
}
</script>
</body>
</html>
"""
