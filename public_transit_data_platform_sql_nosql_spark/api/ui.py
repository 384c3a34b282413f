"""Minimal self-contained dashboard for the JSON API.

Closes the last reference-surface gap (the reference serves an HTML UI
at ``/`` — `SQL/app.py:78` render_template("index.html"),
`Mongo/index.html`): one ORIGINAL page, written against this repo's own
JSON endpoints only (the reference's static/app.js was deliberately not
consulted), that exercises the four analytics queries and the timetable
lookups.  No build step, no external assets — a single inline page the
Flask app returns at ``/``.
"""

from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Transit Analytics</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem; max-width: 60rem; }
  h1 { font-size: 1.3rem; }
  fieldset { margin: 1rem 0; border: 1px solid #bbb; }
  table { border-collapse: collapse; margin-top: .75rem; }
  th, td { border: 1px solid #ccc; padding: .25rem .5rem; font-size: .85rem; }
  th { background: #f2f2f2; text-align: left; }
  input, select, button { font-size: .9rem; padding: .15rem .4rem; }
  #status { color: #666; font-size: .85rem; margin-left: .5rem; }
</style>
</head>
<body>
<h1>Transit Analytics</h1>

<fieldset>
  <legend>Analytics (Q1&ndash;Q4)</legend>
  <label>query
    <select id="q">
      <option value="q1">Q1 busiest stops</option>
      <option value="q2">Q2 route duration/speed</option>
      <option value="q3">Q3 transfer points</option>
      <option value="q4">Q4 hourly frequency</option>
    </select>
  </label>
  <label>service_id <input id="svc" size="6" placeholder="all"></label>
  <label>limit <input id="lim" size="4" value="10"></label>
  <button onclick="runAnalytics()">run</button>
  <span id="status"></span>
</fieldset>

<fieldset>
  <legend>Timetable</legend>
  <label>stop_id <input id="stop" size="10"></label>
  <button onclick="load('/get_timetable?stop_id=' + enc('stop'))">
    timetable</button>
  <button onclick="load('/get_routes_for_stop?stop_id=' + enc('stop'))">
    routes</button>
  <button onclick="load('/get_stops')">all stops</button>
</fieldset>

<div id="out"></div>

<script>
function enc(id) { return encodeURIComponent(val(id)); }
function val(id) { return document.getElementById(id).value.trim(); }

function runAnalytics() {
  let u = '/api/' + val('q') + '?limit=' + enc('lim');
  if (val('svc')) u += '&service_id=' + enc('svc');
  load(u);
}

async function load(url) {
  const st = document.getElementById('status');
  st.textContent = 'loading ' + url;
  try {
    const r = await fetch(url);
    const data = await r.json();
    st.textContent = url + ' -> ' + r.status;
    render(data);
  } catch (e) {
    st.textContent = 'error: ' + e;
  }
}

function render(data) {
  const out = document.getElementById('out');
  const rows = Array.isArray(data) ? data : [data];
  if (!rows.length) { out.textContent = '(empty result)'; return; }
  if (typeof rows[0] !== 'object' || rows[0] === null) {
    out.textContent = JSON.stringify(data, null, 2);
    return;
  }
  const cols = [...new Set(rows.flatMap(r => Object.keys(r)))];
  const esc = s => s.replace(/&/g, '&amp;').replace(/</g, '&lt;')
    .replace(/>/g, '&gt;');
  const cell = v => esc(v === null || v === undefined ? ''
    : typeof v === 'object' ? JSON.stringify(v) : String(v));
  out.innerHTML = '<table><tr>'
    + cols.map(c => '<th>' + cell(c) + '</th>').join('')
    + '</tr>'
    + rows.map(r => '<tr>'
        + cols.map(c => '<td>' + cell(r[c]) + '</td>').join('')
        + '</tr>').join('')
    + '</table>';
}
</script>
</body>
</html>
"""
