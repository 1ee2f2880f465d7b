"""Annotation web service + HTML rendering — the reference's serving
path (saber/cli/app.py:23-95) re-expressed without Flask.

The reference loads one model per entity class at startup and loops them
per request; here ONE fused ``Annotator`` (all classes in a single pass)
is built at startup and shared across requests — the same
load-once/serve-many shape, minus the per-class loop its multi-task
model already made redundant (SURVEY.md §3.3).

Endpoints (JSON in/out, mirroring ``/annotate/text``):

    POST /annotate/text   {"text": "..."}           → annotation record
    GET  /health                                    → {"status": "ok"}

``render_html`` is the displaCy-style entity highlighter
(saber/cli/app.py:54-58) as self-contained HTML.

Stdlib ``http.server`` only — single-process, thread-per-request; the
batch engine is the scale path, this is the interactive parity surface.
"""

from __future__ import annotations

import html
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa

from .schemas import DOCUMENTS
from .sources.sinks import annotation_records_batch
from .stages.annotate import Annotator

_LABEL_COLORS = {
    "PRGE": "#7aecec",
    "CHED": "#bfeeb7",
    "DISO": "#feca74",
    "LIVB": "#ff9561",
}


def annotate_text(annotator: Annotator, text: str, doc_id: str = "doc-0") -> dict:
    """One document through the fused annotator → reference-shaped record."""
    if not isinstance(text, str) or not text.strip():
        raise ValueError("text must be a non-empty string")
    batch = pa.Table.from_pylist(
        [{"doc_id": doc_id,
          "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS,
    )
    record = annotation_records_batch(annotator(batch)).to_pylist()[0]
    record.pop("media_refs", None)
    return record


def render_html(record: dict) -> str:
    """Entity-highlighted HTML for an annotation record (displaCy-style)."""
    text = record["text"]
    parts: list[str] = []
    cursor = 0
    for e in sorted(record["ents"], key=lambda e: e["start"]):
        if e["start"] < cursor:
            continue  # overlapping ents: keep the earlier one
        parts.append(html.escape(text[cursor:e["start"]]))
        color = _LABEL_COLORS.get(e["label"], "#dddddd")
        parts.append(
            f'<mark style="background:{color};padding:0.2em;border-radius:0.3em">'
            f'{html.escape(text[e["start"]:e["end"]])}'
            f'<sub style="font-size:0.7em;margin-left:0.3em">{html.escape(e["label"])}</sub>'
            f"</mark>"
        )
        cursor = e["end"]
    parts.append(html.escape(text[cursor:]))
    return f'<div class="entities" style="line-height:2.2">{"".join(parts)}</div>'


def make_handler(annotator: Annotator):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict | str, ctype="application/json"):
            body = (
                json.dumps(payload) if ctype == "application/json" else payload
            ).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/annotate/text", "/annotate/html"):
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                record = annotate_text(annotator, req.get("text", ""))
            except (ValueError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
                return
            if self.path == "/annotate/html":
                self._send(200, render_html(record), ctype="text/html")
            else:
                self._send(200, record)

    return Handler


def serve(host: str = "127.0.0.1", port: int = 8421,
          annotator: Annotator | None = None) -> ThreadingHTTPServer:
    """Build the server (caller runs ``serve_forever``; tests drive it on
    a background thread). The annotator loads ONCE here — startup cost,
    not per-request cost, exactly like the reference's model preload."""
    server = ThreadingHTTPServer((host, port), make_handler(annotator or Annotator()))
    return server
