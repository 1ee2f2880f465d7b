"""Annotation service tests: the reference's serving path (§3.3) driven
over real HTTP."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from saber_ray.service import annotate_text, render_html, serve
from saber_ray.stages.annotate import Annotator


@pytest.fixture(scope="module")
def server():
    srv = serve(port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read().decode()


def test_health(server):
    with urllib.request.urlopen(f"{server}/health") as resp:
        assert json.loads(resp.read()) == {"status": "ok"}


def test_annotate_endpoint(server):
    status, body = _post(f"{server}/annotate/text",
                         {"text": "p53 causes cancer in human subjects."})
    assert status == 200
    rec = json.loads(body)
    got = [(e["text"], e["label"]) for e in rec["ents"]]
    assert got == [("p53", "PRGE"), ("cancer", "DISO"), ("human", "LIVB")]
    for e in rec["ents"]:
        assert rec["text"][e["start"]:e["end"]] == e["text"]
    # grounding travels with the record
    assert rec["ents"][0]["xrefs"][0]["id"] == "ENSP00000269305"


def test_annotate_rejects_empty(server):
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(f"{server}/annotate/text", {"text": "   "})
    assert err.value.code == 400


def test_annotate_rejects_bad_json(server):
    req = urllib.request.Request(
        f"{server}/annotate/text", data=b"{not json", method="POST")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400


def test_annotate_rejects_non_object_json(server):
    # valid JSON that isn't an object must 400, not kill the connection
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(f"{server}/annotate/text", [1, 2])
    assert err.value.code == 400


def test_html_endpoint(server):
    status, body = _post(f"{server}/annotate/html", {"text": "glucose and mouse"})
    assert status == 200
    assert "<mark" in body and "glucose" in body and "CHED" in body


def test_render_html_escapes():
    ann = Annotator()
    rec = annotate_text(ann, "p53 <script> & cancer")
    out = render_html(rec)
    assert "<script>" not in out
    assert "&lt;script&gt;" in out
