"""Output sinks: annotation JSON records (S6), metrics JSON (S7), and
the gated remote-fetch source stub (S3).

S6 reproduces the reference's public annotation record —
``{'text', 'title', 'ents': [{'start','end','text','label','xrefs'}]}``
(saber/saber.py:107-114) — from the engine's annotated-documents table,
so a consumer of the reference's JSON API can switch over directly.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray.data as rd


def annotation_records_batch(batch: pa.Table) -> pa.Table:
    """Annotated documents → reference-shaped annotation records.

    ``text`` is the concatenation of the document's text spans (media
    spans excluded, their refs listed separately so nothing is lost).
    Mention offsets are REMAPPED from span-local to document-level so
    ``record['text'][start:end] == mention text`` holds for every ent —
    the contract the reference's consumers rely on
    (saber/saber.py:107-112). ``span_idx`` is preserved for projecting
    back to the source span.
    """
    rows = {"doc_id": [], "title": [], "text": [], "ents": [], "media_refs": []}
    for doc_id, spans, ents in zip(
        batch["doc_id"].to_pylist(), batch["spans"].to_pylist(), batch["ents"].to_pylist()
    ):
        text_parts, media = [], []
        # doc-level char offset of each span's text within the joined text
        span_base: dict[int, int] = {}
        cursor = 0
        for idx, s in enumerate(spans):
            if s["kind"] == "text":
                span_base[idx] = cursor
                cursor += len(s["text"]) + 1  # the " " joiner
                text_parts.append(s["text"])
            else:
                media.append(s["media_ref"])
        rows["doc_id"].append(doc_id)
        rows["title"].append("")
        rows["text"].append(" ".join(text_parts))
        rows["ents"].append(
            [
                {
                    "start": span_base.get(e["span_idx"], 0) + e["start"],
                    "end": span_base.get(e["span_idx"], 0) + e["end"],
                    "text": e["text"],
                    "label": e["label"],
                    "span_idx": e["span_idx"],
                    "xrefs": e.get("xrefs", []),
                }
                for e in ents
            ]
        )
        rows["media_refs"].append(media)
    return pa.Table.from_pydict(rows)


def write_annotation_json(annotated: rd.Dataset, path: str) -> None:
    """S6: annotated documents → newline-delimited JSON records."""
    annotated.map_batches(annotation_records_batch, batch_format="pyarrow").write_json(
        path
    )


def write_metrics_json(scores: dict, path: str, partition: str = "eval") -> str:
    """S7: evaluation scores → JSON file (reference writes per-epoch
    ``epoch_NNN.txt`` score files, saber/metrics.py:240-284)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "partition": partition,
        "scores": {
            label: {
                "precision": v[0], "recall": v[1], "f1": v[2], "support": v[3]
            }
            for label, v in scores.items()
        },
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    return path


def fetch_pubmed_stub(*_args, **_kwargs):
    """S3: the reference fetches title/abstract from NCBI eutils
    (saber/utils/app_utils.py:19-80). This environment has no network;
    the connector is intentionally a stub."""
    raise NotImplementedError(
        "PubMed fetching requires network access; not available in this "
        "environment (reference: saber/utils/app_utils.py:19-80)"
    )
