"""Triple emission + mention explode: stateless ``map_batches`` kernels.

Co-occurrence triple emission (SURVEY.md A6): for every pair of grounded
mentions that share a document — and, when ``same_sentence`` is set, the
same span and sentence — emit ``(subj, pred, obj)`` ordered by text
position, with a predicate chosen from the label-pair heuristic table
(the reference's roadmap names relation extraction but never implements
it, docs/index.md:10-11; these heuristics are engine-defined and fixed).

Embarrassingly parallel: each document's mentions live in its own row
(``ents`` list column), so no shuffle is needed — this is the reason the
tagger/linker keep annotations on the document row instead of exploding
early. Duplicate (subj, pred, obj) pairs within one document collapse to
one triple whose score counts the co-occurrences.

``explode_mentions`` flattens annotated documents into the MENTIONS table
(one row per mention) for canonicalization and evaluation.
"""

from __future__ import annotations

import pyarrow as pa

from ..constants import COOCCURS, RELATION_PREDICATES
from ..schemas import MENTIONS, TRIPLES


def predicate_for(subj_label: str, obj_label: str) -> str:
    return RELATION_PREDICATES.get((subj_label, obj_label), COOCCURS)


def emit_triples(batch: pa.Table, same_sentence: bool = True) -> pa.Table:
    """Annotated documents batch → TRIPLES-schema batch."""
    doc_ids = batch["doc_id"].to_pylist()
    ents_col = batch["ents"].to_pylist()
    rows: dict[str, list] = {name: [] for name in TRIPLES.names}
    for doc_id, ents in zip(doc_ids, ents_col):
        seen: dict[tuple, list] = {}
        order = sorted(ents, key=lambda e: (e["span_idx"], e["start"]))
        for i in range(len(order)):
            a = order[i]
            for j in range(i + 1, len(order)):
                b = order[j]
                if same_sentence and (
                    a["span_idx"] != b["span_idx"] or a["sent_idx"] != b["sent_idx"]
                ):
                    continue
                if a["entity_id"] == b["entity_id"]:
                    continue
                key = (a["entity_id"], predicate_for(a["label"], b["label"]), b["entity_id"])
                if key in seen:
                    seen[key][0] += 1.0
                else:
                    seen[key] = [1.0, a["label"], b["label"], a["span_idx"]]
        for (subj, pred, obj), (score, subj_label, obj_label, span_idx) in seen.items():
            rows["doc_id"].append(doc_id)
            rows["subj"].append(subj)
            rows["pred"].append(pred)
            rows["obj"].append(obj)
            rows["subj_label"].append(subj_label)
            rows["obj_label"].append(obj_label)
            rows["evidence_span"].append(span_idx)
            rows["score"].append(score)
    return pa.Table.from_pydict(rows, schema=TRIPLES)


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Annotated documents batch → MENTIONS-schema batch (one row/mention)."""
    doc_ids = batch["doc_id"].to_pylist()
    ents_col = batch["ents"].to_pylist()
    rows: dict[str, list] = {name: [] for name in MENTIONS.names}
    for doc_id, ents in zip(doc_ids, ents_col):
        for ent in ents:
            rows["doc_id"].append(doc_id)
            rows["span_idx"].append(ent["span_idx"])
            rows["sent_idx"].append(ent["sent_idx"])
            rows["start"].append(ent["start"])
            rows["end"].append(ent["end"])
            rows["text"].append(ent["text"])
            rows["label"].append(ent["label"])
            rows["xrefs"].append(ent.get("xrefs", []))
            rows["entity_id"].append(ent.get("entity_id", ""))
    return pa.Table.from_pydict(rows, schema=MENTIONS)
