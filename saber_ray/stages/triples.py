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

Both kernels decode the nested ``ents`` column via ListArray offsets +
flattened struct fields (zero-copy views), not per-row ``to_pylist`` —
the per-batch cost is the pair loop itself, nothing else.

``explode_mentions`` flattens annotated documents into the MENTIONS table
(one row per mention) for canonicalization and evaluation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import COOCCURS, RELATION_PREDICATES
from ..schemas import MENTIONS, TRIPLES


def predicate_for(subj_label: str, obj_label: str) -> str:
    return RELATION_PREDICATES.get((subj_label, obj_label), COOCCURS)


def _ents_parts(batch: pa.Table):
    ents = batch["ents"].combine_chunks()
    if isinstance(ents, pa.ChunkedArray):
        ents = ents.chunk(0)
    offsets = ents.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = ents.values
    lo, hi = int(offsets[0]), int(offsets[-1])
    if lo != 0 or len(values) != hi - lo:
        # sliced list array: values spans the parent buffer
        values = values.slice(lo, hi - lo)
        offsets = offsets - lo
    return values, offsets


#: Per-scope mention cap for pair emission. A pathological document with
#: 10^4 mentions in one sentence would otherwise expand to 10^8 pair
#: iterations inside a single task; mentions past the cap (in positional
#: order) are dropped from pairing WITH a log line, never silently.
MAX_PAIR_MENTIONS = 1000


def emit_triples(batch: pa.Table, same_sentence: bool = True,
                 max_pair_mentions: int = MAX_PAIR_MENTIONS) -> pa.Table:
    """Annotated documents batch → TRIPLES-schema batch.

    Pairing is grouped by co-occurrence scope FIRST — (span_idx,
    sent_idx) when ``same_sentence`` — so the O(m²) loop runs over
    within-scope mention counts, not whole-document counts, and each
    scope is capped at ``max_pair_mentions``.
    """
    import logging

    flat, offsets = _ents_parts(batch)
    doc_ids = batch["doc_id"].to_pylist()
    starts = flat.field("start").to_numpy(zero_copy_only=False)
    span_idxs = flat.field("span_idx").to_numpy(zero_copy_only=False)
    sent_idxs = flat.field("sent_idx").to_numpy(zero_copy_only=False)
    labels = flat.field("label").to_pylist()
    entities = flat.field("entity_id").to_pylist()

    rows: dict[str, list] = {name: [] for name in TRIPLES.names}
    n_capped = 0
    for d, doc_id in enumerate(doc_ids):
        lo, hi = int(offsets[d]), int(offsets[d + 1])
        if hi - lo < 2:
            continue
        # positional order within the document: (span_idx, start)
        order = sorted(range(lo, hi), key=lambda i: (span_idxs[i], starts[i]))
        if same_sentence:
            # bound the pair loop to within-(span, sentence) groups;
            # grouping keeps each member list in positional order
            by_scope: dict[tuple, list[int]] = {}
            for i in order:
                by_scope.setdefault((span_idxs[i], sent_idxs[i]), []).append(i)
            scopes = list(by_scope.values())
        else:
            scopes = [order]
        seen: dict[tuple, list] = {}
        for scope in scopes:
            if len(scope) > max_pair_mentions:
                n_capped += len(scope) - max_pair_mentions
                scope = scope[:max_pair_mentions]
            for ii in range(len(scope)):
                a = scope[ii]
                for jj in range(ii + 1, len(scope)):
                    b = scope[jj]
                    if entities[a] == entities[b]:
                        continue
                    key = (entities[a], predicate_for(labels[a], labels[b]),
                           entities[b])
                    hit = seen.get(key)
                    if hit is not None:
                        hit[0] += 1.0
                    else:
                        seen[key] = [1.0, labels[a], labels[b], int(span_idxs[a])]
        for (subj, pred, obj), (score, subj_label, obj_label, span_idx) in seen.items():
            rows["doc_id"].append(doc_id)
            rows["subj"].append(subj)
            rows["pred"].append(pred)
            rows["obj"].append(obj)
            rows["subj_label"].append(subj_label)
            rows["obj_label"].append(obj_label)
            rows["evidence_span"].append(span_idx)
            rows["score"].append(score)
    if n_capped:
        logging.getLogger(__name__).warning(
            "emit_triples: %d mentions beyond max_pair_mentions=%d were "
            "excluded from pairing in this batch", n_capped, max_pair_mentions,
        )
    return pa.Table.from_pydict(rows, schema=TRIPLES)


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Annotated documents batch → MENTIONS-schema batch (one row/mention).

    Pure columnar: repeat doc_id by per-doc mention counts; every other
    column is a zero-copy field view of the flattened ents structs.
    """
    flat, offsets = _ents_parts(batch)
    counts = np.diff(offsets)
    doc_ids = np.repeat(
        np.asarray(batch["doc_id"].to_pylist(), dtype=object), counts
    )
    cols = {
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "span_idx": flat.field("span_idx"),
        "sent_idx": flat.field("sent_idx"),
        "start": flat.field("start"),
        "end": flat.field("end"),
        "text": flat.field("text"),
        "label": flat.field("label"),
        "xrefs": flat.field("xrefs"),
        "entity_id": flat.field("entity_id"),
    }
    return pa.Table.from_arrays([cols[n] for n in MENTIONS.names], schema=MENTIONS)
