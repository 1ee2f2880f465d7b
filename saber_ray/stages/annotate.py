"""Fused annotation stage: dictionary tagging + entity linking in ONE
actor-pool ``map_batches`` pass with columnar (flat-array) Arrow output.

Semantically identical to ``DictionaryTagger`` followed by
``EntityLinker`` (both kept for unit-level parity tests); this fusion
exists for the hot path:

* one decode of the ``spans`` column per batch (via ListArray
  offsets + flattened struct fields, not ``to_pylist`` of nested rows);
* mentions accumulate into flat Python lists and become Arrow arrays in
  a single ``StructArray``/``ListArray`` construction — no per-mention
  dicts, no intermediate ungrounded ``ents`` column;
* grounding is a dict lookup in the same loop (broadcast dictionary
  fetched once per actor in ``__init__``).

Stage contract matches the tagger+linker chain: input DOCUMENTS columns
pass through untouched; output adds ``ents`` (grounded ent structs) and
``span_hash`` (per-row span-sequence invariant, asserted if present).
"""

from __future__ import annotations

import re
from bisect import bisect_left, bisect_right

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import span_sequence_hash
from .linker import GROUNDED_ENT_TYPE, _XREF_TYPE, entity_id_for
from .tagger import build_surface_pattern

_SENT_BREAK = re.compile(r"[.!?]")
_WS = re.compile(r"\s+")


class Annotator:
    """Actor-pool stage: interleaved documents → documents + grounded ents.

    ``linker_ref`` may be a plain dict (tests) or a ``ray.ObjectRef``
    (pipelines) of ``{(normalized surface, label): [xref_dict, ...]}``.
    """

    # beyond this many surfaces, Python's re alternation degrades while
    # the token trie stays O(text); threshold chosen from measurement
    # (regex wins below ~1k surfaces, trie wins far beyond)
    TRIE_THRESHOLD = 1000

    def __init__(self, surfaces: dict[str, str] | None = None, linker_ref=None,
                 strategy: str = "auto"):
        if surfaces is None:
            from ..gazetteer import SABER_SURFACES as surfaces  # noqa: N811
        if linker_ref is None:
            from ..gazetteer import SABER_GROUNDING, build_linker_dict

            linker = build_linker_dict(SABER_GROUNDING)
        elif isinstance(linker_ref, ray.ObjectRef):
            linker = ray.get(linker_ref)
        else:
            linker = linker_ref
        # normalized surface (trim + collapse + lower) → label, matching
        # build_surface_pattern's normalization and the grounding keys
        self._labels = {
            _WS.sub(" ", k.strip().lower()): v for k, v in surfaces.items()
        }
        if strategy == "auto":
            strategy = "trie" if len(surfaces) > self.TRIE_THRESHOLD else "regex"
        self.strategy = strategy  # introspectable
        if strategy == "trie":
            from ..functions.matching import TokenTrieMatcher

            self._matcher = TokenTrieMatcher(self._labels)
            self._pattern = None
        else:
            self._pattern = build_surface_pattern(surfaces)
            self._matcher = None
        # (normalized surface, label) -> (xrefs tuple, entity_id) resolved once
        self._ground: dict[tuple[str, str], tuple[list[dict], str]] = {}
        for (surf, label), xrefs in linker.items():
            self._ground[(surf, label)] = (xrefs, entity_id_for(label, surf, xrefs))

    def _resolve(self, norm: str, label: str) -> tuple[list[dict], str]:
        hit = self._ground.get((norm, label))
        if hit is None:
            hit = ([], entity_id_for(label, norm, []))
            self._ground[(norm, label)] = hit  # cache ungrounded surfaces too
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.span_decode import decode_spans_column

        doc_offsets, kinds, texts, media = decode_spans_column(batch)
        n_docs = batch.num_rows
        # flat mention accumulators
        m_start: list[int] = []
        m_end: list[int] = []
        m_text: list[str] = []
        m_label: list[str] = []
        m_span_idx: list[int] = []
        m_sent_idx: list[int] = []
        m_entity: list[str] = []
        # xrefs: flat triplets + per-mention offsets
        x_ns: list[str] = []
        x_id: list[str] = []
        x_org: list[str] = []
        x_offsets: list[int] = [0]
        hashes: list[str] = []

        labels = self._labels

        # ONE regex scan per batch: join every text span with \x00 (never
        # whitespace nor alnum, so no surface and no boundary lookaround
        # can cross it) and map match positions back through cumulative
        # span starts. Cuts per-span scanner setup out of the hot loop.
        sel = [
            i for i in range(len(kinds))
            if kinds[i] == "text" and texts[i]
        ]
        joined = "\x00".join(texts[i] for i in sel)
        span_starts = [0] * (len(sel) + 1)
        for si, i in enumerate(sel):
            span_starts[si + 1] = span_starts[si] + len(texts[i]) + 1
        mention_flat_idx: list[int] = []
        bounds_cache: dict[int, list[int]] = {}
        # both strategies scan the SAME joined buffer: \x00 is its own
        # token and matches no surface, so phrases cannot cross spans;
        # the grounding key is always the matched text normalized
        if self._matcher is not None:
            def gen():
                for pos, end, label in self._matcher.finditer(joined):
                    surface = joined[pos:end]
                    yield pos, end, surface, _WS.sub(" ", surface.lower()), label
        else:
            def gen():
                for m in self._pattern.finditer(joined):
                    surface = m.group()
                    norm = _WS.sub(" ", surface.lower())
                    # re.IGNORECASE matches Unicode case-variants (e.g.
                    # U+017F 'ſ' for 's') whose .lower() is NOT the
                    # gazetteer key — skip like the trie strategy would,
                    # never KeyError the whole batch task
                    label = labels.get(norm)
                    if label is not None:
                        yield m.start(), m.end(), surface, norm, label
        matches = gen()

        # scalar lookups use stdlib bisect — np.searchsorted per match is
        # ~15x slower for single values
        for pos, end, surface, norm, label in matches:
            si = bisect_right(span_starts, pos) - 1
            i = sel[si]
            local_start = pos - span_starts[si]
            xrefs, entity_id = self._resolve(norm, label)
            bounds = bounds_cache.get(i)
            if bounds is None:
                bounds = [b.start() for b in _SENT_BREAK.finditer(texts[i])]
                bounds_cache[i] = bounds
            m_start.append(local_start)
            m_end.append(local_start + (end - pos))
            m_text.append(surface)
            m_label.append(label)
            mention_flat_idx.append(i)
            m_sent_idx.append(bisect_left(bounds, local_start) if bounds else 0)
            m_entity.append(entity_id)
            for x in xrefs:
                x_ns.append(x["namespace"])
                x_id.append(x["id"])
                x_org.append(x["organism_id"])
            x_offsets.append(len(x_ns))

        from ..functions.span_decode import (
            doc_span_hashes,
            mention_list_offsets,
        )

        m_span_idx, ents_offsets = mention_list_offsets(
            mention_flat_idx, doc_offsets, n_docs)
        hashes.extend(doc_span_hashes(doc_offsets, kinds, texts, media, n_docs))

        xref_struct = pa.StructArray.from_arrays(
            [pa.array(x_ns, type=pa.string()), pa.array(x_id, type=pa.string()),
             pa.array(x_org, type=pa.string())],
            fields=list(_XREF_TYPE),
        )
        xrefs_arr = pa.ListArray.from_arrays(pa.array(x_offsets, type=pa.int32()), xref_struct)
        ent_struct = pa.StructArray.from_arrays(
            [
                pa.array(m_start, type=pa.int32()),
                pa.array(m_end, type=pa.int32()),
                pa.array(m_text, type=pa.string()),
                pa.array(m_label, type=pa.string()),
                pa.array(m_span_idx, type=pa.int32()),
                pa.array(m_sent_idx, type=pa.int32()),
                xrefs_arr,
                pa.array(m_entity, type=pa.string()),
            ],
            fields=list(GROUNDED_ENT_TYPE),
        )
        ents_arr = pa.ListArray.from_arrays(pa.array(ents_offsets), ent_struct)

        from ..functions.span_decode import attach_ents

        return attach_ents(batch, ents_arr, hashes, "annotator")
