"""Shared columnar plumbing for taggers over the interleaved DOCUMENTS
schema — the offsets-based spans decode, the flat-mention→(doc, span)
mapping, the per-doc span-sequence hashes, and the invariant-asserting
ents attach. ONE implementation used by both ``stages/annotate.py``
(fused dictionary path) and ``stages/neural.py`` (bundle path) so the
two taggers can never drift on the decode/assert edge cases.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import span_sequence_hash


def decode_spans_column(batch: pa.Table):
    """DOCUMENTS batch → (doc_offsets int64[n+1], kinds, texts, media).

    Zero-copy where Arrow allows: list offsets and flat struct fields are
    read directly; a sliced/offset ListArray is re-based so offsets start
    at 0.
    """
    spans_col = batch["spans"].combine_chunks()
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.chunk(0)
    doc_offsets = spans_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = spans_col.values
    olo, ohi = int(doc_offsets[0]), int(doc_offsets[-1])
    if olo != 0 or len(flat) != ohi - olo:
        flat = flat.slice(olo, ohi - olo)
        doc_offsets = doc_offsets - olo
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    media = flat.field("media_ref").to_pylist()
    return doc_offsets, kinds, texts, media


def mention_list_offsets(mention_flat_idx: list[int], doc_offsets: np.ndarray,
                         n_docs: int):
    """Flat span indices (one per mention, in flat order) →
    (per-mention span_idx within its doc, per-doc ents list offsets).

    Mentions arrive in flat-span order, so per-doc runs are contiguous
    and the list offsets are a searchsorted over run boundaries.
    """
    if mention_flat_idx:
        flat_idx = np.asarray(mention_flat_idx, dtype=np.int64)
        docs_of_mention = np.searchsorted(doc_offsets, flat_idx, side="right") - 1
        m_span_idx = (flat_idx - doc_offsets[docs_of_mention]).astype(np.int32).tolist()
        ents_offsets = np.searchsorted(
            docs_of_mention, np.arange(n_docs + 1)
        ).astype(np.int32)
    else:
        m_span_idx = []
        ents_offsets = np.zeros(n_docs + 1, dtype=np.int32)
    return m_span_idx, ents_offsets


def doc_span_hashes(doc_offsets: np.ndarray, kinds, texts, media,
                    n_docs: int) -> list[str]:
    """Per-doc span-sequence hash (the north-rule invariant)."""
    return [
        span_sequence_hash(
            kinds[doc_offsets[d]:doc_offsets[d + 1]],
            texts[doc_offsets[d]:doc_offsets[d + 1]],
            media[doc_offsets[d]:doc_offsets[d + 1]],
        )
        for d in range(n_docs)
    ]


def attach_ents(batch: pa.Table, ents_arr: pa.ListArray, hashes: list[str],
                stage: str) -> pa.Table:
    """Append ``ents`` and assert/attach ``span_hash`` — the stage never
    rewrites the document, so an existing hash column must match."""
    out = batch.append_column("ents", ents_arr)
    if "span_hash" in batch.column_names:
        prior = batch["span_hash"].to_pylist()
        if prior != hashes:
            raise AssertionError(
                f"span-sequence invariant violated in {stage} input")
        return out
    return out.append_column("span_hash", pa.array(hashes, type=pa.string()))
