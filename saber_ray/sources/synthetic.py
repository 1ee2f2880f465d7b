"""Deterministic synthetic interleaved-document corpus (FIXTURES.md F1/F8).

Generates the engine's primary input shape from BASELINE.json's
``input_hint`` — ``doc_id: string, spans: list<struct<kind, text,
media_ref, offset>>`` — with gold mentions and triples known BY
CONSTRUCTION: every sentence is assembled from templates whose entity
slots are filled from the saber gazetteer, so the generator can emit the
exact mention/triple tables a correct pipeline must produce.

Determinism is PER-DOCUMENT: document ``i`` is a pure function of
``(seed, i)`` (its own ``random.Random`` instance), so the driver-side
generator (``generate_documents``, small corpora + gold tables for
tests) and the distributed generator (``synthetic_dataset``,
``ray.data.range → map_batches``, arbitrarily large corpora for
benchmarks) produce byte-identical documents and can be sharded freely.

A skew knob over-samples hot surfaces (e.g. "p53") to exercise the
salted canonicalization shuffle.
"""

from __future__ import annotations

import random

import pyarrow as pa

import ray.data as rd

from ..gazetteer import SABER_SURFACES
from ..schemas import DOCUMENTS

# Sentence templates; {E} slots are filled with gazetteer surfaces.
_TEMPLATES = [
    "Expression of {E} is altered in {E} .",
    "We report that {E} interacts with {E} in {E} cells .",
    "Treatment with {E} reduced {E} levels .",
    "The role of {E} in {E} remains unclear .",
    "Mutations in {E} cause {E} .",
    "{E} regulates {E} signaling .",
    "Studies in {E} show {E} binding to {E} .",
]
_FILLER = [
    "These results were consistent across replicates .",
    "Further work is required to confirm this finding .",
    "The assay was repeated three times .",
]


def _gen_doc(
    d: int,
    seed: int,
    weighted: list[str],
    media_every: int,
):
    """Generate document ``d`` — pure function of (seed, d).

    Returns (doc_id, spans, mentions, pairs) where mentions/pairs are the
    gold-by-construction annotations.
    """
    rng = random.Random((seed << 32) ^ d)
    doc_id = f"doc-{d:09d}"
    n_spans = rng.randint(1, 4)
    spans = []
    offset = 0
    media_positions = set()
    if d % media_every == 0:
        media_positions = {rng.randrange(n_spans + 1)}
    gold_mentions: list[dict] = []
    gold_pairs: list[tuple] = []
    span_idx = 0
    for s in range(n_spans):
        if s in media_positions:
            spans.append(
                {
                    "kind": rng.choice(["image", "table_fig"]),
                    "text": "",
                    "media_ref": f"media://{doc_id}/{s}",
                    "offset": offset,
                }
            )
            span_idx += 1
        if rng.random() < 0.25:
            text = rng.choice(_FILLER)
            ents_here: list[tuple[str, str, int, int]] = []
        else:
            template = rng.choice(_TEMPLATES)
            parts = template.split("{E}")
            text = ""
            ents_here = []
            for i, part in enumerate(parts):
                text += part
                if i < len(parts) - 1:
                    surf = rng.choice(weighted)
                    rendered = surf if rng.random() < 0.7 else surf.capitalize()
                    start = len(text)
                    text += rendered
                    ents_here.append(
                        (surf, SABER_SURFACES[surf], start, start + len(rendered))
                    )
        for surf, label, start, end in ents_here:
            gold_mentions.append(
                {
                    "doc_id": doc_id,
                    "span_idx": span_idx,
                    "start": start,
                    "end": end,
                    "text": text[start:end],
                    "label": label,
                }
            )
        for i in range(len(ents_here)):
            for j in range(i + 1, len(ents_here)):
                a, b = ents_here[i], ents_here[j]
                gold_pairs.append((doc_id, a[0], a[1], b[0], b[1], span_idx))
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        offset += len(text) + 1
        span_idx += 1
    if n_spans in media_positions:
        spans.append(
            {
                "kind": "image",
                "text": "",
                "media_ref": f"media://{doc_id}/tail",
                "offset": offset,
            }
        )
    return doc_id, spans, gold_mentions, gold_pairs


def _weighted_surfaces(hot_surface: str, hot_multiplier: int) -> list[str]:
    surfaces = sorted(SABER_SURFACES)
    return surfaces + [hot_surface] * (hot_multiplier - 1) * (hot_surface in SABER_SURFACES)


def generate_documents(
    num_docs: int,
    seed: int = 42,
    hot_surface: str = "p53",
    hot_multiplier: int = 5,
    media_every: int = 3,
) -> tuple[pa.Table, list[dict], list[tuple]]:
    """Driver-side generator: (documents_table, gold_mentions, gold_pairs).

    gold_mentions: dicts with doc_id/span_idx/start/end/text/label (char
    offsets within the span text). gold_pairs: per-sentence ordered
    co-occurrence pairs ``(doc_id, subj_surface, subj_label, obj_surface,
    obj_label, span_idx)`` — the triple oracle before grounding.
    """
    weighted = _weighted_surfaces(hot_surface, hot_multiplier)
    doc_ids, spans_col = [], []
    gold_mentions: list[dict] = []
    gold_pairs: list[tuple] = []
    for d in range(num_docs):
        doc_id, spans, ments, pairs = _gen_doc(d, seed, weighted, media_every)
        doc_ids.append(doc_id)
        spans_col.append(spans)
        gold_mentions.extend(ments)
        gold_pairs.extend(pairs)
    table = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCUMENTS
    )
    return table, gold_mentions, gold_pairs


def synthetic_dataset(
    num_docs: int,
    seed: int = 42,
    hot_surface: str = "p53",
    hot_multiplier: int = 5,
    media_every: int = 3,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Distributed generator: a lazy Dataset of ``num_docs`` interleaved
    documents, byte-identical to ``generate_documents`` for the same
    (seed, index). Generation itself parallelizes over blocks — no
    driver-side corpus materialization at any size.
    """
    weighted = _weighted_surfaces(hot_surface, hot_multiplier)

    def gen_batch(batch: pa.Table) -> pa.Table:
        doc_ids, spans_col = [], []
        for d in batch["id"].to_pylist():
            doc_id, spans, _, _ = _gen_doc(int(d), seed, weighted, media_every)
            doc_ids.append(doc_id)
            spans_col.append(spans)
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "spans": spans_col}, schema=DOCUMENTS
        )

    if override_num_blocks is None:
        # Block sizing trades load-balance against dispatch overhead: the
        # streaming executor dispatches O(100) tasks/s from a single
        # driver loop, so 2000-doc blocks (~100 ms of work) cap effective
        # parallelism at ~10 tasks regardless of cluster size (measured:
        # 2M-doc generate 8.8 s at 1001 blocks vs 3.7 s at 96 blocks on
        # 32 cpus). ~20k docs per block keeps tasks in the seconds range
        # — long enough to amortize dispatch, short enough that 4x the
        # CPUs still load-balance (the cpus*4 floor guarantees >= 4
        # blocks per core on the cluster that generated them).
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        override_num_blocks = max(cpus * 4, min(num_docs, num_docs // 20_000 + 1))
    base = rd.range(num_docs, override_num_blocks=override_num_blocks)
    return base.map_batches(gen_batch, batch_format="pyarrow")


def write_corpus(path: str, num_docs: int, seed: int = 42, **kw) -> pa.Table:
    """Write a synthetic corpus to parquet; returns the table."""
    import pyarrow.parquet as pq

    table, _, _ = generate_documents(num_docs, seed=seed, **kw)
    pq.write_table(table, path)
    return table
