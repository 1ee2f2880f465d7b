"""End-to-end KG-construction pipeline assembly (the engine's flagship).

documents → DictionaryTagger (actor pool) → EntityLinker (actor pool,
broadcast dictionary) → {mentions, triples} (stateless explodes) →
{nodes, edges} (salted canonicalization shuffles).

Everything stays a lazy ``ray.data.Dataset`` — the streaming executor
pipelines the stages with backpressure; nothing is materialized except
the (small) final graph tables when a caller asks for them.

The reference equivalent is ``Saber.annotate`` looped per document
(saber/saber.py:52-128) plus the post-NER steps its roadmap names but
never implements (docs/index.md:5-12).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import ray
import ray.data as rd

from ..gazetteer import SABER_GROUNDING, SABER_SURFACES, build_linker_dict
from ..stages.canonicalize import canonicalize_edges, canonicalize_nodes
from ..stages.linker import EntityLinker
from ..stages.tagger import DictionaryTagger
from ..stages.triples import emit_triples, explode_mentions


@dataclass
class KGConfig:
    surfaces: dict[str, str] = field(default_factory=lambda: dict(SABER_SURFACES))
    grounding: dict[tuple[str, str], list[tuple[str, str]]] = field(
        default_factory=lambda: dict(SABER_GROUNDING)
    )
    same_sentence: bool = True     # triple co-occurrence scope
    num_salts: int = 16            # canonicalization salt fan-out
    tagger_concurrency: Any = None  # None → stateless-task semantics via pool of 1..N
    linker_concurrency: Any = None
    batch_size: int | None = 256   # mirrors the reference's PRED_BATCH_SIZE


def annotate(documents: rd.Dataset, config: KGConfig | None = None) -> rd.Dataset:
    """documents → annotated documents (adds ``ents`` + ``span_hash``).

    Tagger and linker run as actor pools so gazetteer compilation and the
    broadcast grounding dictionary load once per actor, not per batch.
    """
    config = config or KGConfig()
    linker_ref = ray.put(build_linker_dict(config.grounding))
    tagged = documents.map_batches(
        DictionaryTagger,
        fn_constructor_kwargs={"surfaces": config.surfaces},
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=config.tagger_concurrency or (1, 8),
    )
    return tagged.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"linker_ref": linker_ref},
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=config.linker_concurrency or (1, 4),
    )


def build_graph(documents: rd.Dataset, config: KGConfig | None = None) -> dict[str, rd.Dataset]:
    """Full pipeline; returns lazy datasets for every logical table."""
    config = config or KGConfig()
    annotated = annotate(documents, config)
    mentions = annotated.map_batches(explode_mentions, batch_format="pyarrow")
    triples = annotated.map_batches(
        lambda b: emit_triples(b, same_sentence=config.same_sentence),
        batch_format="pyarrow",
    )
    nodes = canonicalize_nodes(mentions, num_salts=config.num_salts)
    edges = canonicalize_edges(triples, num_salts=config.num_salts)
    return {
        "annotated": annotated,
        "mentions": mentions,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
    }
