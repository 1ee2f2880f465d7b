"""Demo KG pipeline over the driver testdata corpus
(/root/testdata/sf*/documents.parquet — bag-of-words docs over a
data-engine vocabulary).

Runs the SAME stages as the flagship biomedical pipeline (tagger →
linker → triples → salted canonicalization) with the DEMO gazetteer,
and exposes each logical output in a shape a DuckDB oracle can
reproduce exactly (single-token surfaces; doc-level co-occurrence with
the subject being the earlier occurrence; integer supports).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..gazetteer import DEMO_GAZETTEER, DEMO_GROUNDING
from ..sources.testdata import read_documents_interleaved
from ..stages.canonicalize import canonicalize_edges, canonicalize_nodes
from ..stages.triples import emit_triples, explode_mentions
from .kg import KGConfig, annotate


def demo_config(batch_size: int | None = 256) -> KGConfig:
    return KGConfig(
        surfaces=dict(DEMO_GAZETTEER),
        grounding=dict(DEMO_GROUNDING),
        same_sentence=False,  # testdata docs are single-sentence word bags
        batch_size=batch_size,
    )


def demo_annotated(sf_dir: str, config: KGConfig | None = None) -> rd.Dataset:
    docs = read_documents_interleaved(sf_dir)
    return annotate(docs, config or demo_config())


def demo_mentions(sf_dir: str) -> rd.Dataset:
    """(doc_id:int64, mention, label) — one row per mention occurrence."""
    ann = demo_annotated(sf_dir)
    ments = ann.map_batches(explode_mentions, batch_format="pyarrow")

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "mention": batch["text"],
                "label": batch["label"],
            }
        )

    return ments.map_batches(shape, batch_format="pyarrow")


def demo_mention_counts(sf_dir: str) -> rd.Dataset:
    """(label, mention, n) — global mention frequency."""
    counts = demo_mentions(sf_dir).groupby(["label", "mention"]).count()
    return counts.rename_columns({"count()": "n"})


def demo_triples(sf_dir: str) -> rd.Dataset:
    """(doc_id:int64, subj, pred, obj, n) — per-doc co-occurrence triples."""
    ann = demo_annotated(sf_dir)
    trip = ann.map_batches(
        lambda b: emit_triples(b, same_sentence=False), batch_format="pyarrow"
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "subj": batch["subj"],
                "pred": batch["pred"],
                "obj": batch["obj"],
                "n": pc.cast(batch["score"], pa.int64()),
            }
        )

    return trip.map_batches(shape, batch_format="pyarrow")


def demo_graph(sf_dir: str) -> dict[str, rd.Dataset]:
    """Full demo graph: salted canonicalization to nodes + edges."""
    config = demo_config()
    ann = demo_annotated(sf_dir, config)
    mentions = ann.map_batches(explode_mentions, batch_format="pyarrow")
    triples = ann.map_batches(
        lambda b: emit_triples(b, same_sentence=False), batch_format="pyarrow"
    )
    return {
        "nodes": canonicalize_nodes(mentions, num_salts=config.num_salts),
        "edges": canonicalize_edges(triples, num_salts=config.num_salts),
    }


def demo_nodes(sf_dir: str) -> rd.Dataset:
    nodes = demo_graph(sf_dir)["nodes"]
    return nodes.select_columns(["node_id", "label", "canonical_name", "support"])


def demo_edges(sf_dir: str) -> rd.Dataset:
    edges = demo_graph(sf_dir)["edges"]
    return edges.select_columns(["src", "pred", "dst", "support"])
