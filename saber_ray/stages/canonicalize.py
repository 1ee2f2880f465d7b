"""Canonicalization shuffle: mentions → nodes, triples → edges.

This is the engine's only unavoidable all-to-all exchange (SURVEY.md A5 /
J5), so it is built skew-aware from the start:

1. **Batch-level partial aggregation** (``map_batches``): each Arrow batch
   is collapsed to at most one partial row per key before anything is
   shuffled — a hot key ("p53"-like symbols can be 1e6× the median)
   contributes one row per batch instead of one per mention.
2. **Salted first-level merge**: partials are grouped by ``(key, salt)``
   where ``salt = blake2b(key, first_doc) % num_salts`` — deterministic,
   not random, so reruns and resumed runs produce identical outputs. This
   bounds any single ``map_groups`` group to ~#batches / num_salts rows.
3. **Tiny final merge** over ≤ num_salts rows per key.

Surface-form statistics are merged as (surface, count) multisets capped at
``max_surfaces`` (kept deterministically: highest count, then
lexicographic), and ``canonical_name`` is the most-supported surface form.
Edge lineage keeps a capped, deterministic sample of doc_ids.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_u64
from ..schemas import EDGES, NODES

MAX_SURFACES = 32
MAX_DOC_IDS = 10


def _top_counts(counter: dict[str, int], cap: int) -> dict[str, int]:
    if len(counter) <= cap:
        return counter
    keep = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    return dict(keep)


# ---------------------------------------------------------------- nodes ---


def partial_nodes(batch: pa.Table, num_salts: int = 16) -> pa.Table:
    """MENTIONS batch → one partial-node row per (entity_id) in the batch."""
    df = batch.select(["doc_id", "text", "label", "entity_id", "xrefs"]).to_pandas()
    if df.empty:
        return pa.Table.from_pydict(
            {
                "entity_id": [], "salt": [], "label": [], "namespace": [],
                "xref_id": [], "surfaces": [], "counts": [], "support": [],
            },
            schema=_PARTIAL_NODES_SCHEMA,
        )
    df["surface"] = df["text"].str.lower().str.replace(r"\s+", " ", regex=True)
    rows = {k: [] for k in ("entity_id", "salt", "label", "namespace", "xref_id",
                            "surfaces", "counts", "support")}
    for entity_id, g in df.groupby("entity_id", sort=True):
        counts = g["surface"].value_counts()
        counter = _top_counts(dict(counts), MAX_SURFACES)
        xrefs = g["xrefs"].iloc[0]
        first_doc = g["doc_id"].iloc[0]
        rows["entity_id"].append(entity_id)
        rows["salt"].append(stable_u64(f"{entity_id}\x1f{first_doc}") % num_salts)
        rows["label"].append(g["label"].iloc[0])
        rows["namespace"].append(xrefs[0]["namespace"] if len(xrefs) else "")
        rows["xref_id"].append(xrefs[0]["id"] if len(xrefs) else "")
        rows["surfaces"].append(sorted(counter))
        rows["counts"].append([counter[s] for s in sorted(counter)])
        rows["support"].append(int(len(g)))
    return pa.Table.from_pydict(rows, schema=_PARTIAL_NODES_SCHEMA)


_PARTIAL_NODES_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("salt", pa.int64()),
        ("label", pa.string()),
        ("namespace", pa.string()),
        ("xref_id", pa.string()),
        ("surfaces", pa.list_(pa.string())),
        ("counts", pa.list_(pa.int64())),
        ("support", pa.int64()),
    ]
)


def _merge_node_partials(g: pd.DataFrame) -> pd.DataFrame:
    counter: dict[str, int] = {}
    for surfaces, counts in zip(g["surfaces"], g["counts"]):
        for s, c in zip(surfaces, counts):
            counter[s] = counter.get(s, 0) + int(c)
    counter = _top_counts(counter, MAX_SURFACES)
    return pd.DataFrame(
        {
            "entity_id": [g["entity_id"].iloc[0]],
            "salt": [0],
            "label": [g["label"].iloc[0]],
            "namespace": [g["namespace"].iloc[0]],
            "xref_id": [g["xref_id"].iloc[0]],
            "surfaces": [sorted(counter)],
            "counts": [[counter[s] for s in sorted(counter)]],
            "support": [int(g["support"].sum())],
        }
    )


def _finalize_node(g: pd.DataFrame) -> pd.DataFrame:
    merged = _merge_node_partials(g)
    counter = dict(zip(merged["surfaces"].iloc[0], merged["counts"].iloc[0]))
    canonical = min(counter, key=lambda s: (-counter[s], s)) if counter else ""
    return pd.DataFrame(
        {
            "node_id": [merged["entity_id"].iloc[0]],
            "label": [merged["label"].iloc[0]],
            "canonical_name": [canonical],
            "surface_forms": [sorted(counter)],
            "namespace": [merged["namespace"].iloc[0]],
            "xref_id": [merged["xref_id"].iloc[0]],
            "support": [int(merged["support"].iloc[0])],
        }
    )


def canonicalize_nodes(mentions, num_salts: int = 16):
    """MENTIONS Dataset → NODES Dataset (salted two-level merge)."""
    partials = mentions.map_batches(
        lambda b: partial_nodes(b, num_salts), batch_format="pyarrow"
    )
    level1 = partials.groupby(["entity_id", "salt"]).map_groups(
        _merge_node_partials, batch_format="pandas"
    )
    nodes = level1.groupby("entity_id").map_groups(
        _finalize_node, batch_format="pandas"
    )
    return nodes.map_batches(
        lambda t: t.cast(NODES) if t.schema.names == NODES.names else t.select(NODES.names).cast(NODES),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- edges ---

_PARTIAL_EDGES_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("pred", pa.string()),
        ("dst", pa.string()),
        ("salt", pa.int64()),
        ("support", pa.int64()),
        ("doc_ids", pa.list_(pa.string())),
    ]
)


def partial_edges(batch: pa.Table, num_salts: int = 16) -> pa.Table:
    """TRIPLES batch → one partial-edge row per (subj, pred, obj)."""
    df = batch.select(["doc_id", "subj", "pred", "obj", "score"]).to_pandas()
    rows = {k: [] for k in ("src", "pred", "dst", "salt", "support", "doc_ids")}
    for (subj, pred, obj), g in df.groupby(["subj", "pred", "obj"], sort=True):
        docs = sorted(set(g["doc_id"]))[:MAX_DOC_IDS]
        rows["src"].append(subj)
        rows["pred"].append(pred)
        rows["dst"].append(obj)
        rows["salt"].append(
            stable_u64(f"{subj}\x1f{pred}\x1f{obj}\x1f{g['doc_id'].iloc[0]}") % num_salts
        )
        rows["support"].append(int(g["score"].sum()))
        rows["doc_ids"].append(docs)
    return pa.Table.from_pydict(rows, schema=_PARTIAL_EDGES_SCHEMA)


def _merge_edge_partials(g: pd.DataFrame) -> pd.DataFrame:
    docs: set[str] = set()
    for d in g["doc_ids"]:
        docs.update(d)
    return pd.DataFrame(
        {
            "src": [g["src"].iloc[0]],
            "pred": [g["pred"].iloc[0]],
            "dst": [g["dst"].iloc[0]],
            "salt": [0],
            "support": [int(g["support"].sum())],
            "doc_ids": [sorted(docs)[:MAX_DOC_IDS]],
        }
    )


def canonicalize_edges(triples, num_salts: int = 16):
    """TRIPLES Dataset → EDGES Dataset (salted two-level merge)."""
    partials = triples.map_batches(
        lambda b: partial_edges(b, num_salts), batch_format="pyarrow"
    )
    level1 = partials.groupby(["src", "pred", "dst", "salt"]).map_groups(
        _merge_edge_partials, batch_format="pandas"
    )
    edges = level1.groupby(["src", "pred", "dst"]).map_groups(
        _merge_edge_partials, batch_format="pandas"
    )
    return edges.map_batches(
        lambda t: t.select(EDGES.names).cast(EDGES), batch_format="pyarrow"
    )
