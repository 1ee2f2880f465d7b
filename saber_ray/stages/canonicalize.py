"""Canonicalization shuffle: mentions → nodes, triples → edges.

This is the engine's only unavoidable all-to-all exchange (SURVEY.md A5 /
J5), so it is built skew-aware from the start:

1. **Batch-level partial aggregation** (``map_batches``, vectorized
   ``pyarrow`` ``group_by`` — no Python row loops): each Arrow batch is
   collapsed to at most one partial row per key before anything is
   shuffled — a hot key ("p53"-like symbols can be 1e6× the median)
   contributes one row per batch instead of one per mention.
2. **Salted first-level merge**: partials are grouped by ``(key, salt)``
   where ``salt = blake2b(key, first_doc) % num_salts`` — deterministic,
   not random, so reruns and resumed runs produce identical outputs. This
   bounds any single ``map_groups`` group to ~#batches / num_salts rows.
3. **Tiny final merge** over ≤ num_salts rows per key.

Surface-form statistics are merged as (surface, count) multisets; merge
states keep 4×MAX_SURFACES entries and the final node caps to
MAX_SURFACES (highest count, then lexicographic), so the intermediate
cap only becomes merge-order-sensitive for entities with >128 distinct
surfaces — supports stay exact regardless. ``canonical_name`` is the
most-supported surface form. Edge lineage keeps a capped sample of
doc_ids.

Node namespace/xref_id are recovered from the ``entity_id`` encoding
(``label:namespace:xref`` for grounded, ``label:surface:<norm>`` for
ungrounded — see stages/linker.py ``entity_id_for``), so the partial
aggregation never touches the nested xrefs column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

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

_PARTIAL_NODES_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("salt", pa.int64()),
        ("surfaces", pa.list_(pa.string())),
        ("counts", pa.list_(pa.int64())),
        ("support", pa.int64()),
    ]
)


def partial_nodes(batch: pa.Table, num_salts: int = 16) -> pa.Table:
    """MENTIONS batch → one partial-node row per entity_id in the batch.

    Vectorized: one ``pyarrow`` ``group_by`` on (entity_id, surface),
    then a single ordered pass over the (already tiny) distinct rows.
    """
    surface = pc.replace_substring_regex(
        pc.utf8_lower(batch["text"]), r"\s+", " "
    )
    t = pa.table(
        {
            "entity_id": batch["entity_id"],
            "surface": surface,
            "doc_id": batch["doc_id"],
        }
    )
    agg = (
        t.group_by(["entity_id", "surface"])
        .aggregate([("surface", "count"), ("doc_id", "min")])
        .sort_by([("entity_id", "ascending"), ("surface", "ascending")])
    )
    eids = agg["entity_id"].to_pylist()
    surfs = agg["surface"].to_pylist()
    counts = agg["surface_count"].to_pylist()
    docs = agg["doc_id_min"].to_pylist()

    rows = {k: [] for k in _PARTIAL_NODES_SCHEMA.names}
    i, n = 0, len(eids)
    while i < n:
        j = i
        counter: dict[str, int] = {}
        first_doc = docs[i]
        total = 0
        while j < n and eids[j] == eids[i]:
            c = int(counts[j])
            counter[surfs[j]] = counter.get(surfs[j], 0) + c
            total += c
            if docs[j] < first_doc:
                first_doc = docs[j]
            j += 1
        # support counts ALL mentions, including surfaces trimmed by the cap.
        # Batch partials keep the 4x INTERMEDIATE cap (like the merge
        # states) — capping at MAX_SURFACES here would silently drop a
        # globally-frequent surface that is locally rank >32 in every
        # batch, corrupting canonical_name for >32-surface entities; the
        # final node state is what trims to MAX_SURFACES
        counter = _top_counts(counter, MAX_SURFACES * 4)
        rows["entity_id"].append(eids[i])
        rows["salt"].append(stable_u64(f"{eids[i]}\x1f{first_doc}") % num_salts)
        rows["surfaces"].append(sorted(counter))
        rows["counts"].append([counter[s] for s in sorted(counter)])
        rows["support"].append(total)
        i = j
    return pa.Table.from_pydict(rows, schema=_PARTIAL_NODES_SCHEMA)


def _node_state_agg():
    """AggregateFn merging node partials: (surface-count multiset capped
    at MAX_SURFACES, total support).

    The accumulator is a JSON STRING at every step — Ray serializes
    accumulators into Arrow blocks between the map and reduce phases of
    a sort-based aggregate, so a Python (dict, int) tuple there forces
    object-dtype fallback blocks (ArrowConversionError spam)."""
    import json

    from ray.data.aggregate import AggregateFn

    empty = json.dumps([[], 0])

    def _merge_states(a: str, b: str) -> str:
        items_a, sup_a = json.loads(a)
        items_b, sup_b = json.loads(b)
        counter = dict(items_a)
        for s, c in items_b:
            counter[s] = counter.get(s, 0) + c
        # intermediate states keep a wider multiset so the final cap is
        # (practically) merge-order independent
        counter = _top_counts(counter, MAX_SURFACES * 4)
        return json.dumps([sorted(counter.items()), sup_a + sup_b])

    def accumulate_block(acc: str, block) -> str:
        counter: dict[str, int] = {}
        support = 0
        for surfaces, counts, sup in zip(
            block["surfaces"].to_pylist(), block["counts"].to_pylist(),
            block["support"].to_pylist(),
        ):
            for s, c in zip(surfaces, counts):
                counter[s] = counter.get(s, 0) + int(c)
            support += int(sup)
        state = json.dumps([sorted(_top_counts(counter, MAX_SURFACES * 4).items()), support])
        return _merge_states(acc or empty, state)

    return AggregateFn(
        init=lambda k: empty,
        merge=lambda a, b: _merge_states(a or empty, b or empty),
        accumulate_block=accumulate_block,
        name="node_state",
    )


def _state_to_partials(batch: pa.Table) -> pa.Table:
    """Level-1 aggregate output → partial-node rows for the final level."""
    import json

    rows = {k: [] for k in _PARTIAL_NODES_SCHEMA.names}
    for eid, state in zip(
        batch["entity_id"].to_pylist(), batch["node_state"].to_pylist()
    ):
        items, support = json.loads(state)
        counter = dict(items)
        rows["entity_id"].append(eid)
        rows["salt"].append(0)
        rows["surfaces"].append(sorted(counter))
        rows["counts"].append([counter[s] for s in sorted(counter)])
        rows["support"].append(int(support))
    return pa.Table.from_pydict(rows, schema=_PARTIAL_NODES_SCHEMA)


def _states_to_nodes(batch: pa.Table) -> pa.Table:
    """Final aggregate output → NODES-schema rows."""
    import json

    rows = {k: [] for k in NODES.names}
    for eid, state in zip(
        batch["entity_id"].to_pylist(), batch["node_state"].to_pylist()
    ):
        items, support = json.loads(state)
        counter = _top_counts(dict(items), MAX_SURFACES)
        label, kind, rest = eid.split(":", 2)
        namespace, xref_id = ("", "") if kind == "surface" else (kind, rest)
        canonical = min(counter, key=lambda s: (-counter[s], s)) if counter else ""
        rows["node_id"].append(eid)
        rows["label"].append(label)
        rows["canonical_name"].append(canonical)
        rows["surface_forms"].append(sorted(counter))
        rows["namespace"].append(namespace)
        rows["xref_id"].append(xref_id)
        rows["support"].append(int(support))
    return pa.Table.from_pydict(rows, schema=NODES)


def reduce_node_partials(partials, num_partitions: int | None = None):
    """Salted two-level merge of ``partial_nodes`` rows → NODES rows.

    Both levels are native ``groupby().aggregate`` with a
    multiset-merging AggregateFn — no per-group Python/pandas. Split out
    of ``canonicalize_nodes`` so the resumable job can stage partials to
    parquet (hive-partitioned by key-hash group) and reduce each group
    as its own checkpointed unit.
    """
    if num_partitions:
        # coalesce the (small) partial stream — see canonicalize_edges;
        # partition count scales with the cluster, never a fixed constant
        partials = partials.repartition(num_partitions)
    level1 = partials.groupby(["entity_id", "salt"]).aggregate(_node_state_agg())
    level2_in = level1.map_batches(_state_to_partials, batch_format="pyarrow")
    final = level2_in.groupby("entity_id").aggregate(_node_state_agg())
    return final.map_batches(_states_to_nodes, batch_format="pyarrow")


def canonicalize_nodes(mentions, num_salts: int = 16):
    """MENTIONS Dataset → NODES Dataset (partials + salted reduce)."""
    from ..functions.partitioning import shuffle_partitions

    partials = mentions.map_batches(
        lambda b: partial_nodes(b, num_salts), batch_format="pyarrow"
    )
    return reduce_node_partials(partials, shuffle_partitions(num_salts, mentions))


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
    """TRIPLES batch → one partial-edge row per (subj, pred, obj).

    Vectorized ``group_by``; the only per-row work runs over the
    already-reduced distinct keys. Lineage keeps the min/max doc_id per
    key per batch (a cheap deterministic sample — a full per-batch
    distinct list would make hot keys O(batch) to sort); samples union
    and cap during the merge levels.
    """
    t = batch.select(["doc_id", "subj", "pred", "obj", "score"])
    agg = t.group_by(["subj", "pred", "obj"]).aggregate(
        [("score", "sum"), ("doc_id", "min"), ("doc_id", "max")]
    )
    subj = agg["subj"].to_pylist()
    pred = agg["pred"].to_pylist()
    obj = agg["obj"].to_pylist()
    first_doc = agg["doc_id_min"].to_pylist()
    last_doc = agg["doc_id_max"].to_pylist()
    salts = [
        stable_u64(f"{s}\x1f{p}\x1f{o}\x1f{d}") % num_salts
        for s, p, o, d in zip(subj, pred, obj, first_doc)
    ]
    return pa.Table.from_pydict(
        {
            "src": subj,
            "pred": pred,
            "dst": obj,
            "salt": salts,
            "support": [int(x) for x in agg["score_sum"].to_pylist()],
            "doc_ids": [
                [a] if a == b else [a, b] for a, b in zip(first_doc, last_doc)
            ],
        },
        schema=_PARTIAL_EDGES_SCHEMA,
    )


def _doc_sample_agg():
    """Custom AggregateFn: union + cap of doc_id lineage samples.

    Accumulates per BLOCK (vectorized flatten of the already-tiny
    partial rows), so the shuffle reduce never loops rows in pandas.
    """
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc: list, block) -> list:
        col = block["doc_ids"]
        flat = pc.list_flatten(col).to_pylist() if block.num_rows else []
        merged = set(acc)
        merged.update(flat)
        return sorted(merged)[:MAX_DOC_IDS]

    return AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: sorted(set(a) | set(b))[:MAX_DOC_IDS],
        accumulate_block=accumulate_block,
        name="doc_ids",
    )


def reduce_edge_partials(partials, num_partitions: int | None = None):
    """Salted two-level merge of ``partial_edges`` rows → EDGES rows
    (vectorized Sum + block-wise lineage union) — no per-group Python.
    Split out of ``canonicalize_edges`` for the resumable job's staged,
    per-group checkpointed graph reduce."""
    from ray.data.aggregate import Sum

    if num_partitions:
        # coalesce the (small) partial stream: sort-based Aggregate creates
        # one reduce partition per input block, and hundreds of near-empty
        # reduce tasks cost more than the aggregation itself; the count
        # scales with cluster width so a 4N-node run gets 4x the reduce
        # partitions
        partials = partials.repartition(num_partitions)
    level1 = partials.groupby(["src", "pred", "dst", "salt"]).aggregate(
        Sum("support", alias_name="support"), _doc_sample_agg()
    )
    edges = level1.groupby(["src", "pred", "dst"]).aggregate(
        Sum("support", alias_name="support"), _doc_sample_agg()
    )

    def finalize(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "src": t["src"],
                "pred": t["pred"],
                "dst": t["dst"],
                "support": pc.cast(t["support"], pa.int64()),
                "doc_ids": pc.cast(t["doc_ids"], pa.list_(pa.string())),
            }
        )
        return out.cast(EDGES)

    return edges.map_batches(finalize, batch_format="pyarrow")


def canonicalize_edges(triples, num_salts: int = 16):
    """TRIPLES Dataset → EDGES Dataset (partials + salted reduce)."""
    from ..functions.partitioning import shuffle_partitions

    partials = triples.map_batches(
        lambda b: partial_edges(b, num_salts), batch_format="pyarrow"
    )
    return reduce_edge_partials(partials, shuffle_partitions(num_salts, triples))
