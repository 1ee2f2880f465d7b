"""Fixed Arrow schemas for every logical table (SURVEY.md §7).

The reference has no schema system (dict-key conventions, validated ad
hoc — saber/saber.py:83-86); the engine replaces that with explicit
``pyarrow.Schema`` per table, enforced at stage boundaries via
``enforce()``.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

XREF_STRUCT = pa.struct(
    [
        ("namespace", pa.string()),
        ("id", pa.string()),
        ("organism_id", pa.string()),
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

MENTIONS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("text", pa.string()),
        ("label", pa.string()),
        ("xrefs", pa.list_(XREF_STRUCT)),
        ("entity_id", pa.string()),
    ]
)

TRIPLES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("subj_label", pa.string()),
        ("obj_label", pa.string()),
        ("evidence_span", pa.int32()),
        ("score", pa.float32()),
    ]
)

NODES = pa.schema(
    [
        ("node_id", pa.string()),
        ("label", pa.string()),
        ("canonical_name", pa.string()),
        ("surface_forms", pa.list_(pa.string())),
        ("namespace", pa.string()),
        ("xref_id", pa.string()),
        ("support", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("src", pa.string()),
        ("pred", pa.string()),
        ("dst", pa.string()),
        ("support", pa.int64()),
        ("doc_ids", pa.list_(pa.string())),
    ]
)

MANIFEST = pa.schema(
    [
        ("stage", pa.string()),
        ("partition_id", pa.int64()),
        ("input_fragments", pa.list_(pa.string())),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("span_hash", pa.string()),
        ("wall_ms", pa.int64()),
        ("status", pa.string()),
        ("config_hash", pa.string()),
    ]
)


def enforce(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``schema`` (column order + types); raises on
    missing columns — the stage-boundary contract."""
    return table.select(schema.names).cast(schema)
