"""Readers for the driver's parquet testdata (TESTDATA.md).

The driver corpus ``documents.parquet`` is a flat table
``(doc_id:int64, text, lang, source, n_chars)``; the engine's native
input is the interleaved span schema from BASELINE.json's input_hint.
``read_documents_interleaved`` adapts flat → interleaved with a
vectorized Arrow kernel (one text span per document), so every driver
query exercises the same code path the interleaved corpus does.

All readers prune columns at the scan (``read_parquet(columns=...)``) —
at 100 TB a reader that loads unused columns is wrong.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..schemas import DOCUMENTS


def _flat_to_interleaved(batch: pa.Table) -> pa.Table:
    """(doc_id:int64, text) batch → DOCUMENTS-schema batch, zero row loops.

    Builds the ``spans`` list<struct> column directly from Arrow buffers:
    one text span per document with offsets [0, 1, 2, ...).
    """
    n = batch.num_rows
    doc_ids = pa.compute.cast(batch["doc_id"], pa.string())
    texts = pa.compute.cast(batch["text"], pa.string())
    kinds = pa.array(["text"] * n, type=pa.string())
    media = pa.array([""] * n, type=pa.string())
    offsets = pa.array([0] * n, type=pa.int32())
    structs = pa.StructArray.from_arrays(
        [kinds, texts.combine_chunks(), media, offsets],
        names=["kind", "text", "media_ref", "offset"],
    )
    list_offsets = pa.array(range(n + 1), type=pa.int32())
    spans = pa.ListArray.from_arrays(list_offsets, structs)
    return pa.Table.from_arrays([doc_ids.combine_chunks(), spans], schema=DOCUMENTS)


def read_documents_interleaved(sf_dir: str, **read_kwargs) -> rd.Dataset:
    """Driver documents.parquet → Dataset in the interleaved DOCUMENTS schema."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"], **read_kwargs
    )
    return ds.map_batches(_flat_to_interleaved, batch_format="pyarrow")


def read_documents_flat(sf_dir: str, columns=("doc_id", "text"), **read_kwargs) -> rd.Dataset:
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=list(columns), **read_kwargs
    )


def read_table(sf_dir: str, name: str, columns=None, **read_kwargs) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **read_kwargs)


def read_events_filtered(sf_dir: str, event_type: str, columns=None) -> rd.Dataset:
    """Predicate pushdown at the scan: the row filter is evaluated by the
    parquet reader (row-group statistics prune before decode), so only
    matching rows leave storage — at 100 TB this is the difference
    between reading a column slice and reading everything."""
    import pyarrow.dataset as pads

    return rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=columns,
        filter=pads.field("event_type") == event_type,
    )
