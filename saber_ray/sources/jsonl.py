"""JSON-Lines document source/sink — the interchange format most
LLM-training corpora ship in (one JSON object per line, gz-splittable at
the file level).

Reading builds on ``ray.data.read_json`` (file-level parallelism, Arrow
JSON decoder per block) with column pruning and an explicit schema
normalization step: heterogeneous JSONL shards often disagree on column
order/presence, and Ray unions block schemas lazily — ``columns=``
projects to the requested set, filling absent fields with typed nulls so
every downstream stage sees ONE schema. Writing is a per-block Arrow →
ndjson encode (no driver materialization), partitioned like every other
sink (one file per block → resumable, parallel re-read).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def read_jsonl(
    paths, columns: list[str] | None = None, **read_kwargs
) -> rd.Dataset:
    """Read one or many ``.jsonl`` files/directories into a Dataset.

    ``columns`` prunes to the named fields and GUARANTEES they exist in
    every output block (absent fields become null-typed columns, which
    Arrow's schema unification promotes to the field's real type from
    the shards that do carry it) — heterogeneous shards stop being a
    downstream schema-mismatch crash.
    """
    ds = rd.read_json(paths, **read_kwargs)
    if columns is None:
        return ds

    def project(batch: pa.Table) -> pa.Table:
        out = {}
        for c in columns:
            if c in batch.column_names:
                out[c] = batch[c]
            else:
                # null TYPE, not a hardcoded string type: a string-null
                # block would conflict with e.g. int64 blocks from
                # shards that do carry the field
                out[c] = pa.nulls(batch.num_rows)
        return pa.table(out)

    return ds.map_batches(project, batch_format="pyarrow")


def write_jsonl(ds: rd.Dataset, path: str) -> None:
    """Write a Dataset as JSON-Lines, one file per block (the resumable
    layout every sink here uses — a crashed write re-runs per block, and
    re-reads parallelize at file level)."""
    ds.write_json(path)
