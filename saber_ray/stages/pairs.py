"""Distributed candidate-pair payload attachment + verification plumbing.

Candidate-pair generators (MinHash/SimHash banding, embedding LSH
buckets) emit (id_a, id_b) rows; exact verification (Jaccard, cosine)
needs each pair row to carry BOTH members' payloads (shingle-hash
arrays, embedding vectors). ``attach_pair_payload`` does that without
ever materializing payloads on the driver:

1. the corpus STREAMS once through an ``is_in`` mask that keeps only
   candidate members — no corpus shuffle; only the candidate ID LIST is
   collected driver-side (ids, never payloads: the memory envelope is
   O(#distinct candidate ids × id width), and near-dup candidates are a
   small fraction of any real corpus);
2. two hash ``Dataset.join``s attach the payload to the ``id_a`` and
   ``id_b`` sides — the joins shuffle only pairs + candidate payload
   rows, both already shrunk to the candidate set;
3. between the joins the pair stream is repartitioned + materialized:
   Ray 2.49's hash join (and sort-groupby) emits schema-less EMPTY
   partition blocks that poison a subsequent join, and the repartition
   rebuilds clean uniform blocks (see stages/graph.py ``k_hop_pairs``).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions.arrowtypes import arrow_types

def _cluster_cpus() -> int:
    import ray

    try:
        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 1)))
    except Exception:
        pass
    return 1


def _list_parts(col):
    """ChunkedArray/Array of list<primitive> → (values ndarray, offsets)."""
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values
    lo, hi = int(offsets[0]), int(offsets[-1])
    if lo != 0 or len(values) != hi - lo:
        values = values.slice(lo, hi - lo)
        offsets = offsets - lo
    return values.to_numpy(zero_copy_only=False), offsets


def _encode_list_rows(col, np_dtype) -> pa.Array:
    """list<primitive> column → binary rows (Arrow's hash join rejects
    list-typed non-key fields, so payloads ride through the join as
    fixed-dtype byte strings)."""
    import numpy as np

    values, offsets = _list_parts(col)
    values = np.ascontiguousarray(values, dtype=np_dtype)
    return pa.array(
        [values[offsets[i]:offsets[i + 1]].tobytes() for i in range(len(offsets) - 1)],
        type=pa.binary(),
    )


def _decode_list_rows(col, np_dtype, value_type) -> pa.Array:
    import numpy as np

    rows = [
        np.frombuffer(b, dtype=np_dtype) if b is not None else None
        for b in col.to_pylist()
    ]
    return pa.array([r.tolist() if r is not None else None for r in rows],
                    type=pa.list_(value_type))


def attach_pair_payload(
    pairs: rd.Dataset,
    items: rd.Dataset,
    id_column: str,
    payload_column: str,
    raw_columns: list[str] | None = None,
    payload_builder=None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(id_a, id_b) pairs + (id, payload) corpus →
    (id_a, id_b, payload_a, payload_b), fully distributed.

    When ``payload_builder`` is given, ``items`` carries ``raw_columns``
    instead of a ready payload; the builder maps a FILTERED
    [id, *raw_columns] batch to an [id, payload] batch — so expensive
    payload computation (shingling) runs only on candidate rows.

    Pairs whose members are missing from ``items`` are dropped (inner
    joins). Returns a TYPED empty Dataset when there are no pairs.
    """
    import pyarrow.compute as pc

    # clean uniform blocks before joining (empty-block join quirk), and
    # one driver pass over the (small) pair ids only
    pairs = pairs.select_columns(["id_a", "id_b"]).repartition(8).materialize()
    ids: set = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        ids.update(b["id_a"].to_pylist())
        ids.update(b["id_b"].to_pylist())
    # join fan-out sized to the CANDIDATE SET, capped by the cluster: a
    # few hundred pairs join in 2 partitions (8/16/32 reduce tasks on
    # near-empty shuffles measured 2-4x slower at sf0.1), millions of
    # candidates fan out to 2 x cluster CPUs
    n = num_partitions or max(
        2, min(2 * _cluster_cpus(), len(ids) // 5000 + 2)
    )

    item_types = arrow_types(items)
    id_type = item_types[id_column]
    in_columns = [id_column] + list(raw_columns or [payload_column])
    if payload_builder is None:
        payload_type = item_types[payload_column]
    else:
        # derive the built payload type from an empty probe batch —
        # nothing executes
        probe = pa.table(
            {c: pa.array([], type=item_types[c]) for c in in_columns}
        )
        payload_type = payload_builder(probe).schema.field(payload_column).type
    if not ids:
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], type=id_type),
                    "id_b": pa.array([], type=id_type),
                    "payload_a": pa.array([], type=payload_type),
                    "payload_b": pa.array([], type=payload_type),
                }
            )
        )
    id_set = pa.array(sorted(ids), type=id_type)

    # list payloads ride through the joins as binary (Arrow's hash join
    # rejects list-typed non-key fields) and are decoded back at the end
    is_list = pa.types.is_list(payload_type) or pa.types.is_large_list(payload_type)
    np_dtype = payload_type.value_type.to_pandas_dtype() if is_list else None

    def keep(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.is_in(batch[id_column], value_set=id_set))
        if payload_builder is not None:
            out = payload_builder(out)
        out = out.select([id_column, payload_column])
        if is_list:
            out = out.set_column(
                out.column_names.index(payload_column), payload_column,
                _encode_list_rows(out[payload_column], np_dtype),
            )
        return out

    # corpus streams; only candidate payload rows are retained (and
    # materialized once so the two joins don't re-run the filter scan)
    cand = (
        items.select_columns(in_columns)
        .map_batches(keep, batch_format="pyarrow")
        .repartition(max(2, n // 2))
        .materialize()
    )
    left = cand.rename_columns({id_column: "id_a", payload_column: "payload_a"})
    j1 = (
        pairs.join(left, join_type="inner", num_partitions=n, on=("id_a",))
        .repartition(max(2, n // 2))
        .materialize()  # barrier: rebuild clean blocks before the 2nd join
    )
    right = cand.rename_columns({id_column: "id_b", payload_column: "payload_b"})
    joined = j1.join(right, join_type="inner", num_partitions=n, on=("id_b",))
    if not is_list:
        return joined

    def decode(batch: pa.Table) -> pa.Table:
        for name in ("payload_a", "payload_b"):
            batch = batch.set_column(
                batch.column_names.index(name), name,
                _decode_list_rows(batch[name], np_dtype, payload_type.value_type),
            )
        return batch

    return joined.map_batches(decode, batch_format="pyarrow")
