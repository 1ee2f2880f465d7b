"""Semi-structured column normalization: extract typed fields out of
JSON-string columns (the ``events.props`` shape — every event pipeline
carries one of these).

Scale notes: extraction is a stateless ``map_batches`` kernel, so it
streams. The hot path is vectorized through polars'
``str.json_path_match`` (Rust JSON parser over the Arrow column,
zero-copy in/out) when polars is importable; the fallback is stdlib
``json`` row-parsing — correct but slower, gated exactly like the other
optional-dependency paths (see stages/media.py).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

try:  # optional fast path — baked into the target image, gated anyway
    import polars as pl
except Exception:  # pragma: no cover
    pl = None


def extract_json_fields(
    batch: pa.Table,
    column: str,
    fields: dict[str, pa.DataType],
    drop_source: bool = False,
) -> pa.Table:
    """Append one typed column per top-level JSON key in ``fields``
    (missing keys / malformed documents yield null, matching SQL
    ``json_extract_string``'s NULL semantics). Batch-level kernel —
    compose with ``Dataset.map_batches``.
    """
    if pl is not None:
        frame = pl.from_arrow(batch.select([column]))
        exprs = [
            pl.col(column).str.json_path_match(f"$.{key}").alias(key)
            for key in fields
        ]
        extracted = frame.select(exprs).to_arrow()
        for key, typ in fields.items():
            # cast unconditionally: polars round-trips as large_string
            batch = batch.append_column(key, pc.cast(extracted[key], typ))
    else:  # stdlib fallback: JSON parsing has no pyarrow kernel
        texts = batch[column].to_pylist()
        for key, typ in fields.items():
            vals = []
            for t in texts:
                try:
                    v = json.loads(t).get(key) if t else None
                except (ValueError, TypeError):
                    v = None
                vals.append(v)
            batch = batch.append_column(key, pa.array(vals, type=typ))
    if drop_source:
        batch = batch.drop_columns([column])
    return batch


def json_field_summary(
    events: rd.Dataset,
    column: str = "props",
    key: str = "k",
    value_column: str = "value",
) -> rd.Dataset:
    """Per-extracted-key aggregate over an event stream:
    (key, n, total) — extraction fused into the same streaming pass as
    the per-batch partial sums, then ONE groupby merges partials.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ext = extract_json_fields(batch, column, {key: pa.int64()})
        agg = (
            ext.select([key, value_column])
            .group_by(key)
            .aggregate([(value_column, "sum"), ([], "count_all")])
        )
        return agg.rename_columns([key, "total", "n"])

    merged = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .sum(["total", "n"])
    )
    return merged.map_batches(
        lambda b: pa.table({
            key: b[key],
            "n": pc.cast(b["sum(n)"], pa.int64()),
            "total": pc.round(b["sum(total)"], 6,
                              round_mode="half_towards_infinity"),
        }),
        batch_format="pyarrow",
    )
