"""Graph-table analytics over the materialized nodes/edges: degree
computation and top-k edge ranking — the consumption side of the KG
(the reference stops at annotation records; these are the first queries
any downstream graph user runs).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def node_degrees(edges: rd.Dataset) -> rd.Dataset:
    """(node_id, out_degree, in_degree, degree) from the EDGES table.

    Two keyed counts + an outer merge, all streaming; at scale this is
    two shuffles over the (already canonicalized, small-ish) edge list.
    """
    out_deg = edges.groupby("src").count().rename_columns(
        {"src": "node_id", "count()": "out_degree"}
    )
    in_deg = edges.groupby("dst").count().rename_columns(
        {"dst": "node_id", "count()": "in_degree"}
    )

    def tag(batch: pa.Table, col: str, other: str) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node_id": batch["node_id"],
                "out_degree": pc.cast(
                    batch[col] if col == "out_degree" else pa.nulls(batch.num_rows, pa.int64()),
                    pa.int64(),
                ),
                "in_degree": pc.cast(
                    batch[col] if col == "in_degree" else pa.nulls(batch.num_rows, pa.int64()),
                    pa.int64(),
                ),
            }
        )

    both = out_deg.map_batches(
        lambda b: tag(b, "out_degree", "in_degree"), batch_format="pyarrow"
    ).union(
        in_deg.map_batches(lambda b: tag(b, "in_degree", "out_degree"), batch_format="pyarrow")
    )
    agg = both.groupby("node_id").sum(["out_degree", "in_degree"])

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = pc.coalesce(pc.cast(batch["sum(out_degree)"], pa.int64()), pa.scalar(0, pa.int64()))
        inn = pc.coalesce(pc.cast(batch["sum(in_degree)"], pa.int64()), pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "node_id": batch["node_id"],
                "out_degree": out,
                "in_degree": inn,
                "degree": pc.add(out, inn),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def top_edges(edges: rd.Dataset, k: int = 10) -> rd.Dataset:
    """Top-k edges by support (deterministic tie-break on the triple)."""
    return edges.sort(
        ["support", "src", "pred", "dst"], descending=[True, False, False, False]
    ).limit(k)
