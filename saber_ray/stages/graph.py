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

    ONE shuffle: each edge emits an endpoint row for its src (out=1) and
    dst (in=1), then a single groupby-sum per node.
    """

    def endpoints(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        ones = pa.array([1] * n, type=pa.int64())
        zeros = pa.array([0] * n, type=pa.int64())
        src = batch["src"].combine_chunks() if isinstance(batch["src"], pa.ChunkedArray) else batch["src"]
        dst = batch["dst"].combine_chunks() if isinstance(batch["dst"], pa.ChunkedArray) else batch["dst"]
        return pa.table(
            {
                "node_id": pa.concat_arrays([src, dst]),
                "out_degree": pa.concat_arrays([ones, zeros]),
                "in_degree": pa.concat_arrays([zeros, ones]),
            }
        )

    agg = edges.map_batches(endpoints, batch_format="pyarrow").groupby(
        "node_id"
    ).sum(["out_degree", "in_degree"])

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = pc.cast(batch["sum(out_degree)"], pa.int64())
        inn = pc.cast(batch["sum(in_degree)"], pa.int64())
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


def two_hop_pairs(edges: rd.Dataset, num_partitions: int = 8) -> rd.Dataset:
    """Distinct (src, dst) pairs connected by exactly two directed hops —
    one hash self-join (mid = first hop's dst = second hop's src) plus a
    distinct groupby. The canonical graph-traversal building block; k-hop
    iterates it.
    """
    left = edges.select_columns(["src", "dst"]).rename_columns(
        {"dst": "mid"}
    )
    right = edges.select_columns(["src", "dst"]).rename_columns(
        {"src": "mid", "dst": "dst2"}
    )
    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions, on=("mid",)
    )
    pairs = joined.drop_columns(["mid"]).rename_columns({"dst2": "dst"})
    return pairs.groupby(["src", "dst"]).count().drop_columns(["count()"])


def k_hop_pairs(edges: rd.Dataset, k: int, num_partitions: int = 8) -> rd.Dataset:
    """Distinct (src, dst) pairs connected by exactly k directed hops.

    Iterates the self-join k-1 times. Between hops the frontier is
    deduped, REPARTITIONED and materialized: Ray's hash join emits
    schema-less empty partition blocks that poison a subsequent join,
    and the repartition rebuilds clean uniform blocks (the frontier is
    the deduped pair set — small relative to the corpus).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    frontier = edges.select_columns(["src", "dst"])
    right = edges.select_columns(["src", "dst"]).rename_columns(
        {"src": "mid", "dst": "dst2"}
    )
    for _ in range(k - 1):
        left = frontier.rename_columns({"dst": "mid"})
        joined = left.join(
            right, join_type="inner", num_partitions=num_partitions, on=("mid",)
        )
        frontier = (
            joined.drop_columns(["mid"]).rename_columns({"dst2": "dst"})
            .groupby(["src", "dst"]).count().drop_columns(["count()"])
            .repartition(max(2, num_partitions // 2))
            .materialize()
        )
    if k == 1:
        frontier = frontier.groupby(["src", "dst"]).count().drop_columns(["count()"])
    return frontier
