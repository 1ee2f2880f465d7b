"""Graph-table analytics over the materialized nodes/edges: degree
computation and top-k edge ranking — the consumption side of the KG
(the reference stops at annotation records; these are the first queries
any downstream graph user runs).
"""

from __future__ import annotations

import math

import pyarrow as pa

import ray.data as rd

from ..functions.partitioning import shuffle_partitions


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


def two_hop_pairs(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Distinct (src, dst) pairs connected by exactly two directed hops —
    one hash self-join (mid = first hop's dst = second hop's src) plus a
    distinct groupby. The canonical graph-traversal building block; k-hop
    iterates it.

    Pass a materialized or file-backed ``edges`` table: Ray Data has no
    common-subexpression reuse, so a lazily DERIVED lineage re-executes
    once per join branch — doubling the upstream work and, if upstream
    holds an actor pool, running two pools concurrently (which can
    oversubscribe a small cluster).
    """
    num_partitions = num_partitions or shuffle_partitions(8)
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


def k_hop_pairs(edges: rd.Dataset, k: int, num_partitions: int | None = None) -> rd.Dataset:
    """Distinct (src, dst) pairs connected by exactly k directed hops.

    Iterates the self-join k-1 times. Between hops the frontier is
    deduped, REPARTITIONED and materialized: Ray's hash join emits
    schema-less empty partition blocks that poison a subsequent join,
    and the repartition rebuilds clean uniform blocks (the frontier is
    the deduped pair set — small relative to the corpus).
    """
    num_partitions = num_partitions or shuffle_partitions(8)
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


def connected_components(
    pairs: rd.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Undirected pair Dataset → (node, component): min-label
    propagation until fixed point — ``component`` is the smallest node
    id reachable from ``node``.

    The classic iterative-join components algorithm (one hash join +
    one min-groupby per round, O(graph diameter) rounds); labels are
    re-materialized each round (the chained-join empty-block quirk, see
    ``k_hop_pairs``). Convergence is detected by a distributed label
    signature (count + hash sum) — min-propagation is monotone, so an
    unchanged signature IS the fixed point; nothing but the two scalar
    aggregates ever reaches the driver. ``max_iters`` bounds pathological
    diameters with a warning, never silently.

    Scale note: each round shuffles (edges + labels) once. For near-dup
    clustering the pair graph is a small fraction of the corpus; for
    KG-sized graphs prefer fewer, bigger rounds via higher
    ``num_partitions``.
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import logging

    from ..functions.hashing import stable_u64

    def both_dirs(batch: pa.Table) -> pa.Table:
        # native id type preserved: min-label semantics must match the
        # id domain (lexicographic for strings, numeric for ints)
        a = batch[id_a].combine_chunks()
        b = batch[id_b].combine_chunks()
        return pa.table({
            "u": pa.concat_arrays([a, b]),
            "v": pa.concat_arrays([b, a]),
        })

    edges = (
        pairs.map_batches(both_dirs, batch_format="pyarrow")
        .repartition(max(2, num_partitions // 2))
        .materialize()
    )

    labels = (
        edges.groupby("u").count().drop_columns(["count()"])
        .rename_columns({"u": "node"})
        .map_batches(
            lambda b: b.append_column("label", b["node"]),
            batch_format="pyarrow",
        )
        .repartition(max(2, num_partitions // 2))
        .materialize()
    )

    def signature(lab: rd.Dataset) -> tuple:
        def h(batch: pa.Table) -> pa.Table:
            s = 0
            for n, l in zip(batch["node"].to_pylist(), batch["label"].to_pylist()):
                s = (s + stable_u64(f"{n}\x1f{l}")) & ((1 << 63) - 1)
            return pa.table({"h": pa.array([s], type=pa.int64()),
                             "n": pa.array([batch.num_rows], type=pa.int64())})

        agg = lab.map_batches(h, batch_format="pyarrow").sum(["h", "n"])
        if agg is None:
            return (0, 0)
        return (agg["sum(h)"], agg["sum(n)"])

    prev_sig = signature(labels)
    for it in range(max_iters):
        lab_u = labels.rename_columns({"node": "u"})
        recv = (
            edges.join(lab_u, join_type="inner", num_partitions=num_partitions,
                       on=("u",))
            .select_columns(["v", "label"])
            .rename_columns({"v": "node"})
        )
        labels = (
            labels.union(recv)
            .groupby("node").min("label")
            .rename_columns({"min(label)": "label"})
            .repartition(max(2, num_partitions // 2))
            .materialize()
        )
        sig = signature(labels)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        logging.getLogger(__name__).warning(
            "connected_components hit max_iters=%d before the fixed "
            "point; labels may span partial components", max_iters,
        )
    return labels.rename_columns({"label": "component"})


def _pagerank_local(e: rd.Dataset, iterations: int, damping: float,
                    weighted: bool = False,
                    id_type: "pa.DataType | None" = None) -> rd.Dataset:
    """Small-graph fast path: power-iterate the collected deduped edge
    list with numpy scatter-adds (same synchronous update as the
    distributed path, bit-identical after the 6-decimal round)."""
    import numpy as np
    import pyarrow.compute as pc

    rows = e.take_all()
    src = [r["src"] for r in rows]
    dst = [r["dst"] for r in rows]
    nodes = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(nodes)}
    si = np.array([idx[s] for s in src], dtype=np.int64)
    di = np.array([idx[d] for d in dst], dtype=np.int64)
    n = len(nodes)
    if weighted:
        w = np.array([float(r["w"]) for r in rows], dtype=np.float64)
        outw = np.bincount(si, weights=w, minlength=n)
    else:
        w = np.ones(len(rows), dtype=np.float64)
        outw = np.bincount(si, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = rank[si] * w / outw[si]
        inflow = np.bincount(di, weights=contrib, minlength=n)
        rank = base + damping * inflow
    out = pa.table({
        "node": pa.array(nodes, type=id_type or pa.string()),
        "rank": pa.array(rank, type=pa.float64()),
    })
    out = out.set_column(
        1, "rank", pc.round(out["rank"], 6, round_mode="half_towards_infinity")
    )
    return rd.from_arrow(out)


def pagerank(
    edges: rd.Dataset,
    iterations: int = 5,
    damping: float = 0.85,
    num_partitions: int | None = None,
    local_threshold: int = 100_000,
    weight_column: str | None = None,
) -> rd.Dataset:
    """PageRank over the directed (src, dst) edge table — ``iterations``
    synchronous power steps, uniform init 1/N, dangling mass dropped
    (rank renormalizes through the (1-d)/N term, matching the common
    simplified formulation).

    Distributed shape per iteration: ONE hash join (ranks ⨝ edges on
    src — rank mass flows along edges) and ONE groupby(dst) sum. The
    rank table is (node, rank) — never broadcast, so the same plan runs
    when nodes outnumber driver memory; between iterations the small
    rank table is repartitioned + materialized (the same empty-block
    join hygiene as ``k_hop_pairs``).

    When the DEDUPED edge list fits on the driver
    (``local_threshold`` rows — the canonical KG's edge table, not the
    corpus), the power iteration runs as local numpy instead: identical
    math, none of the per-iteration join/actor overhead. Same output
    either way.

    Returns (node, rank) with rank rounded to 6 decimals — the chained-
    CTE DuckDB oracle (one CTE per iteration) reproduces it exactly.
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    weighted = weight_column is not None
    if weighted:
        # edge weight = weight_column summed over duplicate (src, dst)
        # rows; transition probability becomes w(u,v) / W_out(u)
        e = (
            edges.select_columns(["src", "dst", weight_column])
            .groupby(["src", "dst"]).sum(weight_column)
            .map_batches(
                lambda b: pa.table({
                    "src": b["src"], "dst": b["dst"],
                    "w": pc.cast(b[f"sum({weight_column})"], pa.float64()),
                }),
                batch_format="pyarrow",
            )
        )
    else:
        e = (edges.select_columns(["src", "dst"])
             .groupby(["src", "dst"]).count().drop_columns(["count()"]))
    e = e.repartition(num_partitions).materialize()

    if e.count() <= local_threshold:
        return _pagerank_local(e, iterations, damping, weighted=weighted,
                               id_type=_col_id_type(e, "src", edges))

    # repartition+materialize before every join input: Ray's hash join
    # chokes on the schema-less empty blocks that groupby/join stages
    # can emit (same hygiene as k_hop_pairs)
    if weighted:
        deg = (
            e.groupby("src").sum("w")
            .rename_columns({"sum(w)": "outdeg", "src": "dsrc"})
            .repartition(max(2, num_partitions // 2)).materialize()
        )
    else:
        deg = (
            e.groupby("src").count().rename_columns({"count()": "outdeg", "src": "dsrc"})
            .repartition(max(2, num_partitions // 2)).materialize()
        )
    # edges ⨝ out-degree once, OUTSIDE the loop (loop-invariant):
    # (src, dst, outdeg) — each iteration then needs a single join
    e_deg = e.join(
        deg, join_type="inner",
        num_partitions=num_partitions, on=("src",), right_on=("dsrc",),
    ).repartition(num_partitions).materialize()
    # nodes = src ∪ dst, distinct
    verts = (
        e.map_batches(
            lambda b: pa.table(
                {"node": pa.concat_arrays([
                    b["src"].combine_chunks(), b["dst"].combine_chunks()
                ])}
            ),
            batch_format="pyarrow",
        )
        .groupby("node").count().drop_columns(["count()"])
        .repartition(max(2, num_partitions // 2)).materialize()
    )
    n = verts.count()
    base = (1.0 - damping) / n

    # ranks ⨝ outdeg once up front: contribution factor rank/outdeg is
    # recomputed per iteration from the joined table
    ranks = verts.map_batches(
        lambda b: b.append_column(
            "rank", pa.array([1.0 / n] * b.num_rows, type=pa.float64())
        ),
        batch_format="pyarrow",
    ).repartition(max(2, num_partitions // 2)).materialize()

    for _ in range(iterations):
        flowing = ranks.join(
            e_deg, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("src",),
        )

        def contrib(batch: pa.Table) -> pa.Table:
            # float order matches the local path and the SQL oracle:
            # (rank * w) / W — not (rank / W) * w
            num = (pc.multiply(batch["rank"], batch["w"]) if weighted
                   else batch["rank"])
            c = pc.divide(num, pc.cast(batch["outdeg"], pa.float64()))
            return pa.table({"dst": batch["dst"], "c": c})

        inflow = (
            flowing.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst").sum("c")
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        # left-join back onto the full vertex set: sinks receive base only
        ranks = verts.join(
            inflow, join_type="left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("dst",),
        ).map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "rank": pc.add(
                    pa.scalar(base),
                    pc.multiply(
                        pa.scalar(damping),
                        pc.coalesce(b["sum(c)"], pa.scalar(0.0)),
                    ),
                ),
            }),
            batch_format="pyarrow",
        ).repartition(max(2, num_partitions // 2)).materialize()

    return ranks.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "rank": pc.round(b["rank"], 6, round_mode="half_towards_infinity"),
        }),
        batch_format="pyarrow",
    )


def undirected_edges(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Undirect + dedup a directed edge table into (u, v) with u < v —
    self-loops dropped; ONE groupby; repartitioned + MATERIALIZED for
    the hash-join empty-block hygiene described at ``k_hop_pairs``."""
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    def undirect(batch: pa.Table) -> pa.Table:
        src = batch["src"]
        dst = batch["dst"]
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        return pa.table({
            "u": pc.min_element_wise(src, dst),
            "v": pc.max_element_wise(src, dst),
        })

    return (
        edges.select_columns(["src", "dst"])
        .map_batches(undirect, batch_format="pyarrow")
        .groupby(["u", "v"]).count().drop_columns(["count()"])
        .repartition(num_partitions).materialize()
    )


def _col_id_type(ds: rd.Dataset, column: str,
                 fallback: rd.Dataset | None = None,
                 fallback_column: str = "src") -> "pa.DataType":
    """Node-id Arrow type for typed-empty results and local fast paths:
    a derived table that came out EMPTY (self-loop-only / empty graph)
    reports ``schema() is None``, so fall back to the original edge
    table's id column, then to string."""
    from ..functions.arrowtypes import arrow_types

    s = ds.schema()
    if s is not None and column in s.names:
        return arrow_types(ds)[column]
    if fallback is not None:
        fs = fallback.schema()
        if fs is not None and fallback_column in fs.names:
            return arrow_types(fallback)[fallback_column]
    return pa.string()


def _node_id_type(ud: rd.Dataset, edges: rd.Dataset) -> "pa.DataType":
    return _col_id_type(ud, "u", edges, "src")


def triangles(edges: rd.Dataset, num_partitions: int | None = None,
              _ud: rd.Dataset | None = None) -> rd.Dataset:
    """Enumerate undirected triangles as (a, b, c) with a < b < c.

    Compact-forward shape: edges are first undirected + deduped into
    (u, v) with u < v (one groupby), then ONE self-join on the anchor u
    builds wedges (u; v1 < v2) and ONE two-key join against the edge
    set closes them — each triangle {x < y < z} is produced exactly
    once, by the wedge anchored at its smallest vertex. Per-iteration
    cost is the classic wedge count Σ deg(v)²; anchoring at the ordered
    smaller endpoint halves it vs naive direction-blind wedging.

    The joined sides are repartitioned + materialized first (the
    hash-join empty-block hygiene described at ``k_hop_pairs``).
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    ud = _ud if _ud is not None else undirected_edges(edges, num_partitions)
    id_type = _node_id_type(ud, edges)

    def _empty_abc() -> rd.Dataset:
        return rd.from_arrow(pa.table({
            "a": pa.array([], type=id_type),
            "b": pa.array([], type=id_type),
            "c": pa.array([], type=id_type),
        }))

    if ud.count() == 0:
        return _empty_abc()
    w1 = ud.rename_columns({"u": "a", "v": "b"})
    w2 = ud.rename_columns({"u": "a", "v": "c"})
    wedges = (
        w1.join(w2, join_type="inner", num_partitions=num_partitions, on=("a",))
        .map_batches(
            lambda t: t.filter(pc.less(t["b"], t["c"])), batch_format="pyarrow"
        )
        .repartition(num_partitions).materialize()
    )
    if wedges.count() == 0:
        # a triangle-free graph leaves only schema-LESS empty blocks,
        # which poison the closing hash join (FieldRef b unresolvable) —
        # short-circuit with a typed empty result
        return _empty_abc()
    closed = wedges.join(
        ud, join_type="inner", num_partitions=num_partitions,
        on=("b", "c"), right_on=("u", "v"),
    )
    return closed.select_columns(["a", "b", "c"])


def clustering_coefficient(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Per-node local clustering coefficient over the undirected KG:
    ``c_v = 2·T_v / (d_v·(d_v−1))`` where T_v = triangles through v and
    d_v = undirected degree (0 when d_v < 2).

    Reuses ONE undirected-edge materialization for both the triangle
    enumeration (``triangles``) and the degree count; per-node triangle
    counts are a flat endpoint emission + one groupby; the final
    degree⟕triangle combine is a hash join between two node-keyed
    tables that are already tiny relative to the edge set.

    Returns (node_id, degree, n_tri, coefficient) — coefficient rounded
    to 6 decimals (half-away-from-zero, matching the SQL oracles).
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    ud = undirected_edges(edges, num_partitions)
    if ud.count() == 0:
        # self-loop-only / empty graph: no undirected edges, no nodes
        # with degree >= 1 — typed empty result (ud has no schema here)
        id_type = _node_id_type(ud, edges)
        return rd.from_arrow(pa.table({
            "node_id": pa.array([], type=id_type),
            "degree": pa.array([], type=pa.int64()),
            "n_tri": pa.array([], type=pa.int64()),
            "coefficient": pa.array([], type=pa.float64()),
        }))
    tri = triangles(edges, num_partitions, _ud=ud)

    def tri_endpoints(batch: pa.Table) -> pa.Table:
        cols = [batch[c].combine_chunks() if isinstance(batch[c], pa.ChunkedArray)
                else batch[c] for c in ("a", "b", "c")]
        return pa.table({"node_id": pa.concat_arrays(cols)})

    tri_counts = (
        tri.map_batches(tri_endpoints, batch_format="pyarrow")
        .groupby("node_id").count()
        .rename_columns({"count()": "n_tri"})
        .repartition(num_partitions).materialize()
    )
    has_triangles = tri_counts.count() > 0

    def ud_endpoints(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks() if isinstance(batch["u"], pa.ChunkedArray) else batch["u"]
        v = batch["v"].combine_chunks() if isinstance(batch["v"], pa.ChunkedArray) else batch["v"]
        return pa.table({"node_id": pa.concat_arrays([u, v])})

    degrees = (
        ud.map_batches(ud_endpoints, batch_format="pyarrow")
        .groupby("node_id").count()
        .rename_columns({"count()": "degree"})
        .repartition(num_partitions).materialize()
    )

    if has_triangles:
        joined = degrees.join(
            tri_counts, join_type="left_outer", num_partitions=num_partitions,
            on=("node_id",),
        )
    else:
        # triangle-free: skip the join entirely (an all-empty right side
        # carries schema-less blocks that break the hash join) — every
        # node gets n_tri = 0 via the coalesce in finish()
        joined = degrees.map_batches(
            lambda b: b.append_column("n_tri", pa.nulls(b.num_rows, type=pa.int64())),
            batch_format="pyarrow",
        )

    def finish(batch: pa.Table) -> pa.Table:
        deg = pc.cast(batch["degree"], pa.float64())
        ntri = pc.cast(pc.coalesce(batch["n_tri"], pa.scalar(0)), pa.float64())
        denom = pc.multiply(deg, pc.subtract(deg, pa.scalar(1.0)))
        coef = pc.if_else(
            pc.greater(denom, pa.scalar(0.0)),
            pc.divide(pc.multiply(ntri, pa.scalar(2.0)), denom),
            pa.scalar(0.0),
        )
        return pa.table({
            "node_id": batch["node_id"],
            "degree": pc.cast(batch["degree"], pa.int64()),
            "n_tri": pc.cast(pc.coalesce(batch["n_tri"], pa.scalar(0)), pa.int64()),
            "coefficient": pc.round(coef, 6, round_mode="half_towards_infinity"),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def _hits_local(e: rd.Dataset, iterations: int,
                id_type: "pa.DataType") -> rd.Dataset:
    """Small-graph fast path: HITS power iteration on the collected
    deduped edge list with numpy scatter-adds (same synchronous update
    as the distributed path, identical after the 6-decimal round)."""
    import numpy as np
    import pyarrow.compute as pc

    rows = e.take_all()
    src = [r["src"] for r in rows]
    dst = [r["dst"] for r in rows]
    nodes = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(nodes)}
    si = np.array([idx[s] for s in src], dtype=np.int64)
    di = np.array([idx[d] for d in dst], dtype=np.int64)
    n = len(nodes)
    hub = np.ones(n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(iterations):
        auth = np.bincount(di, weights=hub[si], minlength=n)
        z = np.sqrt((auth * auth).sum())
        auth = auth / (z if z > 0.0 else 1.0)
        hub = np.bincount(si, weights=auth[di], minlength=n)
        z = np.sqrt((hub * hub).sum())
        hub = hub / (z if z > 0.0 else 1.0)
    out = pa.table({
        "node": pa.array(nodes, type=id_type),
        "authority": pa.array(auth, type=pa.float64()),
        "hub": pa.array(hub, type=pa.float64()),
    })
    for name in ("authority", "hub"):
        out = out.set_column(
            out.column_names.index(name), name,
            pc.round(out[name], 6, round_mode="half_towards_infinity"))
    return rd.from_arrow(out)


def hits(
    edges: rd.Dataset,
    iterations: int = 5,
    num_partitions: int | None = None,
    local_threshold: int = 100_000,
) -> rd.Dataset:
    """HITS hubs-and-authorities over the directed (src, dst) edge
    table — ``iterations`` synchronous steps of a = Aᵀh, h = Aa with an
    L2 normalization after every half-step (hub init 1.0).

    Distributed shape per half-step: ONE hash join (scores flow along
    edges) + ONE groupby sum, a scalar sum-of-squares reduction for the
    norm (one double to the driver), and a left-join back onto the full
    vertex set so sinks/sources carry explicit zeros. Score tables are
    (node, value) — never broadcast — so the same plan runs when nodes
    outnumber driver memory. Small deduped edge lists (the canonical KG
    graph, not the corpus) drop to an identical-math numpy loop.

    Returns (node, authority, hub) rounded to 6 decimals — reproduced
    exactly by the chained-CTE DuckDB oracle (one CTE per half-step).
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    if iterations < 1:
        raise ValueError("hits needs iterations >= 1")

    e = edges.select_columns(["src", "dst"]).groupby(["src", "dst"]).count()
    e = e.drop_columns(["count()"]).repartition(num_partitions).materialize()

    id_type = _col_id_type(e, "src", edges)

    if e.count() == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=id_type),
            "authority": pa.array([], type=pa.float64()),
            "hub": pa.array([], type=pa.float64()),
        }))
    if e.count() <= local_threshold:
        return _hits_local(e, iterations, id_type)

    verts = (
        e.map_batches(
            lambda b: pa.table(
                {"node": pa.concat_arrays([
                    b["src"].combine_chunks(), b["dst"].combine_chunks()
                ])}
            ),
            batch_format="pyarrow",
        )
        .groupby("node").count().drop_columns(["count()"])
        .repartition(max(2, num_partitions // 2)).materialize()
    )

    def _dense(sparse: rd.Dataset, key: str, val: str) -> rd.Dataset:
        """verts LEFT JOIN the sparse (key, val) scores → (node, s)."""
        return verts.join(
            sparse, join_type="left_outer", num_partitions=num_partitions,
            on=("node",), right_on=(key,),
        ).map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "s": pc.coalesce(b[val], pa.scalar(0.0)),
            }),
            batch_format="pyarrow",
        ).repartition(max(2, num_partitions // 2)).materialize()

    def _normalize(dense: rd.Dataset) -> rd.Dataset:
        z = dense.map_batches(
            lambda b: pa.table({"sq": pc.multiply(b["s"], b["s"])}),
            batch_format="pyarrow",
        ).sum("sq")
        z = math.sqrt(z) if z and z > 0.0 else 1.0
        return dense.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "s": pc.divide(b["s"], pa.scalar(z)),
            }),
            batch_format="pyarrow",
        ).repartition(max(2, num_partitions // 2)).materialize()

    hubs = verts.map_batches(
        lambda b: b.append_column(
            "s", pa.array([1.0] * b.num_rows, type=pa.float64())),
        batch_format="pyarrow",
    ).repartition(max(2, num_partitions // 2)).materialize()
    auth = None

    for _ in range(iterations):
        a_in = (
            hubs.join(
                e, join_type="inner", num_partitions=num_partitions,
                on=("node",), right_on=("src",),
            )
            .map_batches(
                lambda b: pa.table({"dst": b["dst"], "v": b["s"]}),
                batch_format="pyarrow")
            .groupby("dst").sum("v")
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        auth = _normalize(_dense(a_in, "dst", "sum(v)"))
        h_in = (
            auth.join(
                e, join_type="inner", num_partitions=num_partitions,
                on=("node",), right_on=("dst",),
            )
            .map_batches(
                lambda b: pa.table({"src": b["src"], "v": b["s"]}),
                batch_format="pyarrow")
            .groupby("src").sum("v")
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        hubs = _normalize(_dense(h_in, "src", "sum(v)"))

    joined = auth.rename_columns({"s": "authority"}).join(
        hubs.rename_columns({"node": "hnode", "s": "hub"}),
        join_type="inner", num_partitions=num_partitions,
        on=("node",), right_on=("hnode",),
    )
    return joined.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "authority": pc.round(b["authority"], 6,
                                  round_mode="half_towards_infinity"),
            "hub": pc.round(b["hub"], 6, round_mode="half_towards_infinity"),
        }),
        batch_format="pyarrow",
    )


def adamic_adar(edges: rd.Dataset, num_partitions: int | None = None,
                _ud: rd.Dataset | None = None) -> rd.Dataset:
    """Link prediction over the undirected KG: for every NON-adjacent
    node pair (a < b) sharing at least one neighbor, the common-neighbor
    count and the Adamic–Adar score Σ_n 1/ln(deg(n)) over the shared
    neighbors n — the classic "which edge is missing?" signal a curation
    pass runs over a freshly canonicalized graph.

    Shape: reuses the ``triangles`` wedge machinery — undirect+dedup
    (ONE groupby), attach each center's weight 1/ln(deg) to its
    adjacency rows via ONE node-keyed hash join (degree < 2 centers are
    dropped first: they cannot anchor a wedge), ONE self-join on the
    center builds scored wedges, ONE (a, b) groupby sums count+weight,
    and a left-anti join against the edge set removes already-connected
    pairs. Wedge cost is the usual Σ deg(n)² — hot hubs dominate; at
    corpus scale cap or sample per-center adjacency before the wedge
    join (the KG node table after canonicalization is small relative to
    the corpus, so the default is exact).

    Returns (a, b, common_neighbors, aa_score) with aa_score rounded to
    6 decimals (half-away-from-zero, matching the SQL oracle).
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    ud = _ud if _ud is not None else undirected_edges(edges, num_partitions)
    id_type = _node_id_type(ud, edges)

    def _empty() -> rd.Dataset:
        return rd.from_arrow(pa.table({
            "a": pa.array([], type=id_type),
            "b": pa.array([], type=id_type),
            "common_neighbors": pa.array([], type=pa.int64()),
            "aa_score": pa.array([], type=pa.float64()),
        }))

    if ud.count() == 0:
        return _empty()

    def _endpoints(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks() if isinstance(batch["u"], pa.ChunkedArray) else batch["u"]
        v = batch["v"].combine_chunks() if isinstance(batch["v"], pa.ChunkedArray) else batch["v"]
        return pa.table({"node_id": pa.concat_arrays([u, v])})

    # AA weight per wedge-capable center: w(n) = 1 / ln(deg(n)), deg >= 2
    weights = (
        ud.map_batches(_endpoints, batch_format="pyarrow")
        .groupby("node_id").count()
        .map_batches(
            lambda b: (lambda t: pa.table({
                "n": t["node_id"],
                "w": pc.divide(
                    pa.scalar(1.0),
                    pc.ln(pc.cast(t["count()"], pa.float64()))),
            }))(b.filter(pc.greater(b["count()"], pa.scalar(1)))),
            batch_format="pyarrow",
        )
        .repartition(max(2, num_partitions // 2)).materialize()
    )
    if weights.count() == 0:  # no center has degree >= 2 → no wedges
        # (guarded BEFORE the join: an all-empty side carries schema-less
        # blocks that poison the hash join, see ``k_hop_pairs``)
        return _empty()

    def _adjacency(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks() if isinstance(batch["u"], pa.ChunkedArray) else batch["u"]
        v = batch["v"].combine_chunks() if isinstance(batch["v"], pa.ChunkedArray) else batch["v"]
        return pa.table({
            "n": pa.concat_arrays([u, v]),
            "x": pa.concat_arrays([v, u]),
        })

    adjw = (
        ud.map_batches(_adjacency, batch_format="pyarrow")
        .join(weights, join_type="inner", num_partitions=num_partitions,
              on=("n",))
        .repartition(num_partitions).materialize()
    )

    left = adjw.rename_columns({"x": "a"})
    right = adjw.select_columns(["n", "x"]).rename_columns({"x": "b"})
    wedges = (
        left.join(right, join_type="inner", num_partitions=num_partitions,
                  on=("n",))
        .map_batches(
            lambda t: pa.table({
                "a": t["a"], "b": t["b"], "w": t["w"],
                "c": pa.array([1] * t.num_rows, type=pa.int64()),
            }).filter(pc.less(t["a"], t["b"])),
            batch_format="pyarrow",
        )
        .repartition(num_partitions).materialize()
    )
    if wedges.count() == 0:
        return _empty()

    scored = (
        wedges.groupby(["a", "b"]).sum(["c", "w"])
        .repartition(max(2, num_partitions // 2)).materialize()
    )

    # left-anti against the edge set: keep only non-adjacent pairs
    ud_marked = ud.map_batches(
        lambda b: b.append_column(
            "adj_flag", pa.array([1] * b.num_rows, type=pa.int8())),
        batch_format="pyarrow",
    ).repartition(max(2, num_partitions // 2)).materialize()

    joined = scored.join(
        ud_marked, join_type="left_outer", num_partitions=num_partitions,
        on=("a", "b"), right_on=("u", "v"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.is_null(batch["adj_flag"])
        t = batch.filter(keep)
        return pa.table({
            "a": t["a"],
            "b": t["b"],
            "common_neighbors": pc.cast(t["sum(c)"], pa.int64()),
            "aa_score": pc.round(pc.cast(t["sum(w)"], pa.float64()), 6,
                                 round_mode="half_towards_infinity"),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def reciprocity(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """One-row edge-reciprocity summary of the directed KG:
    (n_edges, n_reciprocal, reciprocity) over DISTINCT non-loop directed
    edges — n_reciprocal counts edges whose reverse also exists.

    No self-join: each distinct directed edge maps to its undirected
    pair, ONE (u, v) groupby counts directions present (1 or 2), and
    per-batch partial sums collapse to a single row — two shuffles of
    (pair, count) rows, one scalar-sized reduce.
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    def undirect(batch: pa.Table) -> pa.Table:
        src, dst = batch["src"], batch["dst"]
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        return pa.table({
            "u": pc.min_element_wise(src, dst),
            "v": pc.max_element_wise(src, dst),
        })

    pair_counts = (
        edges.select_columns(["src", "dst"])
        .groupby(["src", "dst"]).count().drop_columns(["count()"])
        .map_batches(undirect, batch_format="pyarrow")
        .groupby(["u", "v"]).count()
    )

    def partial(batch: pa.Table) -> pa.Table:
        cnt = pc.cast(batch["count()"], pa.int64())
        total = pc.sum(cnt).as_py() or 0
        recip = pc.sum(
            pc.if_else(pc.equal(cnt, pa.scalar(2, pa.int64())),
                       pa.scalar(2, pa.int64()),
                       pa.scalar(0, pa.int64()))).as_py() or 0
        return pa.table({
            "__k": pa.array([0], type=pa.int64()),
            "n_edges": pa.array([total], type=pa.int64()),
            "n_reciprocal": pa.array([recip], type=pa.int64()),
        })

    def finish(batch: pa.Table) -> pa.Table:
        ne = pc.cast(batch["sum(n_edges)"], pa.int64())
        nr = pc.cast(batch["sum(n_reciprocal)"], pa.int64())
        ratio = pc.if_else(
            pc.greater(ne, pa.scalar(0, pa.int64())),
            pc.divide(pc.cast(nr, pa.float64()), pc.cast(ne, pa.float64())),
            pa.scalar(0.0),
        )
        return pa.table({
            "n_edges": ne,
            "n_reciprocal": nr,
            "reciprocity": pc.round(ratio, 6,
                                    round_mode="half_towards_infinity"),
        })

    return (
        pair_counts.map_batches(partial, batch_format="pyarrow")
        .groupby("__k").sum(["n_edges", "n_reciprocal"])
        .map_batches(finish, batch_format="pyarrow")
    )


def k_core(
    edges: rd.Dataset,
    k: int = 2,
    num_partitions: int | None = None,
    max_iters: int = 50,
) -> rd.Dataset:
    """The k-core of the undirected KG: iteratively peel every node
    whose remaining degree is < k until none is left, then report each
    surviving node with its in-core degree — the standard "dense
    backbone" cut run before expensive per-node analytics.

    Each peel round is ONE degree groupby + TWO semi-joins (keep the
    edges whose BOTH endpoints survive); convergence is the edge count
    (monotone decreasing, so an unchanged count IS the fixed point —
    only a scalar reaches the driver per round). Rounds ≤ #peeled nodes;
    ``max_iters`` bounds pathological chains with a warning.

    Returns (node_id, core_degree) — empty when the k-core is empty.
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import logging

    ud = undirected_edges(edges, num_partitions)
    id_type = _node_id_type(ud, edges)

    def _empty() -> rd.Dataset:
        return rd.from_arrow(pa.table({
            "node_id": pa.array([], type=id_type),
            "core_degree": pa.array([], type=pa.int64()),
        }))

    def _endpoints(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks() if isinstance(batch["u"], pa.ChunkedArray) else batch["u"]
        v = batch["v"].combine_chunks() if isinstance(batch["v"], pa.ChunkedArray) else batch["v"]
        return pa.table({"node_id": pa.concat_arrays([u, v])})

    def _degrees(ed: rd.Dataset) -> rd.Dataset:
        return (
            ed.map_batches(_endpoints, batch_format="pyarrow")
            .groupby("node_id").count()
            .rename_columns({"count()": "core_degree"})
        )

    n_edges = ud.count()
    if n_edges == 0:
        return _empty()

    import pyarrow.compute as pc

    for _ in range(max_iters):
        keep = (
            _degrees(ud)
            .map_batches(
                lambda b: b.filter(
                    pc.greater_equal(b["core_degree"],
                                     pa.scalar(k, pa.int64()))
                ).select(["node_id"]),
                batch_format="pyarrow",
            )
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        if keep.count() == 0:
            return _empty()
        # repartition+materialize BETWEEN the chained joins: the first
        # join's empty partition blocks are schema-less and poison the
        # second join's FieldRef resolution (see ``k_hop_pairs``)
        half = (
            ud.join(keep.rename_columns({"node_id": "u"}),
                    join_type="inner", num_partitions=num_partitions,
                    on=("u",))
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        if half.count() == 0:
            return _empty()
        ud = (
            half.join(keep.rename_columns({"node_id": "v"}),
                      join_type="inner", num_partitions=num_partitions,
                      on=("v",))
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        remaining = ud.count()
        if remaining == n_edges:
            break
        if remaining == 0:
            return _empty()
        n_edges = remaining
    else:
        logging.getLogger(__name__).warning(
            "k_core hit max_iters=%d before the fixed point", max_iters)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node_id": batch["node_id"],
            "core_degree": pc.cast(batch["core_degree"], pa.int64()),
        })

    return _degrees(ud).map_batches(finish, batch_format="pyarrow")


def bfs_depths(
    edges: rd.Dataset,
    source: str | None = None,
    num_partitions: int | None = None,
    max_iters: int = 50,
) -> rd.Dataset:
    """Undirected BFS from ``source`` (default: the minimum node id —
    deterministic without a parameter): (node_id, depth) for every
    REACHABLE node, depth 0 at the source.

    Iterative frontier expansion: each round joins the frontier against
    the adjacency (ONE hash join), anti-joins the visited set (ONE
    left-outer + null filter), and stops when the frontier empties —
    O(graph diameter) rounds, only per-round counts reach the driver.
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    ud = undirected_edges(edges, num_partitions)
    id_type = _node_id_type(ud, edges)

    if ud.count() == 0:
        return rd.from_arrow(pa.table({
            "node_id": pa.array([], type=id_type),
            "depth": pa.array([], type=pa.int64()),
        }))

    import pyarrow.compute as pc

    adj = ud.map_batches(
        lambda b: pa.table({
            "n": pa.concat_arrays([b["u"].combine_chunks(),
                                   b["v"].combine_chunks()]),
            "x": pa.concat_arrays([b["v"].combine_chunks(),
                                   b["u"].combine_chunks()]),
        }),
        batch_format="pyarrow",
    ).repartition(num_partitions).materialize()

    if source is None:
        source = ud.min("u")  # min over u == global min: u < v on every row

    visited = rd.from_arrow(pa.table({
        "node_id": pa.array([source], type=id_type),
        "depth": pa.array([0], type=pa.int64()),
    })).materialize()
    frontier = visited.select_columns(["node_id"]).materialize()

    for depth in range(1, max_iters + 1):
        nxt = (
            frontier.rename_columns({"node_id": "n"})
            .join(adj, join_type="inner", num_partitions=num_partitions,
                  on=("n",))
            .select_columns(["x"]).rename_columns({"x": "node_id"})
            .groupby("node_id").count().drop_columns(["count()"])
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        if nxt.count() == 0:
            break
        fresh = (
            nxt.join(
                visited.map_batches(
                    lambda b: b.select(["node_id"]).append_column(
                        "seen", pa.array([1] * b.num_rows, type=pa.int8())),
                    batch_format="pyarrow",
                ),
                join_type="left_outer", num_partitions=num_partitions,
                on=("node_id",),
            )
            .map_batches(
                lambda b, d=depth: (lambda t: pa.table({
                    "node_id": t["node_id"],
                    "depth": pa.array([d] * t.num_rows, type=pa.int64()),
                }))(b.filter(pc.is_null(b["seen"]))),
                batch_format="pyarrow",
            )
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        if fresh.count() == 0:
            break
        visited = visited.union(fresh).repartition(
            max(2, num_partitions // 2)).materialize()
        frontier = fresh.select_columns(["node_id"]).materialize()
    else:
        # loop exhausted with a live frontier: deeper nodes exist but
        # would be silently reported unreachable — never silently
        import logging

        logging.getLogger(__name__).warning(
            "bfs_depths stopped at max_iters=%d with a live frontier; "
            "nodes deeper than that (if any) are omitted", max_iters)

    return visited


def graph_summary(edges: rd.Dataset) -> rd.Dataset:
    """One-row shape card for the edge table: (n_edges, n_nodes,
    avg_out_degree, max_degree, density) — n_edges at the stored
    (src, pred, dst) grain, degrees from ``node_degrees``, density =
    n_edges / (n·(n−1)) over directed pairs.

    One pass over the (already tiny) degree table: per-batch partials
    (node count, Σout, max degree) → a single-key groupby → scalar
    algebra. Nothing edge-sized reaches the driver.
    """
    import pyarrow.compute as pc

    degrees = node_degrees(edges)

    def partial(batch: pa.Table) -> pa.Table:
        out = pc.cast(batch["out_degree"], pa.int64())
        deg = pc.cast(batch["degree"], pa.int64())
        return pa.table({
            "__k": pa.array([0], type=pa.int64()),
            "n_nodes": pa.array([batch.num_rows], type=pa.int64()),
            "n_edges": pa.array([pc.sum(out).as_py() or 0], type=pa.int64()),
            "max_degree": pa.array([pc.max(deg).as_py() or 0],
                                   type=pa.int64()),
        })

    def finish(batch: pa.Table) -> pa.Table:
        n_nodes = pc.cast(batch["sum(n_nodes)"], pa.int64())
        n_edges = pc.cast(batch["sum(n_edges)"], pa.int64())
        max_deg = pc.cast(batch["max(max_degree)"], pa.int64())
        nn = pc.cast(n_nodes, pa.float64())
        ne = pc.cast(n_edges, pa.float64())
        avg = pc.if_else(pc.greater(nn, pa.scalar(0.0)),
                         pc.divide(ne, nn), pa.scalar(0.0))
        denom = pc.multiply(nn, pc.subtract(nn, pa.scalar(1.0)))
        dens = pc.if_else(pc.greater(denom, pa.scalar(0.0)),
                          pc.divide(ne, denom), pa.scalar(0.0))
        return pa.table({
            "n_edges": n_edges,
            "n_nodes": n_nodes,
            "avg_out_degree": pc.round(avg, 6,
                                   round_mode="half_towards_infinity"),
            "max_degree": max_deg,
            "density": pc.round(dens, 6,
                                round_mode="half_towards_infinity"),
        })

    return (
        degrees.map_batches(partial, batch_format="pyarrow")
        .groupby("__k").aggregate(
            *_summary_aggs())
        .map_batches(finish, batch_format="pyarrow")
    )


def _summary_aggs():
    from ray.data.aggregate import Max, Sum

    return (Sum("n_nodes"), Sum("n_edges"), Max("max_degree"))


def degree_histogram(edges: rd.Dataset) -> rd.Dataset:
    """(degree, n_nodes): how many nodes have each total degree — the
    skew diagnostic read before choosing salting/bucketing parameters.
    ONE extra groupby over the node-degree table."""
    import pyarrow.compute as pc

    return (
        node_degrees(edges)
        .groupby("degree").count()
        .map_batches(
            lambda b: pa.table({
                "degree": pc.cast(b["degree"], pa.int64()),
                "n_nodes": pc.cast(b["count()"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


def jaccard_neighbors(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Link prediction by neighborhood overlap: for every NON-adjacent
    undirected pair (a < b) with at least one common neighbor, the
    Jaccard similarity of their neighbor sets —
    |N(a)∩N(b)| / (deg(a) + deg(b) − |N(a)∩N(b)|). The set-overlap
    counterpart of ``adamic_adar`` (which weights shared neighbors by
    rarity); running both ranks candidate edges by two independent
    signals.

    Shape: the wedge machinery IS ``adamic_adar`` (undirect+dedup, one
    self-join on the center, one (a,b) groupby, one anti-join against
    the edge set); the Jaccard denominator then needs each endpoint's
    distinct-neighbor degree, attached with two hash joins of the tiny
    pair table against the (node, degree) table — no extra wedge pass.

    Returns (a, b, common_neighbors, jaccard) rounded to 6 decimals
    (half-away-from-zero, matching the SQL oracle).
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    # ONE undirect+dedup shuffle shared with the wedge pass (the
    # triangles _ud passthrough convention) — without it the whole
    # edge-table groupby runs twice
    ud = undirected_edges(edges, num_partitions).materialize()
    # repartition rebuilds clean uniform blocks: the anti-join inside
    # adamic_adar emits schema-less empty partition blocks that poison
    # the degree joins below (see ``k_hop_pairs``)
    pairs = (
        adamic_adar(edges, num_partitions, _ud=ud)
        .drop_columns(["aa_score"])
        .repartition(max(2, num_partitions // 2)).materialize()
    )
    id_type = _node_id_type(ud, edges)

    if pairs.count() == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], type=id_type),
            "b": pa.array([], type=id_type),
            "common_neighbors": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }))

    def _endpoints(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks() if isinstance(batch["u"], pa.ChunkedArray) else batch["u"]
        v = batch["v"].combine_chunks() if isinstance(batch["v"], pa.ChunkedArray) else batch["v"]
        return pa.table({"node_id": pa.concat_arrays([u, v])})

    degrees = (
        ud.map_batches(_endpoints, batch_format="pyarrow")
        .groupby("node_id").count()
        .rename_columns({"count()": "degree"})
        .repartition(max(2, num_partitions // 2)).materialize()
    )

    deg_a = degrees.rename_columns({"node_id": "a", "degree": "deg_a"})
    deg_b = degrees.rename_columns({"node_id": "b", "degree": "deg_b"})
    joined = (
        pairs.join(deg_a, join_type="inner", num_partitions=num_partitions,
                   on=("a",))
        .repartition(max(2, num_partitions // 2)).materialize()
        .join(deg_b, join_type="inner", num_partitions=num_partitions,
              on=("b",))
    )

    def finish(batch: pa.Table) -> pa.Table:
        common = pc.cast(batch["common_neighbors"], pa.float64())
        denom = pc.subtract(
            pc.add(pc.cast(batch["deg_a"], pa.float64()),
                   pc.cast(batch["deg_b"], pa.float64())),
            common)
        return pa.table({
            "a": batch["a"],
            "b": batch["b"],
            "common_neighbors": batch["common_neighbors"],
            "jaccard": pc.round(pc.divide(common, denom), 6,
                                round_mode="half_towards_infinity"),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def random_walks(
    edges: rd.Dataset,
    length: int = 4,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Deterministic pseudo-random walks over the undirected KG — one
    walk per node, ``length`` steps: from node c, a walk moves to the
    neighbor x minimizing the stable hash md5(walk_id|step|x). The walk
    corpus node2vec/DeepWalk-style graph embeddings train on, with the
    sampling made deterministic (reproducible under retries and
    repartitioning) AND SQL-reproducible
    (``('0x'||substr(md5(k),1,16))::UBIGINT & (2^63-1)`` — the SimHash
    oracle trick, ``functions/hashing.py``, masked to 63 bits because
    Ray's groupby-min round-trips the join key through int64).
    Hash-argmin ≈ uniform choice; a
    temperature/bias variant would weight the hash by edge support.

    Returns (walk_id, step, node_id), step 0 at the start node; a walk
    ends early only at an isolated node (undirected adjacency has no
    dead ends otherwise).

    Shape: per step ONE frontier⨝adjacency hash join (candidates =
    #walks × avg-degree rows — node-table-sized, never corpus-sized),
    one (walk, min-hash) reduce, one join back to resolve the argmin,
    and a min(x) reduce for the astronomically-unlikely hash tie —
    identical tie semantics to the oracle's ORDER BY h, x. O(length)
    rounds, only per-round counts reach the driver.
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    from ..functions.hashing import stable_u64_md5

    ud = undirected_edges(edges, num_partitions)
    id_type = _node_id_type(ud, edges)

    def _empty() -> rd.Dataset:
        return rd.from_arrow(pa.table({
            "walk_id": pa.array([], type=id_type),
            "step": pa.array([], type=pa.int64()),
            "node_id": pa.array([], type=id_type),
        }))

    if ud.count() == 0:
        return _empty()

    adj = ud.map_batches(
        lambda b: pa.table({
            "n": pa.concat_arrays([b["u"].combine_chunks(),
                                   b["v"].combine_chunks()]),
            "x": pa.concat_arrays([b["v"].combine_chunks(),
                                   b["u"].combine_chunks()]),
        }),
        batch_format="pyarrow",
    ).repartition(num_partitions).materialize()

    cur = (
        adj.select_columns(["n"]).rename_columns({"n": "walk_id"})
        .groupby("walk_id").count().drop_columns(["count()"])
        .map_batches(
            lambda b: b.append_column("node_id", b["walk_id"]),
            batch_format="pyarrow")
        .repartition(max(2, num_partitions // 2)).materialize()
    )

    def stamp(ds: rd.Dataset, step: int) -> rd.Dataset:
        return ds.map_batches(
            lambda b, s=step: pa.table({
                "walk_id": b["walk_id"],
                "step": pa.array([s] * b.num_rows, type=pa.int64()),
                "node_id": b["node_id"],
            }),
            batch_format="pyarrow")

    out = stamp(cur, 0)
    for step in range(1, length + 1):
        def hash_cands(batch: pa.Table, s=step) -> pa.Table:
            w = batch["walk_id"].to_pylist()
            x = batch["x"].to_pylist()
            # 63-bit mask: Ray's groupby-min yields int64, and a join
            # key must not change type across the aggregate round-trip
            h = [stable_u64_md5(f"{a}|{s}|{b}") & ((1 << 63) - 1)
                 for a, b in zip(w, x)]
            return pa.table({
                "walk_id": batch["walk_id"],
                "x": batch["x"],
                "h": pa.array(h, type=pa.int64()),
            })

        cands = (
            cur.select_columns(["walk_id", "node_id"])
            .rename_columns({"node_id": "n"})
            .join(adj, join_type="inner", num_partitions=num_partitions,
                  on=("n",))
            .map_batches(hash_cands, batch_format="pyarrow")
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        if cands.count() == 0:
            break
        best = (
            cands.groupby("walk_id").min("h").rename_columns({"min(h)": "h"})
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        cur = (
            cands.join(best, join_type="inner",
                       num_partitions=num_partitions, on=("walk_id", "h"))
            .groupby("walk_id").min("x")
            .rename_columns({"min(x)": "node_id"})
            .repartition(max(2, num_partitions // 2)).materialize()
        )
        out = out.union(stamp(cur, step))
    return out


def edge_pmi(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Pointwise-mutual-information weighting of the co-occurrence
    edges: ``pmi = ln(support·T / (m_src·m_dst))`` with T the total
    support mass and m_x a node's incident support sum — the standard
    re-weighting that damps hub nodes so edge strength reflects
    ASSOCIATION, not popularity (Church & Hanks 1990).

    Returns (src, dst, support, pmi), pmi rounded to 6.

    Scale shape: marginals are ONE endpoint-explode + groupby(node)
    (rows = 2·edges of (node, support)); T is a per-batch scalar
    partial; the two marginal joins run against the node-count-sized
    marginal table with the repo's empty-block barrier between them.
    Arithmetic is float64 in SQL evaluation order (support·T first,
    then the marginal product divide) for oracle parity.
    """
    num_partitions = num_partitions or shuffle_partitions(8)
    import pyarrow.compute as pc

    edges = edges.select_columns(["src", "dst", "support"]).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        def arr(c):
            col = batch[c]
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        s = pc.cast(batch["support"], pa.int64())
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        return pa.table({
            "node_id": pa.concat_arrays([arr("src"), arr("dst")]),
            "w": pa.concat_arrays([s, s]),
        })

    marg = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node_id").sum("w")
        .rename_columns({"sum(w)": "m"})
        .repartition(max(2, num_partitions // 2)).materialize()
    )
    total = sum(
        r["t"] for r in edges.map_batches(
            lambda b: pa.table({"t": pa.array(
                [pc.sum(pc.cast(b["support"], pa.int64())).as_py() or 0],
                type=pa.int64())}),
            batch_format="pyarrow").take_all()
    )

    m_src = marg.rename_columns({"node_id": "src", "m": "m_src"})
    m_dst = marg.rename_columns({"node_id": "dst", "m": "m_dst"})
    joined = (
        edges.join(m_src, join_type="inner",
                   num_partitions=num_partitions, on=("src",))
        .repartition(max(2, num_partitions // 2)).materialize()
        .join(m_dst, join_type="inner",
              num_partitions=num_partitions, on=("dst",))
    )

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        sup = np.asarray(batch["support"].combine_chunks(),
                         dtype=np.float64)
        ms = np.asarray(batch["m_src"].combine_chunks(), dtype=np.float64)
        md = np.asarray(batch["m_dst"].combine_chunks(), dtype=np.float64)
        pmi = np.log((sup * float(total)) / (ms * md))
        return pa.table({
            "src": batch["src"],
            "dst": batch["dst"],
            "support": pc.cast(batch["support"], pa.int64()),
            "pmi": pc.round(pa.array(pmi, type=pa.float64()), 6,
                            round_mode="half_towards_infinity"),
        })

    return joined.map_batches(finish, batch_format="pyarrow").sort(
        ["src", "dst"])
