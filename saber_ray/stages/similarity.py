"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and an LSH-bucketed approximate variant (the scale path), plus
exact all-pairs near-duplicate detection by cosine.

Scale shape:
* the query matrix is small → normalized once on the driver and
  broadcast via ``ray.put``; each map task reads it from the object
  store (never re-shipped per batch);
* each batch computes a vectorized ``numpy`` matmul against the
  broadcast queries and emits only its LOCAL top-k candidate rows
  (k × num_queries per batch, not the whole batch);
* global top-k is a tiny ``groupby(query_id).map_groups`` over
  batches × k candidates — the shuffle moves candidates, not vectors.

The LSH variant buckets corpus vectors by random-hyperplane signs
(Charikar 2002); queries probe only their own bucket — at 100 TB this
turns a full scan into a 1/2^bits partition read when the bucket key is
a partitioning column of the stored index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _stack(column) -> np.ndarray:
    return np.array(column.to_pylist(), dtype=np.float64)


class BruteForceTopK:
    """Map stage: local top-k cosine candidates vs a broadcast query matrix."""

    def __init__(self, queries_ref, query_ids, k: int = 10,
                 id_column: str = "vec_id", vector_column: str = "embedding"):
        queries = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self._q = _normalize(queries)          # [nq, d], once per actor
        self._qids = np.asarray(query_ids)
        self._k = k
        self._id = id_column
        self._vec = vector_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self._id].to_pylist())
        mat = _normalize(_stack(batch[self._vec]))          # [n, d]
        sims = mat @ self._q.T                              # [n, nq]
        k = min(self._k, len(ids))
        out_q, out_n, out_s = [], [], []
        # per query: local top-k rows of this batch
        top = np.argpartition(-sims, k - 1, axis=0)[:k]     # [k, nq]
        for qi in range(sims.shape[1]):
            rows = top[:, qi]
            out_q.extend([self._qids[qi]] * len(rows))
            out_n.extend(ids[rows].tolist())
            out_s.extend(sims[rows, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )


def _merge_topk(k: int, exclude_self: bool):
    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        # deterministic: sort by (-cosine, neighbor_id)
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g[["query_id", "neighbor_id", "rank"]]

    return merge


def knn_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    exclude_self: bool = True,
    concurrency=None,
) -> rd.Dataset:
    """Exact cosine top-k: (query_id, neighbor_id, rank) per query."""
    queries_ref = ray.put(np.asarray(queries, dtype=np.float64))
    cands = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={
            "queries_ref": queries_ref, "query_ids": list(query_ids),
            "k": k + (1 if exclude_self else 0),
            "id_column": id_column, "vector_column": vector_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )
    return cands.groupby("query_id").map_groups(
        _merge_topk(k, exclude_self), batch_format="pandas"
    )


# ------------------------------------------------------------- LSH ------


def make_hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).astype(np.float64)


def lsh_bucket_batch(batch: pa.Table, planes: np.ndarray,
                     vector_column: str = "embedding") -> pa.Table:
    """Append ``bucket`` — sign-pattern int of the hyperplane projections.

    At scale this column becomes the partition key of the stored ANN
    index (write once, probe one partition per query).
    """
    mat = _stack(batch[vector_column])
    signs = (mat @ planes.T) > 0                       # [n, bits]
    buckets = signs @ (1 << np.arange(planes.shape[0]))
    return batch.append_column("bucket", pa.array(buckets.astype(np.int64)))


def knn_topk_lsh(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    bits: int = 6,
    seed: int = 42,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> rd.Dataset:
    """Approximate top-k: probe only the query's LSH bucket.

    Recall < 1 by construction; tests compare against ``knn_topk``.
    """
    import pyarrow.compute as pc

    queries = np.asarray(queries, dtype=np.float64)
    planes = make_hyperplanes(queries.shape[1], bits, seed)
    q_buckets = (((queries @ planes.T) > 0) @ (1 << np.arange(bits))).astype(np.int64)
    wanted = sorted(set(q_buckets.tolist()))
    wanted_arr = pa.array(wanted, type=pa.int64())
    bucketed = ds.map_batches(
        lambda b: lsh_bucket_batch(b, planes, vector_column), batch_format="pyarrow"
    ).map_batches(
        lambda b: b.filter(pc.is_in(b["bucket"], value_set=wanted_arr)),
        batch_format="pyarrow",
    )
    # per-bucket brute force against only the queries assigned there
    results = []
    for bucket in wanted:
        qsel = [i for i, qb in enumerate(q_buckets) if qb == bucket]
        sub = bucketed.map_batches(
            lambda b, bk=bucket: b.filter(pc.equal(b["bucket"], bk)),
            batch_format="pyarrow",
        )
        results.append(
            knn_topk(
                sub, queries[qsel], [list(query_ids)[i] for i in qsel], k=k,
                id_column=id_column, vector_column=vector_column,
            )
        )
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out


# ------------------------------------------------- embedding near-dup ---


def embedding_dup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.9,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> rd.Dataset:
    """Exact all-pairs cosine near-duplicates: (id_a, id_b) with
    cosine >= threshold and id_a < id_b.

    The corpus matrix is broadcast once (`ray.put`) and each batch
    matmuls against it — O(n²/B) work split across tasks with no
    shuffle. Fine when the matrix fits the object store (it does for
    embedding tables up to ~10^7 × 64 f32); beyond that, swap in the
    LSH-bucketed variant.
    """
    rows = ds.select_columns([id_column, vector_column]).take_all()
    ids = np.array([r[id_column] for r in rows])
    mat = _normalize(np.array([r[vector_column] for r in rows], dtype=np.float64))
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids)

    id_type = pa.array(ids[:1]).type if len(ids) else pa.int64()

    def pairs(batch: pa.Table) -> pa.Table:
        all_mat = ray.get(mat_ref)
        all_ids = ray.get(ids_ref)
        bids = np.asarray(batch[id_column].to_pylist())
        bmat = _normalize(_stack(batch[vector_column]))
        sims = bmat @ all_mat.T
        out_a, out_b = [], []
        for i in range(len(bids)):
            hits = np.where(sims[i] >= threshold)[0]
            for j in hits:
                if bids[i] < all_ids[j]:
                    out_a.append(bids[i])
                    out_b.append(all_ids[j])
        return pa.table({"id_a": pa.array(out_a, type=id_type),
                         "id_b": pa.array(out_b, type=id_type)})

    return ds.map_batches(pairs, batch_format="pyarrow")
