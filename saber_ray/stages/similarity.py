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

from ..functions.arrowtypes import arrow_types
from ..functions.partitioning import pinned_pool


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _stack(column) -> np.ndarray:
    vals = column.to_pylist()
    try:
        mat = np.array(vals, dtype=np.float64)
    except (TypeError, ValueError) as ex:
        # name the offending row: a null or wrong-dimension embedding
        # otherwise dies deep in numpy with an unactionable message
        for i, v in enumerate(vals):
            if v is None:
                raise ValueError(
                    f"embedding column contains a null at batch row {i}"
                ) from ex
        dims = {len(v) for v in vals}
        raise ValueError(
            f"embedding column is ragged: row dimensions {sorted(dims)}"
        ) from ex
    if mat.ndim == 1 and len(vals) == 0:  # empty block: shape (0,) → (0, 0)
        mat = mat.reshape(0, 0)
    elif mat.ndim != 2:
        dims = {len(v) if v is not None else None for v in vals}
        raise ValueError(
            f"embedding column is not a uniform 2-D matrix (row dims {sorted(map(str, dims))})"
        )
    return mat


class BruteForceTopK:
    """Map stage: local top-k cosine candidates vs a broadcast query
    matrix, optionally masking candidates that share the query's label
    (hard-negative mining).

    The local cut is TIE-SAFE: every row matching the per-query k-th
    score is emitted (not an arbitrary argpartition winner), so the
    global merge's (cosine DESC, neighbor_id) ranking sees every row
    the oracle's ``row_number()`` could select — duplicate embeddings
    at the boundary inflate a block's candidate set only by the tie
    multiplicity."""

    def __init__(self, queries_ref, query_ids, k: int = 10,
                 id_column: str = "vec_id", vector_column: str = "embedding",
                 query_labels=None, label_column: str = "label"):
        queries = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self._q = _normalize(queries)          # [nq, d], once per actor
        self._qids = np.asarray(query_ids)
        self._qid_type = (pa.array(self._qids.tolist()).type
                          if len(self._qids) else pa.int64())
        self._qlabels = (np.asarray(query_labels)
                         if query_labels is not None else None)
        self._label = label_column
        self._k = k
        self._id = id_column
        self._vec = vector_column

    def _typed_empty(self, batch: pa.Table) -> pa.Table:
        # keep the REAL id types on empty output: untyped pa.array([])
        # infers null and produces schema-conflicting blocks downstream
        return pa.table({
            "query_id": pa.array([], self._qid_type),
            "neighbor_id": pa.array([], batch.schema.field(self._id).type),
            "cosine": pa.array([], pa.float64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._typed_empty(batch)
        ids = np.asarray(batch[self._id].to_pylist())
        mat = _normalize(_stack(batch[self._vec]))          # [n, d]
        sims = mat @ self._q.T                              # [n, nq]
        if self._qlabels is not None:
            # SQL semantics (oracle: WHERE c.label <> q.label): a NULL
            # label on EITHER side never satisfies <>, so mask it too —
            # plain == would silently keep null-labeled candidates
            raw = batch[self._label].to_pylist()
            labels = np.asarray(raw)
            cand_null = np.array([l is None for l in raw], dtype=bool)
            q_null = np.array([l is None for l in self._qlabels.tolist()],
                              dtype=bool)
            mask = (labels[:, None] == self._qlabels[None, :])
            mask |= cand_null[:, None]
            mask |= q_null[None, :]
            sims[mask] = -np.inf
        k = min(self._k, len(ids))
        kth = np.partition(sims, -k, axis=0)[-k]            # [nq]
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            rows = np.nonzero(col >= kth[qi])[0]
            rows = rows[np.isfinite(col[rows])]             # drop masked
            out_q.extend([self._qids[qi]] * len(rows))
            out_n.extend(ids[rows].tolist())
            out_s.extend(col[rows].tolist())
        if not out_q:                                       # fully masked
            return self._typed_empty(batch)
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )


def _merge_topk(k: int, exclude_self: bool, keep_scores: bool = False):
    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        # deterministic: sort by (-cosine, neighbor_id)
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        cols = ["query_id", "neighbor_id", "rank"] + (["cosine"] if keep_scores else [])
        return g[cols]

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
    keep_scores: bool = False,
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
        concurrency=concurrency or pinned_pool(8),
    )
    return cands.groupby("query_id").map_groups(
        _merge_topk(k, exclude_self, keep_scores), batch_format="pandas"
    )



class MaskedTopK:
    """Map stage: local top-k where each (row, query) pair is allowed only
    if the row's partition (LSH bucket / IVF list) is in the query's probe
    set. One actor-pool pass over the corpus — no per-bucket sub-pipelines.

    ``assign`` maps a [n, d] matrix to an int partition id per row;
    ``probe_bool`` is [nq, num_partitions] of allowed partitions.
    At storage scale the same partition ids prune reads instead
    (the index table is written partitioned by this id).
    """

    def __init__(self, queries_ref, query_ids, assign_ref, probe_bool_ref, k: int,
                 id_column: str = "vec_id", vector_column: str = "embedding"):
        self._q = _normalize(ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref)
        self._qids = np.asarray(query_ids)
        self._qid_type = (pa.array(self._qids.tolist()).type
                          if len(self._qids) else pa.int64())
        self._assign = ray.get(assign_ref) if isinstance(assign_ref, ray.ObjectRef) else assign_ref
        self._probe = ray.get(probe_bool_ref) if isinstance(probe_bool_ref, ray.ObjectRef) else probe_bool_ref
        self._k = k
        self._id = id_column
        self._vec = vector_column

    def _typed_empty(self, batch: pa.Table) -> pa.Table:
        # keep the REAL id types on empty output: untyped pa.array([])
        # infers null and produces schema-conflicting blocks downstream
        return pa.table({
            "query_id": pa.array([], self._qid_type),
            "neighbor_id": pa.array(
                [], batch.schema.field(self._id).type),
            "cosine": pa.array([], pa.float64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._typed_empty(batch)
        ids = np.asarray(batch[self._id].to_pylist())
        mat = _normalize(_stack(batch[self._vec]))
        parts = self._assign(mat)                           # [n]
        allowed = self._probe[:, parts].T                   # [n, nq]
        sims = mat @ self._q.T
        sims = np.where(allowed, sims, -np.inf)
        k = min(self._k, len(ids))
        # tie-safe cut (see BruteForceTopK): keep every row matching the
        # per-query k-th score so the global merge's neighbor_id
        # tie-break sees every candidate the oracle could rank
        kth = np.partition(sims, -k, axis=0)[-k]            # [nq]
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            rows = np.nonzero(col >= kth[qi])[0]
            rows = rows[np.isfinite(col[rows])]             # drop masked
            out_q.extend([self._qids[qi]] * len(rows))
            out_n.extend(ids[rows].tolist())
            out_s.extend(col[rows].tolist())
        if not out_q:                                       # fully masked
            return self._typed_empty(batch)
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )


def _masked_topk(ds, queries, query_ids, k, assign_fn, probe_bool,
                 id_column, vector_column, exclude_self=True, concurrency=None):
    import ray as _ray

    cands = ds.map_batches(
        MaskedTopK,
        fn_constructor_kwargs={
            "queries_ref": _ray.put(np.asarray(queries, dtype=np.float64)),
            "query_ids": list(query_ids),
            "assign_ref": _ray.put(assign_fn),
            "probe_bool_ref": _ray.put(probe_bool),
            "k": k + (1 if exclude_self else 0),
            "id_column": id_column, "vector_column": vector_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
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
    """Approximate top-k: each query scores only vectors in its own LSH
    bucket (masked single pass). Recall < 1 by construction; tests
    compare against ``knn_topk``."""
    queries = np.asarray(queries, dtype=np.float64)
    planes = make_hyperplanes(queries.shape[1], bits, seed)
    weights = 1 << np.arange(bits)

    def assign(mat: np.ndarray) -> np.ndarray:
        return (((mat @ planes.T) > 0) @ weights).astype(np.int64)

    q_buckets = assign(_normalize(queries))
    probe = np.zeros((len(queries), 1 << bits), dtype=bool)
    probe[np.arange(len(queries)), q_buckets] = True
    return _masked_topk(ds, queries, query_ids, k, assign, probe,
                        id_column, vector_column)


# --------------------------------------------------------------- IVF ----


def _ivf_probe(queries: np.ndarray, centroids: np.ndarray, nprobe: int):
    """(order, probe_bool) for IVF probing: per query, the ``nprobe``
    nearest centroids — ONE implementation so the in-memory path
    (``knn_topk_ivf``) and the persisted-index path (``ivf_query_index``)
    can never rank differently."""
    qsims = _normalize(queries) @ centroids.T
    order = np.argsort(-qsims, axis=1)[:, :nprobe]
    probe = np.zeros((len(queries), len(centroids)), dtype=bool)
    for i in range(len(queries)):
        probe[i, order[i]] = True
    return order, probe


def train_ivf_centroids(
    ds: rd.Dataset,
    num_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
    vector_column: str = "embedding",
) -> np.ndarray:
    """k-means centroids (normalized) from a bounded sample.

    The sample (not the corpus) fits on the driver; Lloyd iterations are
    numpy. Blocks are read in randomized order so ordered/clustered
    corpora still yield a spread sample; training cost is independent of
    corpus size.
    """
    # randomize BLOCK order before sampling: a head over a sorted/
    # clustered corpus would train every centroid on one region
    rows = ds.randomize_block_order(seed=seed).limit(sample_size).take_all()
    if not rows:
        raise ValueError(
            "train_ivf_centroids: empty corpus — nothing to cluster "
            "(upstream filter removed every row?)")
    mat = _normalize(np.array([r[vector_column] for r in rows], dtype=np.float64))
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(num_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_assign_batch(batch: pa.Table, centroids: np.ndarray,
                     vector_column: str = "embedding") -> pa.Table:
    """Append ``centroid`` — nearest-centroid id (the IVF partition key;
    at scale this is the stored index's partitioning column)."""
    mat = _normalize(_stack(batch[vector_column]))
    assign = (mat @ centroids.T).argmax(axis=1).astype(np.int64)
    return batch.append_column("centroid", pa.array(assign))


def fixed_centroids(k: int = 8, dim: int = 64, seed: int = 7) -> np.ndarray:
    """Deterministic data-independent unit centroids (seeded Gaussian).

    Used by ``cluster_assign`` when the caller wants a reproducible
    bucketing whose centroid matrix can be re-derived anywhere (e.g. a
    SQL oracle embedding the literals) — for data-trained centroids use
    ``train_ivf_centroids``."""
    rng = np.random.RandomState(seed)
    return _normalize(rng.standard_normal((k, dim)))


def cluster_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> rd.Dataset:
    """Nearest-centroid cluster assignment over an embedding column:
    (id, cluster) with cluster = argmax cosine(embedding, centroid),
    ties to the lowest centroid id.

    The semantic building block under IVF partitioning, embedding-space
    mixture balancing, and cluster-stratified sampling. Scale shape: the
    centroid matrix is broadcast once via ``ray.put`` and fetched per
    TASK (zero-copy plasma read), each batch is one float64 matmul +
    argmax — no shuffle at all."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        mat = _normalize(_stack(batch[vector_column]))
        cluster = (mat @ cent.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            id_column: batch[id_column],
            "cluster": pa.array(cluster, type=pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit(
    ds: rd.Dataset,
    init_centroids: np.ndarray,
    iters: int = 5,
    vector_column: str = "embedding",
    fold_partitions: int = 8,
) -> np.ndarray:
    """Distributed full-corpus Lloyd iterations (spherical k-means).

    The scale path next to the sample-based ``train_ivf_centroids``:
    each iteration is ONE streaming pass over the corpus. Per batch, a
    single matmul + argmax assigns rows and a one-hot matmul produces
    the per-cluster (sum-vector, count) partial — one fixed-size
    (k × dim) row per BATCH leaves each task, so the exchange is
    O(k × dim × num_batches) regardless of corpus size. Partials fold
    pairwise through ``fold_partitions`` coalesced blocks (the
    ``build_bloom`` / ``approx_quantiles`` fold shape) and the driver
    sums ≤ ``fold_partitions`` survivors. Vectors are L2-normalized
    before assignment and the new centroid is the re-normalized mean of
    its members' normalized vectors; an empty cluster keeps its previous
    centroid. The centroid matrix is broadcast once per iteration via
    ``ray.put``, never re-shipped per batch.

    The canonical corpus-curation clusterer (SemDeDup-style semantic
    bucketing, cluster-balanced mixtures) and the full-data refinement
    step for IVF index centroids."""
    cent = _normalize(np.asarray(init_centroids, dtype=np.float64))
    k, dim = cent.shape
    vectors = ds.select_columns([vector_column])

    def fold(batch: pa.Table) -> pa.Table:
        s = np.zeros((k, dim), dtype=np.float64)
        n = np.zeros(k, dtype=np.int64)
        for sb, nb in zip(batch["s"].to_pylist(), batch["n"].to_pylist()):
            s += np.frombuffer(sb, dtype=np.float64).reshape(k, dim)
            n += np.frombuffer(nb, dtype=np.int64)
        return pa.table({
            "s": pa.array([s.tobytes()], type=pa.large_binary()),
            "n": pa.array([n.tobytes()], type=pa.large_binary()),
        })

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref)
            mat = _normalize(_stack(batch[vector_column]))
            if len(mat):
                assign = (mat @ c.T).argmax(axis=1)
                onehot = (assign[:, None] == np.arange(k)[None, :])
                s = onehot.T.astype(np.float64) @ mat
                n = np.bincount(assign, minlength=k).astype(np.int64)
            else:
                s = np.zeros((k, dim), dtype=np.float64)
                n = np.zeros(k, dtype=np.int64)
            return pa.table({
                "s": pa.array([s.tobytes()], type=pa.large_binary()),
                "n": pa.array([n.tobytes()], type=pa.large_binary()),
            })

        folded = (
            vectors
            .map_batches(partial, batch_format="pyarrow")
            .repartition(fold_partitions)
            .map_batches(fold, batch_format="pyarrow", batch_size=None)
        )
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for row in folded.take_all():
            sums += np.frombuffer(row["s"], dtype=np.float64).reshape(k, dim)
            counts += np.frombuffer(row["n"], dtype=np.int64)
        new = cent.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cent = _normalize(new)
    return cent


def semantic_dedup_pairs(
    ds: rd.Dataset,
    centroids: np.ndarray,
    threshold: float = 0.9,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    max_cluster: int = 32768,
    block: int = 512,
) -> rd.Dataset:
    """Cluster-scoped embedding near-duplicate pairs (the SemDeDup
    shape, Abbas et al. 2023): assign every vector to its nearest
    centroid, then compare pairs ONLY within a cluster — (id_a, id_b)
    with cosine >= threshold, same cluster, id_a < id_b.

    Scale shape: the centroid matrix is ``ray.put`` once and each batch
    is one matmul+argmax (no driver pass); ONE shuffle keyed on the
    cluster id moves each vector exactly once; within a cluster the
    all-pairs scores run blockwise (``block`` rows x cluster matmuls,
    bounded memory) and only hit pairs leave the task. Cross-cluster
    near-dups are invisible by design — that is the SemDeDup recall
    trade that makes all-pairs affordable; size k so clusters stay
    under ``max_cluster`` (a larger cluster raises loudly rather than
    quietly materializing an n^2 score matrix).

    Contrast with ``embedding_dup_pairs``: sign-LSH banding is the
    recall-tunable generic path; cluster scoping is the curation path
    whose buckets are SEMANTIC, so its pair set is exactly "duplicates
    within a semantic neighborhood" — the set SemDeDup prunes."""
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    cent_ref = ray.put(cent)
    id_type = arrow_types(ds)[id_column]

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _normalize(_stack(batch[vector_column]))
        cluster = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            id_column: batch[id_column],
            vector_column: batch[vector_column],
            "cluster": pa.array(cluster, type=pa.int64()),
        })

    def pairs_in_cluster(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n > max_cluster:
            raise ValueError(
                f"semantic_dedup_pairs: cluster of {n} rows exceeds "
                f"max_cluster={max_cluster} — raise the number of "
                "centroids (smaller clusters) or max_cluster")
        empty = pa.table({"id_a": pa.array([], type=id_type),
                          "id_b": pa.array([], type=id_type)})
        if n < 2:
            return empty
        ids = np.asarray(group[id_column].to_pylist())
        mat = _normalize(_stack(group[vector_column]))
        out_a, out_b = [], []
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            sims = mat[lo:hi] @ mat.T
            bi, j = np.where(sims >= threshold)
            a, b = ids[bi + lo], ids[j]
            keep = a < b
            out_a.append(a[keep])
            out_b.append(b[keep])
        a = np.concatenate(out_a)
        if not len(a):
            return empty
        return pa.table({"id_a": pa.array(a, type=id_type),
                         "id_b": pa.array(np.concatenate(out_b),
                                          type=id_type)})

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return assigned.groupby("cluster").map_groups(
        pairs_in_cluster, batch_format="pyarrow")


def knn_topk_ivf(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> rd.Dataset:
    """IVF approximate top-k: each query scores only vectors whose
    nearest centroid is among its ``nprobe`` closest lists (masked single
    pass; nprobe == num_centroids → exact). Tests compare against
    ``knn_topk``."""
    queries = np.asarray(queries, dtype=np.float64)
    centroids = train_ivf_centroids(
        ds, num_centroids, seed=seed, vector_column=vector_column
    )

    def assign(mat: np.ndarray) -> np.ndarray:
        return (mat @ centroids.T).argmax(axis=1).astype(np.int64)

    order, probe = _ivf_probe(queries, centroids, nprobe)
    return _masked_topk(ds, queries, query_ids, k, assign, probe,
                        id_column, vector_column)


def ivf_write_index(
    ds: rd.Dataset,
    index_dir: str,
    num_centroids: int = 16,
    seed: int = 42,
    vector_column: str = "embedding",
    refine_iters: int = 0,
) -> np.ndarray:
    """Build and PERSIST an IVF index: the corpus is written as parquet
    partitioned by nearest-centroid id (one directory per inverted
    list), centroids saved alongside. This is the storage-scale ANN
    path: a query then reads ONLY its ``nprobe`` probed partitions from
    disk — partition pruning at the storage layer, not a full-corpus
    masked scan — so query cost is O(corpus/num_centroids × nprobe)
    bytes regardless of corpus size. Building is one streaming pass
    (assign column + partitioned write); the index is resumable input
    for any number of later query batches.

    ``refine_iters > 0`` follows the bounded-sample training with that
    many full-corpus ``kmeans_fit`` Lloyd passes — each is one streaming
    scan with a fixed-size per-batch partial, so refinement cost is
    linear in corpus bytes and independent of driver memory. Use it when
    the sample under-represents the corpus (heavy skew, many small
    modes) and list-size balance matters more than build time.
    """
    import os

    centroids = train_ivf_centroids(
        ds, num_centroids, seed=seed, vector_column=vector_column
    )
    if refine_iters > 0:
        centroids = kmeans_fit(
            ds, centroids, iters=refine_iters, vector_column=vector_column
        )
    assigned = ds.map_batches(
        lambda b: ivf_assign_batch(b, centroids, vector_column),
        batch_format="pyarrow",
    )
    # data under lists/ (pure hive layout — sidecar files would break
    # partition inference on read), centroids beside it
    assigned.write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["centroid"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    return centroids


def ivf_query_index(
    index_dir: str,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    nprobe: int = 4,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    centroids: np.ndarray | None = None,
) -> rd.Dataset:
    """Top-k over a persisted IVF index (``ivf_write_index``): computes
    the union of all queries' probed lists, reads ONLY those partitions
    (hive-partition pruning — unprobed directories are never opened),
    then runs the same masked single-pass scoring restricted to each
    query's own probe set."""
    import os

    if centroids is None:
        centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    queries = np.asarray(queries, dtype=np.float64)
    order, probe = _ivf_probe(queries, centroids, nprobe)
    # explicit storage-level pruning: pass ONLY the probed inverted-list
    # directories to the reader — unprobed partitions are never listed,
    # opened, or decoded (a partition-column `filter=` would also prune
    # row groups, but Ray's fragment sampler can't evaluate filters on
    # hive-only fields; enumerating paths is equivalent and explicit)
    import glob

    paths = [
        f
        for c in sorted({int(c) for row in order for c in row})
        for f in sorted(
            glob.glob(os.path.join(index_dir, "lists", f"centroid={c}", "*.parquet"))
        )
    ]
    if not paths:
        # every probed inverted list is empty (dead centroids from a
        # small training sample) — rd.read_parquet([]) would raise.
        # NOTE: listing is local-filesystem glob; an object-store index
        # needs a pyarrow.fs FileSelector here.
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.string()),
            "cosine": pa.array([], type=pa.float64()),
        }))
    ds = rd.read_parquet(paths)

    def assign(mat: np.ndarray) -> np.ndarray:
        return (mat @ centroids.T).argmax(axis=1).astype(np.int64)

    return _masked_topk(ds, queries, query_ids, k, assign, probe,
                        id_column, vector_column)


# ------------------------------------------------- embedding near-dup ---


def _lsh_band_params(threshold: float, bits: int | None, num_tables: int | None,
                     target_recall: float = 0.98) -> tuple[int, int]:
    """Derive (bits, num_tables) for sign-LSH banding at a cosine
    threshold: per-bit collision p = 1 - acos(t)/pi (Charikar 2002),
    per-table p^bits, recall = 1 - (1 - p^bits)^L solved for L.

    Low thresholds are intrinsically expensive for hyperplane LSH (the
    per-bit signal fades as t -> 0), which is why the derived L is
    capped — callers wanting exact answers at low thresholds should use
    the all-pairs path.
    """
    bits = bits or 8
    if num_tables is None:
        p_bit = max(1e-6, 1.0 - float(np.arccos(min(1.0, threshold))) / np.pi)
        p_table = p_bit ** bits
        num_tables = int(np.ceil(np.log(1.0 - target_recall) / np.log(1.0 - p_table)))
        num_tables = int(min(max(num_tables, 4), 128))
    return bits, num_tables


def verify_pairs_cosine(
    pairs: rd.Dataset,
    ds: rd.Dataset,
    threshold: float,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Exact cosine verification of candidate (id_a, id_b) pairs —
    distributed: two hash joins attach each side's vector to the pair
    rows (stages/pairs.py; only ids touch the driver), then a vectorized
    row-wise dot product filters by ``threshold``."""
    from .pairs import attach_pair_payload

    id_type = arrow_types(ds)[id_column]
    attached = attach_pair_payload(
        pairs, ds, id_column, vector_column, num_partitions=num_partitions
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], type=id_type),
                             "id_b": pa.array([], type=id_type),
                             "cosine": pa.array([], type=pa.float64())})
        va = _normalize(_stack(batch["payload_a"]))
        vb = _normalize(_stack(batch["payload_b"]))
        cos = np.einsum("ij,ij->i", va, vb)
        keep = cos >= threshold
        return pa.table(
            {
                "id_a": batch["id_a"].filter(pa.array(keep)),
                "id_b": batch["id_b"].filter(pa.array(keep)),
                "cosine": pa.array(cos[keep], type=pa.float64()),
            }
        )

    return attached.map_batches(score, batch_format="pyarrow")


def lsh_candidate_pairs(
    ds: rd.Dataset,
    threshold: float,
    bits: int | None = None,
    num_tables: int | None = None,
    seed: int = 42,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    max_bucket: int = 1024,
) -> rd.Dataset:
    """Candidate near-dup pairs by multi-table sign-LSH banding: each
    vector lands in one bucket per table (one matmul per batch for ALL
    tables), pairs sharing any bucket become candidates — the only
    shuffle hashes band rows into bucket groups, moving (id, table, key)
    rows, never vectors. Pair expansion is the shared bucket-keyed
    vectorized shape (``dedup.expand_bucketed_pairs``); oversize buckets
    are capped with a logged drop.
    """
    from .dedup import expand_bucketed_pairs
    from ..functions.partitioning import shuffle_partitions

    bits, num_tables = _lsh_band_params(threshold, bits, num_tables)
    first = ds.take(1)
    if not first:
        sch = ds.schema()
        id_type = (arrow_types(ds)[id_column]
                   if sch is not None and id_column in sch.names else pa.string())
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=id_type),
            "id_b": pa.array([], type=id_type),
        }))
    dim = len(first[0][vector_column])
    planes = make_hyperplanes(dim, bits * num_tables, seed)  # [L*bits, d]
    planes_ref = ray.put(planes)
    weights = (1 << np.arange(bits)).astype(np.int64)

    def band_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_column: pa.array([], batch.schema.field(id_column).type),
                             "t": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int64())})
        mat = _normalize(_stack(batch[vector_column]))
        signs = (mat @ ray.get(planes_ref).T) > 0          # [n, L*bits]
        keys = signs.reshape(len(mat), num_tables, bits) @ weights  # [n, L]
        n = len(mat)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_column: pa.array(np.repeat(ids, num_tables)),
                "t": pa.array(np.tile(np.arange(num_tables, dtype=np.int32), n)),
                "key": pa.array(keys.reshape(-1).astype(np.int64)),
            }
        )

    banded = ds.map_batches(band_rows, batch_format="pyarrow")
    id_type = arrow_types(ds)[id_column]
    return expand_bucketed_pairs(
        banded, ["t", "key"], id_column, id_type,
        max_bucket, shuffle_partitions(16, ds),
    )


#: Above this row count ``embedding_dup_pairs`` switches from the exact
#: all-pairs broadcast (O(n^2) work, corpus matrix in the object store)
#: to LSH-bucketed candidates + distributed exact verification.
EXACT_PAIRS_MAX_ROWS = 200_000


def embedding_dup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.9,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    method: str = "auto",
    bits: int | None = None,
    num_tables: int | None = None,
    seed: int = 42,
    max_bucket: int = 1024,
) -> rd.Dataset:
    """Embedding-cosine near-duplicates: (id_a, id_b) with
    cosine >= threshold and id_a < id_b.

    ``method="auto"`` dispatches on corpus size: up to
    ``EXACT_PAIRS_MAX_ROWS`` rows the exact all-pairs path runs (the
    corpus matrix is ``ray.put`` once, each batch matmuls against it —
    exact, no shuffle); beyond that the scale path runs: multi-table
    sign-LSH banding emits candidate pairs (the shuffle moves only
    (id, table, key) rows) and exact cosine verification re-scores each
    candidate distributedly, so precision is always 1.0 and recall
    follows the banding parameters (derived from the threshold;
    see ``_lsh_band_params``). ``method="exact"``/``"lsh"`` force a path.
    """
    if method == "auto":
        # materialize before dispatch: the auto path consumes ds up to 4
        # times (count, dim probe, banding scan, verification scan) and
        # Ray Data re-executes derived lineage once per consumer
        ds = ds.materialize()
        method = "exact" if ds.count() <= EXACT_PAIRS_MAX_ROWS else "lsh"
    if method == "lsh":
        cand = lsh_candidate_pairs(
            ds, threshold, bits=bits, num_tables=num_tables, seed=seed,
            id_column=id_column, vector_column=vector_column,
            max_bucket=max_bucket,
        )
        verified = verify_pairs_cosine(
            cand, ds, threshold, id_column=id_column,
            vector_column=vector_column,
        )
        return verified.select_columns(["id_a", "id_b"])
    if method != "exact":
        raise ValueError(f"unknown method {method!r}")

    rows = ds.select_columns([id_column, vector_column]).take_all()
    if not rows:
        import ray.data as _rd

        return _rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                        "id_b": pa.array([], pa.int64())}))
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


def _list_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, dim) float64 matrix from a ``list<float>`` column — zero-copy
    flatten + reshape when the lists are uniform-length (the embedding
    contract); ragged or null-bearing blocks go through ``_stack``,
    which names the offending row instead of dying deep in numpy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if col.null_count == 0 and (widths == widths[0]).all() and widths[0] > 0:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(n, int(widths[0]))
    return _stack(col)


def embedding_group_stats(
    embeddings: rd.Dataset,
    group_column: str = "label",
    vector_column: str = "embedding",
) -> rd.Dataset:
    """Per-group embedding dispersion: (group, n, inertia) where inertia
    is the mean squared distance to the group's OWN centroid — the
    "how tight is this cluster / source / language" diagnostic run
    before sampling or semantic dedup.

    One pass, no second centroid-distance scan: with c = mean(x),
    E‖x−c‖² = E‖x‖² − ‖c‖², so each batch emits per-group partials
    (n, Σ‖x‖², Σx) from a vectorized flatten-reshape matmul, and a tiny
    per-group combine (#groups × #batches partial rows, vectors of one
    dim each) finishes the algebra. Nothing vector-sized is shuffled
    beyond the partials; nothing reaches the driver.
    """

    def partials(batch: pa.Table) -> pa.Table:
        mat = _list_matrix(batch[vector_column])
        groups = batch[group_column]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        keys = groups.to_numpy(zero_copy_only=False)
        # factorize, not np.unique: a null group key must stay a group
        # (np.unique sorts and None < str raises)
        inv, uniq = pd.factorize(keys, use_na_sentinel=False)
        k = len(uniq)
        counts = np.bincount(inv, minlength=k)
        sq = (mat * mat).sum(axis=1)
        sumsq = np.bincount(inv, weights=sq, minlength=k)
        dim = mat.shape[1] if mat.size else 0
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, inv, mat)
        # a null NUMERIC key surfaces from factorize as NaN — restore
        # None so the typed Arrow column round-trips it as a null group
        key_vals = [None if (isinstance(v, float) and v != v) else v
                    for v in list(uniq)]
        return pa.table({
            group_column: pa.array(key_vals, type=groups.type),
            "n": pa.array(counts, type=pa.int64()),
            "sumsq": pa.array(sumsq, type=pa.float64()),
            "sumvec": pa.array(sums.tolist(),
                               type=pa.list_(pa.float64())),
        })

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        n = int(df["n"].sum())
        sumsq = float(df["sumsq"].sum())
        sumvec = np.sum(np.stack(df["sumvec"].to_numpy()), axis=0)
        centroid = sumvec / n
        inertia = sumsq / n - float(centroid @ centroid)
        return pd.DataFrame({
            group_column: df[group_column].iloc[:1],
            "n": pd.array([n], dtype="int64"),
            "inertia": [round(inertia, 6)],
        })

    return (
        embeddings.select_columns([group_column, vector_column])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(group_column)
        .map_groups(combine, batch_format="pandas")
    )


def hard_negatives(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    query_labels,
    k: int = 10,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    label_column: str = "label",
    concurrency=None,
) -> rd.Dataset:
    """Hard-negative mining: per query, the k most cosine-similar
    corpus vectors whose label DIFFERS from the query's —
    (query_id, neighbor_id, rank), rank 1 = hardest negative.
    Deterministic tie-break on neighbor_id, like ``knn_topk``; the map
    stage IS ``BruteForceTopK`` with its label mask engaged."""
    queries_ref = ray.put(np.asarray(queries, dtype=np.float64))
    cands = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={
            "queries_ref": queries_ref, "query_ids": list(query_ids),
            "query_labels": list(query_labels), "k": k,
            "id_column": id_column, "vector_column": vector_column,
            "label_column": label_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency or pinned_pool(8),
    )
    return cands.groupby("query_id").map_groups(
        _merge_topk(k, exclude_self=False), batch_format="pandas")


def embedding_quantize(
    embeddings: rd.Dataset,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> rd.Dataset:
    """Per-vector symmetric int8 quantization summary: scale =
    max(|x|)/127 and the (sum, min, max) of the quantized codes
    q_i = trunc(x_i * 127 / max|x|) — the calibration stats you'd
    record when compressing an embedding store to int8. trunc (not
    round) so engine and SQL oracle share exact float64 semantics with
    no half-way rounding-mode ambiguity; an all-zero vector gets
    scale 0 and all-zero codes. At scale the storage variant would
    also emit the code bytes as a fixed_size_binary column; the stats
    are the verifiable part.

    Embarrassingly parallel: one vectorized map_batches, no shuffle —
    float32 values are widened to float64 (exact) so numpy and SQL
    compute identical IEEE results.
    """

    def quant(batch: pa.Table) -> pa.Table:
        mat = _list_matrix(batch[vector_column])  # float64 (n, d)
        n = len(batch)
        if mat.size == 0:
            z = np.zeros(n, dtype=np.int64)
            return pa.table({
                id_column: batch[id_column],
                "scale": pa.array(np.zeros(n), type=pa.float64()),
                "qsum": pa.array(z, type=pa.int64()),
                "qmin": pa.array(z, type=pa.int64()),
                "qmax": pa.array(z, type=pa.int64()),
            })
        maxabs = np.abs(mat).max(axis=1)
        safe = np.where(maxabs == 0.0, 1.0, maxabs)
        q = np.trunc(mat * 127.0 / safe[:, None])
        q[maxabs == 0.0, :] = 0.0
        return pa.table({
            id_column: batch[id_column],
            "scale": pa.array(maxabs / 127.0, type=pa.float64()),
            "qsum": pa.array(q.sum(axis=1).astype(np.int64), type=pa.int64()),
            "qmin": pa.array(q.min(axis=1).astype(np.int64), type=pa.int64()),
            "qmax": pa.array(q.max(axis=1).astype(np.int64), type=pa.int64()),
        })

    return embeddings.select_columns([id_column, vector_column]).map_batches(
        quant, batch_format="pyarrow")


def embedding_outliers(
    ds: rd.Dataset,
    column: str = "embedding",
    id_column: str = "vec_id",
    z: float = 2.0,
) -> rd.Dataset:
    """Embedding-hygiene gate: rows whose DISTANCE FROM THE CORPUS
    CENTROID is a z-score outlier (|d − mean_d| > z · stddev_pop) —
    degenerate embeddings (zeroed, exploded, half-written, wrong model)
    sit far from the data's center and poison cosine similarity, ANN
    recall and k-means, so curation drops or requeues them before any
    similarity stage. Distance-from-centroid is used rather than the
    raw L2 norm because normalized embedding tables (like this repo's
    test embeddings) have ZERO norm variance — the norm z-score is
    numerically meaningless there, while centroid distance always
    carries real spread. Returns (id, dist, z) rounded to 6 decimals.
    Known z-score property: one EXTREME outlier inflates sd and can mask
    moderate ones (run iteratively, or lower ``z``, for contaminated
    batches) — inherent to the mean/std rule, kept because mean/std is
    what a SQL oracle reproduces bit-for-bit at any scale.

    Three streaming passes, zero shuffles: centroid vector partials
    (dim-sized), then scalar distance-moment partials, then the
    broadcast-threshold filter scan. Float shapes match the SQL oracle
    (sums accumulate float64 over the raw float32 values; m = s1/n,
    sd = sqrt(max(0, s2/n - m*m))).
    """
    import numpy as np

    def cent_partial(batch: pa.Table) -> pa.Table:
        # empty blocks (filters/repartitions produce them) yield a
        # (0, 0) matrix — emit a ZERO-ROW partial rather than a
        # zero-length sum vector that would poison the fold
        if batch.num_rows == 0:
            return pa.table({
                "n": pa.array([], type=pa.float64()),
                "s": pa.array([], type=pa.list_(pa.float64())),
            })
        mat = _list_matrix(batch[column]).astype(np.float64)
        return pa.table({
            "n": pa.array([float(len(mat))]),
            "s": pa.array([mat.sum(axis=0)], type=pa.list_(pa.float64())),
        })

    n = 0.0
    svec = None
    for r in ds.map_batches(cent_partial, batch_format="pyarrow").take_all():
        n += r["n"]
        v = np.asarray(r["s"], dtype=np.float64)
        svec = v if svec is None else svec + v
    if n == 0:
        return rd.from_arrow(pa.table({
            id_column: pa.array([], type=pa.int64()),
            "dist": pa.array([], type=pa.float64()),
            "z": pa.array([], type=pa.float64()),
        }))
    centroid = svec / n

    def dists_of(batch: pa.Table) -> np.ndarray:
        if batch.num_rows == 0:   # (0, 0) matrix won't broadcast
            return np.empty(0, dtype=np.float64)
        mat = _list_matrix(batch[column]).astype(np.float64)
        diff = mat - centroid
        return np.sqrt((diff * diff).sum(axis=1))

    def moments(batch: pa.Table) -> pa.Table:
        d = dists_of(batch)
        return pa.table({
            "k": pa.array([float(len(d))]),
            "s1": pa.array([float(d.sum())]),
            "s2": pa.array([float((d * d).sum())]),
        })

    k = s1 = s2 = 0.0
    for r in ds.map_batches(moments, batch_format="pyarrow").take_all():
        k += r["k"]; s1 += r["s1"]; s2 += r["s2"]
    m = s1 / k
    sd = float(np.sqrt(max(0.0, s2 / k - m * m)))

    def flag(batch: pa.Table) -> pa.Table:
        d = dists_of(batch)
        keep = np.abs(d - m) > z * sd
        ids = batch[id_column].filter(pa.array(keep, type=pa.bool_()))
        d = d[keep]
        return pa.table({
            id_column: ids,
            "dist": pa.array(np.round(d, 6), type=pa.float64()),
            "z": pa.array(np.round((d - m) / sd, 6), type=pa.float64()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")
