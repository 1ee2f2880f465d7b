"""Distributed PCA over an embedding column: moment partials →
driver-side eigendecomposition → broadcast projection.

The reference reduces token spaces with dense embedding matrices loaded
whole into memory (``saber/embeddings.py``, ``saber/preprocessor.py``);
this module extends that surface to the decomposition a large-scale
embedding pipeline actually needs — fit a PCA basis over 10^9+ vectors
WITHOUT ever materializing the matrix.

Scale shape (the classic covariance-sketch factorization):

1. **Partials** — each batch emits exactly one row holding
   ``(n, Σx, XᵀX)``: for d-dim embeddings that is ``d + d²`` float64s
   (d=64 → ~33 KB) regardless of batch row count. No shuffle — the
   partial stream is tiny and folds on the driver.
2. **Fit** — the driver assembles ``cov = (XᵀX − n·μμᵀ)/(n−1)`` (a
   d×d matrix, bytes) and runs one LAPACK ``eigh``. Cost is O(d³),
   independent of corpus size. Eigenvector SIGN is canonicalized
   (largest-|loading| coordinate made positive) so the basis is a pure
   function of the data, not of LAPACK internals.
3. **Project** — the (mean, components) pair is ``ray.put`` once and
   every map task reads it from the object store; projection is one
   numpy matmul per batch. At 100 TB the basis broadcast is ~100 KB
   while the corpus streams.

Float determinism: partials fold in take_all order, so sums can differ
across partition layouts by ~1e-12 relative; every queryable output is
rounded to 6 decimals (the repo-wide oracle convention), far above the
fold noise at any realistic block count.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .similarity import _stack


def _moment_partials(ds: rd.Dataset, column: str) -> list[dict]:
    """One (n, Σx, XᵀX) row per non-empty batch; each is O(d²) bytes."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.list_(pa.float64())),
                "xtx": pa.array([], type=pa.list_(pa.float64())),
            })
        mat = _stack(batch[column])
        return pa.table({
            "n": pa.array([mat.shape[0]], type=pa.int64()),
            "s": pa.array([mat.sum(axis=0).tolist()],
                          type=pa.list_(pa.float64())),
            "xtx": pa.array([(mat.T @ mat).ravel().tolist()],
                            type=pa.list_(pa.float64())),
        })

    return ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow").take_all()


def _fold_moments(rows: list[dict]) -> tuple[int, np.ndarray, np.ndarray]:
    if not rows:
        raise ValueError("PCA fit over an empty dataset")
    n = 0
    s = None
    xtx = None
    for r in rows:
        n += int(r["n"])
        rs = np.asarray(r["s"], dtype=np.float64)
        rx = np.asarray(r["xtx"], dtype=np.float64)
        s = rs if s is None else s + rs
        xtx = rx if xtx is None else xtx + rx
    d = s.shape[0]
    return n, s, xtx.reshape(d, d)


@dataclass
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes, unit norm
    eigenvalues: np.ndarray   # (k,) descending
    explained_variance_ratio: np.ndarray  # (k,)
    n: int


def _canonical_signs(components: np.ndarray) -> np.ndarray:
    """Flip each eigenvector so its largest-|loading| coordinate is
    positive — eigh's sign choice is implementation-defined; this makes
    the basis a function of the data alone. Ties (|+x| == |−x| at the
    argmax) keep the lower coordinate index via argmax's first-hit."""
    flipped = components.copy()
    for i in range(flipped.shape[0]):
        j = int(np.argmax(np.abs(flipped[i])))
        if flipped[i, j] < 0:
            flipped[i] = -flipped[i]
    return flipped


def pca_fit(ds: rd.Dataset, column: str = "embedding", k: int = 8) -> PCAModel:
    """Fit a k-component PCA basis from one streaming pass of moment
    partials. Requires n ≥ 2 rows and k ≤ d."""
    n, s, xtx = _fold_moments(_moment_partials(ds, column))
    if n < 2:
        raise ValueError(f"PCA fit needs at least 2 rows, got {n}")
    d = s.shape[0]
    if not (1 <= k <= d):
        raise ValueError(f"k={k} out of range for {d}-dim embeddings")
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    eigenvalues = np.maximum(evals[order], 0.0)
    components = _canonical_signs(evecs[:, order].T)
    total_var = max(float(np.sum(np.maximum(evals, 0.0))), 1e-300)
    return PCAModel(
        mean=mean,
        components=components,
        eigenvalues=eigenvalues,
        explained_variance_ratio=eigenvalues / total_var,
        n=n,
    )


def pca_project(
    ds: rd.Dataset,
    model: PCAModel,
    column: str = "embedding",
    id_column: str = "vec_id",
    out_column: str = "pc",
) -> rd.Dataset:
    """Project every vector onto the fitted basis: (id, pc list<double>).
    The basis ships once via ``ray.put``; each batch is one matmul."""
    basis_ref = ray.put((model.mean, model.components))

    def project(batch: pa.Table) -> pa.Table:
        mean, comps = ray.get(basis_ref)
        if batch.num_rows == 0:
            # typed from the input schema: a hard-coded int64 here would
            # give empty blocks a different schema than full ones
            return pa.table({
                id_column: pa.array(
                    [], type=batch.schema.field(id_column).type),
                out_column: pa.array([], type=pa.list_(pa.float64())),
            })
        mat = _stack(batch[column])
        proj = (mat - mean) @ comps.T
        return pa.table({
            id_column: batch[id_column],
            out_column: pa.array(proj.tolist(), type=pa.list_(pa.float64())),
        })

    return ds.select_columns([id_column, column]).map_batches(
        project, batch_format="pyarrow")


def dim_stats(ds: rd.Dataset, column: str = "embedding") -> pa.Table:
    """Per-dimension mean and sample stddev, from the same one-pass
    moment partials (no unnest shuffle — the d×d sketch carries the
    diagonal). Returns (dim, mean, std) rounded to 6, dim 0-based."""
    import pyarrow.compute as pc

    n, s, xtx = _fold_moments(_moment_partials(ds, column))
    d = s.shape[0]
    mean = s / n
    if n < 2:
        # SQL stddev_samp of a single row is NULL, not NaN
        std = pa.array([None] * d, type=pa.float64())
    else:
        var = (np.diag(xtx) - n * mean * mean) / (n - 1)
        std = pa.array(np.sqrt(np.maximum(var, 0.0)), type=pa.float64())
    # half-away rounding for DuckDB round() parity (numpy is half-even)
    return pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "mean": pc.round(pa.array(mean, type=pa.float64()), 6,
                         round_mode="half_towards_infinity"),
        "std": pc.round(std, 6, round_mode="half_towards_infinity"),
    })


def covariance_table(
    ds: rd.Dataset, column: str = "embedding", dims: int = 8,
) -> pa.Table:
    """Upper-triangle sample covariance of the first ``dims`` dimensions:
    (i, j, cov) with i ≤ j, rounded to 6. Same single-pass sketch —
    the full d×d matrix is already in the partials; this just slices."""
    n, s, xtx = _fold_moments(_moment_partials(ds, column))
    if n < 2:
        raise ValueError("covariance needs at least 2 rows")
    d = s.shape[0]
    dims = min(dims, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    import pyarrow.compute as pc

    ii, jj = np.triu_indices(dims)
    return pa.table({
        "i": pa.array(ii.astype(np.int64)),
        "j": pa.array(jj.astype(np.int64)),
        "cov": pc.round(pa.array(cov[ii, jj], type=pa.float64()), 6,
                        round_mode="half_towards_infinity"),
    })


def grouped_dim_stats(
    ds: rd.Dataset,
    group_column: str = "label",
    column: str = "embedding",
) -> pa.Table:
    """Per-group per-dimension mean/std — the embedding drift report
    (compare a source's or time-slice's distribution against the
    corpus). Returns (group, dim, mean, std) rounded to 6, dim 0-based;
    single-row groups get SQL-NULL std.

    Scale shape: each batch emits one (n, Σx, Σx²) row PER GROUP
    PRESENT (2d+1 floats each — groups are categorical, so this is a
    handful of rows per batch); the tiny partial stream folds
    driver-side. Null groups are excluded (the repo-wide convention).
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[group_column]
        batch = batch.filter(pc.is_valid(col))
        groups, ns, ss, sqs = [], [], [], []
        if batch.num_rows:
            mat = _stack(batch[column])
            keys = batch[group_column].to_pylist()
            import numpy as np

            uniq, inv = np.unique(np.asarray(keys), return_inverse=True)
            for gi, g in enumerate(uniq):
                sub = mat[inv == gi]
                groups.append(g.item() if hasattr(g, "item") else g)
                ns.append(sub.shape[0])
                ss.append(sub.sum(axis=0).tolist())
                sqs.append((sub * sub).sum(axis=0).tolist())
        gtype = batch.schema.field(group_column).type
        return pa.table({
            # typed from the source column: inference would widen int32
            # labels to int64 and mismatch the empty-batch schema
            group_column: pa.array(groups, type=gtype),
            "n": pa.array(ns, type=pa.int64()),
            "s": pa.array(ss, type=pa.list_(pa.float64())),
            "ss": pa.array(sqs, type=pa.list_(pa.float64())),
        }) if groups else pa.table({
            group_column: batch[group_column].slice(0, 0),
            "n": pa.array([], type=pa.int64()),
            "s": pa.array([], type=pa.list_(pa.float64())),
            "ss": pa.array([], type=pa.list_(pa.float64())),
        })

    from ..functions.arrowtypes import arrow_types

    gtype = arrow_types(ds)[group_column]
    rows = ds.select_columns([group_column, column]).map_batches(
        partial, batch_format="pyarrow").take_all()
    acc: dict = {}
    for r in rows:
        g = r[group_column]
        n, s, ss = acc.get(g, (0, None, None))
        rs = np.asarray(r["s"], dtype=np.float64)
        rss = np.asarray(r["ss"], dtype=np.float64)
        acc[g] = (n + int(r["n"]),
                  rs if s is None else s + rs,
                  rss if ss is None else ss + rss)
    if not acc:
        # empty input OR all-null group keys: the oracle's
        # `WHERE label IS NOT NULL` yields an empty table, not an error
        import pyarrow.compute as pc

        return pa.table({
            group_column: pa.array([], type=gtype),
            "dim": pa.array([], type=pa.int64()),
            "mean": pa.array([], type=pa.float64()),
            "std": pa.array([], type=pa.float64()),
        })
    out_g, out_d, out_m, out_s = [], [], [], []
    for g in sorted(acc):
        n, s, ss = acc[g]
        d = s.shape[0]
        mean = s / n
        if n < 2:
            std = [None] * d
        else:
            var = (ss - n * mean * mean) / (n - 1)
            std = np.sqrt(np.maximum(var, 0.0)).tolist()
        out_g.extend([g] * d)
        out_d.extend(range(d))
        out_m.extend(mean.tolist())
        out_s.extend(std)
    return pa.table({
        # typed, not inferred: inference widens int32 labels to int64
        group_column: pa.array(out_g, type=gtype),
        "dim": pa.array(out_d, type=pa.int64()),
        "mean": pc.round(pa.array(out_m, type=pa.float64()), 6,
                         round_mode="half_towards_infinity"),
        "std": pc.round(pa.array(out_s, type=pa.float64(),
                                 from_pandas=True), 6,
                        round_mode="half_towards_infinity"),
    })
