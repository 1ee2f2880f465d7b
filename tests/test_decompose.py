"""Distributed PCA: moment-sketch fit vs full-matrix numpy, projection,
partition-layout invariance, and the oracled dim-stats/covariance slices."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.decompose import (
    PCAModel,
    covariance_table,
    dim_stats,
    pca_fit,
    pca_project,
)


def _make_ds(n=400, d=12, seed=3, parallelism=5):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions so eigenvalues separate
    basis = rng.normal(size=(d, d))
    scales = np.linspace(3.0, 0.1, d)
    mat = rng.normal(size=(n, d)) * scales @ basis
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
    })
    return rd.from_arrow(tbl).repartition(parallelism), np.asarray(
        tbl["embedding"].to_pylist(), dtype=np.float64)


def _numpy_pca(mat, k):
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return mean, evals[order], evecs[:, order].T


def test_pca_fit_matches_numpy():
    ds, mat = _make_ds()
    model = pca_fit(ds, k=4)
    mean, evals, evecs = _numpy_pca(mat, 4)
    assert model.n == mat.shape[0]
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    np.testing.assert_allclose(model.eigenvalues, evals, rtol=1e-8)
    # compare up to sign (the model canonicalizes; numpy's is arbitrary)
    for i in range(4):
        dot = abs(float(model.components[i] @ evecs[i]))
        assert dot == pytest.approx(1.0, abs=1e-8)
    # canonical sign: largest-|loading| coordinate is positive
    for row in model.components:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # orthonormal basis
    gram = model.components @ model.components.T
    np.testing.assert_allclose(gram, np.eye(4), atol=1e-9)
    # explained variance ratio sums below 1 and is descending
    evr = model.explained_variance_ratio
    assert np.all(np.diff(evr) <= 1e-12) and 0 < evr.sum() <= 1 + 1e-12


def test_pca_layout_invariance():
    ds1, _ = _make_ds(parallelism=1)
    ds7, _ = _make_ds(parallelism=7)
    m1, m7 = pca_fit(ds1, k=3), pca_fit(ds7, k=3)
    np.testing.assert_allclose(m1.eigenvalues, m7.eigenvalues, rtol=1e-9)
    np.testing.assert_allclose(m1.components, m7.components, atol=1e-7)


def test_pca_project():
    ds, mat = _make_ds()
    model = pca_fit(ds, k=3)
    out = pca_project(ds, model, out_column="pc").take_all()
    got = {r["vec_id"]: np.asarray(r["pc"]) for r in out}
    expected = (mat - model.mean) @ model.components.T
    assert len(got) == mat.shape[0]
    for i in range(mat.shape[0]):
        np.testing.assert_allclose(got[i], expected[i], atol=1e-9)
    # projection variance along PC i equals eigenvalue i
    proj = np.stack([got[i] for i in range(mat.shape[0])])
    np.testing.assert_allclose(
        proj.var(axis=0, ddof=1), model.eigenvalues, rtol=1e-8)


def test_dim_stats_and_covariance_match_numpy():
    ds, mat = _make_ds()
    stats = dim_stats(ds).to_pandas()
    np.testing.assert_allclose(
        stats["mean"], np.round(mat.mean(axis=0), 6), atol=1e-6)
    np.testing.assert_allclose(
        stats["std"], np.round(mat.std(axis=0, ddof=1), 6), atol=1e-6)
    assert list(stats["dim"]) == list(range(mat.shape[1]))

    cov_tbl = covariance_table(ds, dims=5).to_pandas()
    cov = np.cov(mat, rowvar=False, ddof=1)
    assert len(cov_tbl) == 15  # 5*6/2 upper triangle
    for _, row in cov_tbl.iterrows():
        assert row["cov"] == pytest.approx(
            round(cov[int(row["i"]), int(row["j"])], 6), abs=2e-6)


def test_pca_errors():
    tbl = pa.table({
        "vec_id": pa.array([0], type=pa.int64()),
        "embedding": pa.array([[1.0, 2.0]], type=pa.list_(pa.float32())),
    })
    one = rd.from_arrow(tbl)
    with pytest.raises(ValueError, match="at least 2 rows"):
        pca_fit(one, k=1)
    ds, _ = _make_ds(n=10, d=4)
    with pytest.raises(ValueError, match="out of range"):
        pca_fit(ds, k=9)


def test_grouped_dim_stats_matches_numpy():
    import numpy as np

    from saber_ray.stages.decompose import grouped_dim_stats

    rng = np.random.default_rng(9)
    n, d = 150, 6
    labels = rng.integers(0, 3, n).astype(np.int32)
    mat = rng.normal(size=(n, d)) + labels[:, None]  # shifted per group
    tbl = pa.table({
        "label": pa.array(labels),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
    })
    out = grouped_dim_stats(
        rd.from_arrow(tbl).repartition(5), group_column="label"
    ).to_pandas()
    mat64 = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    assert len(out) == 3 * d
    for g in range(3):
        sub = mat64[labels == g]
        rows = out[out["label"] == g].sort_values("dim")
        np.testing.assert_allclose(
            rows["mean"], np.round(sub.mean(axis=0), 6), atol=2e-6)
        np.testing.assert_allclose(
            rows["std"], np.round(sub.std(axis=0, ddof=1), 6), atol=2e-6)
    # single-row group: std is NULL; null labels are excluded
    tbl2 = pa.table({
        "label": pa.array([1, None], type=pa.int32()),
        "embedding": pa.array([[1.0, 2.0], [9.0, 9.0]],
                              type=pa.list_(pa.float32())),
    })
    out2 = grouped_dim_stats(rd.from_arrow(tbl2), group_column="label")
    assert out2.num_rows == 2
    assert not out2["std"][0].is_valid and not out2["std"][1].is_valid


def test_pca_on_testdata_embeddings():
    """End-to-end on the driver-generated table: the distributed sketch
    fit must equal a full in-memory numpy PCA of the same vectors."""
    import os

    import numpy as np

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/embeddings.parquet"):
        pytest.skip("testdata not present")
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    ds = rd.from_arrow(tbl).repartition(4)
    model = pca_fit(ds, k=5)
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    mean, evals, evecs = _numpy_pca(mat, 5)
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    np.testing.assert_allclose(model.eigenvalues, evals, rtol=1e-7)
    for i in range(5):
        assert abs(float(model.components[i] @ evecs[i])) == pytest.approx(
            1.0, abs=1e-7)
    assert model.n == tbl.num_rows
