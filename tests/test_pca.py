"""PCA over embedding columns (operators/pca.py): exactness vs a
driver-side numpy reference, variance ordering, determinism across
partitionings, artifact round-trip, projection plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from wc_vector_indexing_spark.operators.pca import PCAModel, project_pca


def _vecs(n=60, d=6, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: variance concentrated in the first directions
    scales = np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.1])[:d]
    x = rng.normal(size=(n, d)) * scales + rng.normal(size=d)
    return x.astype(np.float64)


def _df(spark, x):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
    )


def _ref_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comps = evecs[:, order[:k]].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order[:k]]


def test_fit_matches_numpy_reference(spark):
    x = _vecs()
    m = PCAModel.fit(_df(spark, x), k=3)
    mean, comps, evals = _ref_pca(x, 3)
    np.testing.assert_allclose(m.mean, mean, atol=1e-9)
    np.testing.assert_allclose(m.components, comps, atol=1e-8)
    np.testing.assert_allclose(m.explained_variance, evals, atol=1e-8)


def test_variance_ordering_and_ratio(spark):
    x = _vecs()
    m = PCAModel.fit(_df(spark, x), k=4)
    ev = m.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert 0.9 < m.explained_ratio() <= 1.0  # scales 10,5,2,1 dominate
    full = PCAModel.fit(_df(spark, x), k=6)
    assert full.explained_ratio() == pytest.approx(1.0, abs=1e-9)


def test_partitioning_invariance(spark):
    # moment sums are associative: 1-partition and 8-partition fits agree
    x = _vecs()
    df = _df(spark, x)
    a = PCAModel.fit(df.coalesce(1), k=3)
    b = PCAModel.fit(df.repartition(8), k=3)
    np.testing.assert_allclose(a.components, b.components, atol=1e-9)
    np.testing.assert_allclose(a.explained_variance, b.explained_variance, atol=1e-9)


def test_projection_matches_reference(spark):
    x = _vecs()
    m = PCAModel.fit(_df(spark, x), k=3)
    got = {
        r.vec_id: np.array(r.pca)
        for r in project_pca(_df(spark, x), m).select("vec_id", "pca").collect()
    }
    want = (x - m.mean) @ m.components.T
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-5, atol=1e-5)


def test_projection_is_map_only(spark):
    x = _vecs(n=10)
    m = PCAModel.fit(_df(spark, x), k=2)
    plan = (
        project_pca(_df(spark, x), m)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_artifact_round_trip(spark, tmp_path):
    x = _vecs(n=20)
    df = _df(spark, x)
    path = str(tmp_path / "pca.json")
    m1 = PCAModel.fit_or_load(path, df, k=2)
    m2 = PCAModel.fit_or_load(path, df.limit(3), k=2)  # must load, not refit
    np.testing.assert_array_equal(m1.components, m2.components)


def test_too_few_rows_raises(spark):
    with pytest.raises(ValueError):
        PCAModel.fit(_df(spark, _vecs(n=1)), k=1)
