"""PCA tests: covariance vs numpy, gram ≡ explode differential, power
iteration vs a numpy replay (identical arithmetic, identical start)."""

import numpy as np
import pytest

from pagerank_optimization_spark.operators.pca import (
    embedding_covariance,
    pca_top_component,
)


def _emb_df(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def xmat():
    rng = np.random.default_rng(42)
    # anisotropic: a dominant direction so power iteration converges fast
    base = rng.normal(size=(80, 8))
    base[:, 0] *= 6.0
    return np.float32(base)


def test_covariance_matches_numpy(spark, xmat):
    df = _emb_df(spark, xmat)
    got = {(r.i, r.j): r.cov for r in embedding_covariance(df).collect()}
    x = np.float64(np.float32(xmat))  # the float32 parquet round-trip
    want = np.cov(x, rowvar=False, bias=True)  # population covariance
    assert len(got) == 64
    for (i, j), c in got.items():
        assert abs(c - want[i, j]) < 1e-9, (i, j)


def test_gram_path_equals_explode_path(spark, xmat):
    df = _emb_df(spark, xmat).repartition(4)
    a = {(r.i, r.j): r.cov for r in embedding_covariance(df, method="explode").collect()}
    b = {(r.i, r.j): r.cov for r in embedding_covariance(df, method="gram").collect()}
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, k


@pytest.mark.parametrize("method", ["explode", "gram"])
def test_power_iteration_matches_numpy_replay(spark, xmat, method):
    df = _emb_df(spark, xmat)
    got = {r.pos: r.loading for r in pca_top_component(df, iters=3, method=method).collect()}
    x = np.float64(np.float32(xmat))
    cov = np.cov(x, rowvar=False, bias=True)
    v = np.full(cov.shape[0], 1.0 / np.sqrt(cov.shape[0]))
    for _ in range(3):
        v = cov @ v
        v = v / np.linalg.norm(v)
    assert set(got) == set(range(cov.shape[0]))
    for p in got:
        assert abs(got[p] - round(float(v[p]), 6)) < 1e-6, p
    # the planted dominant axis carries (almost) all the loading
    assert abs(got[0]) > 0.99


def test_pca_rejects_bad_params(spark, xmat):
    df = _emb_df(spark, xmat)
    with pytest.raises(ValueError):
        embedding_covariance(df, method="qr")
    with pytest.raises(ValueError):
        pca_top_component(df, iters=0)
