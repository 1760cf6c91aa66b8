"""Tests for feature-hashed TF-IDF: a pure-python recompute (same hash,
same smoothed idf), zero-token handling, fixed dimension, and the
end-to-end text → vector → cosine-top-k loop through the similarity
family."""

import math

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.functions.text import POLY_H0, POLY_P
from pagerank_optimization_spark.operators.vectorize import hashed_tfidf

CORPUS = [
    (0, "spark shuffles data between stages"),
    (1, "spark caches data in memory"),
    (2, "ducks swim on the quiet pond"),
    (3, ""),  # zero tokens
]


def _poly(s: str) -> int:
    h = POLY_H0
    for ch in s:
        h = (h * 31 + ord(ch)) % POLY_P
    return h


def _python_tfidf(corpus, dim):
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(corpus)
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        v = [0.0] * dim
        for t in ts:
            idf = math.log((n + 1) / (df[t] + 1)) + 1
            v[_poly(t) % dim] += idf
        out[i] = v
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


def test_matches_python_recompute(docs):
    got = {r.doc_id: list(r.vector) for r in hashed_tfidf(docs, 16).collect()}
    want = _python_tfidf(CORPUS, 16)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_dimension_and_zero_doc(docs):
    got = {r.doc_id: list(r.vector) for r in hashed_tfidf(docs, 8).collect()}
    assert all(len(v) == 8 for v in got.values())
    assert got[3] == [0.0] * 8


def test_feeds_similarity_family(docs, spark):
    from pagerank_optimization_spark.operators.similarity import cosine_topk

    vecs = hashed_tfidf(docs.where(F.col("doc_id") < 3), 16).withColumnRenamed(
        "doc_id", "vec_id"
    )
    top = cosine_topk(vecs, query_ids=[0], k=2, id_col="vec_id", vec_col="vector")
    ranked = [r.neighbor_id for r in top.orderBy("rank").collect()]
    # doc 1 shares "spark"/"data" with doc 0; doc 2 shares nothing
    assert ranked[0] == 1


def test_validation(docs):
    with pytest.raises(ValueError):
        hashed_tfidf(docs, 0)


def test_quantize_embeddings_matches_numpy(spark):
    import numpy as np

    from pagerank_optimization_spark.operators.vectorize import quantize_embeddings

    rng = np.random.default_rng(3)
    x = np.float32(rng.normal(size=(40, 16)) * 5)
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(x)]
    rows.append((999, [0.0] * 16))  # all-zero guard
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for i, rvec in enumerate(np.float64(x)):
        scale = np.abs(rvec).max() / 127.0
        q = np.floor(rvec / scale + 0.5)
        err = rvec - q * scale
        r = got[i]
        assert abs(r.scale - round(scale, 8)) < 1e-12
        assert abs(r.mse - round(float((err ** 2).mean()), 8)) < 1e-12
        assert abs(r.linf - round(float(np.abs(err).max()), 8)) < 1e-12
        # int8 reconstruction is within half a quantization step
        assert r.linf <= scale / 2 + 1e-12
    z = got[999]
    assert (z.scale, z.mse, z.linf) == (0.0, 0.0, 0.0)
