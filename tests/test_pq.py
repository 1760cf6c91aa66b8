"""Product quantization: numpy differential for the full train→encode→
ADC pipeline (iters=0 deterministic form), recall vs the exact baseline
on clustered data, Lloyd rounds reduce quantization error, codes shape,
and validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.similarity import (
    cosine_topk,
    pq_encode,
    pq_topk,
    pq_train,
)

QUERIES = [0, 7, 42]
K = 10
M_SUB, K_CODES = 4, 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def np_unit(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def _np_pq(ids, M, m_sub, k_codes):
    """iters=0 min_id reference: codebooks from the k_codes smallest ids,
    per-subspace argmin L2 assignment, ADC vs each query."""
    d = M.shape[1] // m_sub
    seed_rows = M[np.argsort(ids)[: k_codes]]  # ids sorted ascending
    books = [seed_rows[:, s * d : (s + 1) * d] for s in range(m_sub)]
    codes = np.zeros((len(ids), m_sub), dtype=int)
    for s in range(m_sub):
        X = M[:, s * d : (s + 1) * d]
        d2 = ((X[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = d2.argmin(1)  # numpy argmin = first min = min code
    return books, codes


def test_iters0_matches_numpy(emb, np_unit):
    ids, M = np_unit
    books, codes = _np_pq(ids, M, M_SUB, K_CODES)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(
            emb, pq_train(emb, m_sub=M_SUB, k_codes=K_CODES, iters=0, init="min_id")
        ).collect()
    }
    want = {int(i): list(codes[j]) for j, i in enumerate(ids)}
    mismatch = [i for i in want if got[i] != want[i]]
    assert not mismatch, f"{len(mismatch)} code rows differ, e.g. {mismatch[:3]}"


def test_adc_topk_matches_numpy(emb, np_unit):
    ids, M = np_unit
    books, codes = _np_pq(ids, M, M_SUB, K_CODES)
    d = M.shape[1] // M_SUB
    res = pq_topk(
        emb, QUERIES, k=K, m_sub=M_SUB, k_codes=K_CODES, iters=0, init="min_id"
    ).collect()
    for qid in QUERIES:
        qi = int(np.where(ids == qid)[0][0])
        adc = np.zeros(len(ids))
        for s in range(M_SUB):
            lut = books[s] @ M[qi, s * d : (s + 1) * d]
            adc += lut[codes[:, s]]
        order = sorted(
            (float(-a), int(i)) for a, i in zip(adc, ids) if i != qid
        )[:K]
        want = [(i, round(-a, 8)) for a, i in order]
        got = sorted(
            [(r["neighbor_id"], r["adc"]) for r in res if r["query_id"] == qid],
            key=lambda t: [x for x in res if x["query_id"] == qid and x["neighbor_id"] == t[0]][0]["rank"],
        )
        assert [g[0] for g in got] == [w[0] for w in want]
        assert np.allclose([g[1] for g in got], [w[1] for w in want], atol=1e-6)


def test_recall_on_clustered_data(spark):
    """PQ is a compression scheme: quantization blurs fine within-cluster
    ordering, so the standard metric (Jégou et al. §V: recall@R) is the
    exact top-k recovered within an ADC SHORTLIST of R > k — the
    candidate-generation contract of a production IVF-PQ (exact re-rank
    on the shortlist restores the final order)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(6, 64))
    rows = []
    for i in range(240):
        v = centers[i % 6] + 0.15 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = cosine_topk(emb, QUERIES, k=K).collect()
    shortlist = pq_topk(emb, QUERIES, k=3 * K, m_sub=8, k_codes=16, iters=2).collect()
    recalls = []
    for q in QUERIES:
        e = {r["neighbor_id"] for r in exact if r["query_id"] == q}
        a = {r["neighbor_id"] for r in shortlist if r["query_id"] == q}
        recalls.append(len(e & a) / K)
    assert np.mean(recalls) >= 0.7, f"PQ recall@{K} in top-{3 * K} too low: {recalls}"
    # and the shortlist's coarse structure is right: every shortlisted
    # neighbor shares the query's cluster far above chance
    same_cluster = [
        (r["neighbor_id"] % 6) == (r["query_id"] % 6) for r in shortlist
    ]
    assert np.mean(same_cluster) >= 0.8


def test_lloyd_reduces_quantization_error(emb, np_unit):
    ids, M = np_unit

    def err(books):
        d = M.shape[1] // M_SUB
        total = 0.0
        for s in range(M_SUB):
            X = M[:, s * d : (s + 1) * d]
            B = np.array(books[s])
            d2 = ((X[:, None, :] - B[None, :, :]) ** 2).sum(-1)
            total += d2.min(1).sum()
        return total

    b0 = pq_train(emb, m_sub=M_SUB, k_codes=K_CODES, iters=0)
    b2 = pq_train(emb, m_sub=M_SUB, k_codes=K_CODES, iters=2)
    assert err(b2) < err(b0)


def test_validation(emb):
    with pytest.raises(ValueError, match="divide"):
        pq_train(emb, m_sub=7, k_codes=4, iters=0)
    with pytest.raises(ValueError, match="k_codes"):
        pq_train(emb, m_sub=4, k_codes=0, iters=0)


def test_ivfpq_recall_and_exact_scores(spark):
    """The full IVF-PQ + re-rank composition: exact cosines in the output
    (re-rank restores ADC-blurred fine order) and recall at least at the
    probed-fraction level on clustered data."""
    from pagerank_optimization_spark.operators.similarity import ivfpq_topk

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(6, 64))
    rows = []
    for i in range(240):
        v = centers[i % 6] + 0.15 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = cosine_topk(emb, QUERIES, k=K).collect()
    got = ivfpq_topk(
        emb, QUERIES, k=K, n_centroids=6, nprobe=2, m_sub=8, k_codes=16,
        iters=2, rerank=3,
    ).collect()
    ex = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    recalls = []
    for q in QUERIES:
        e = {r["neighbor_id"] for r in exact if r["query_id"] == q}
        a = {r["neighbor_id"] for r in got if r["query_id"] == q}
        recalls.append(len(e & a) / K)
    assert np.mean(recalls) >= 0.6, f"IVF-PQ recall: {recalls}"
    # output cosines are EXACT: every overlap matches the brute-force value
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        if key in ex:
            assert abs(r["cosine"] - ex[key]) < 1e-9
