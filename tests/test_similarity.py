"""Similarity search tests: exact brute-force vs numpy oracle; LSH recall
measured against the exact baseline on the driver's embeddings table."""

import numpy as np
import pytest

from pagerank_optimization_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    lsh_topk,
)

QUERIES = [0, 7, 42]
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def np_oracle(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def _np_topk(ids, M, qid, k):
    qi = int(np.where(ids == qid)[0][0])
    sims = M @ M[qi]
    order = [
        (float(-s), int(i))
        for s, i in zip(sims, ids)
        if i != qid
    ]
    order.sort()
    return [(i, -s) for s, i in order[:k]]


def test_cosine_topk_matches_numpy(emb, np_oracle):
    ids, M = np_oracle
    got = cosine_topk(emb, QUERIES, k=K).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    for q in QUERIES:
        want = _np_topk(ids, M, q, K)
        rows = sorted(by_q[q])
        assert len(rows) == K
        for (rank, nid, cos), (wid, wcos) in zip(rows, want):
            assert abs(cos - wcos) < 1e-6
            # id may differ only on exact cosine ties
            if nid != wid:
                assert abs(cos - wcos) < 1e-8


def _recalls(exact_rows, approx_rows):
    exact_sets, approx_sets = {}, {}
    for r in exact_rows:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx_rows:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    return [len(exact_sets[q] & approx_sets.get(q, set())) / K for q in QUERIES]


def test_lsh_topk_recall(emb, np_oracle):
    exact = cosine_topk(emb, QUERIES, k=K).collect()
    approx = lsh_topk(emb, QUERIES, k=K, n_planes=4).collect()
    recalls = _recalls(exact, approx)
    # data-independent hyperplanes on clustered data: modest recall is
    # expected — the high-recall scale path is IVF (next test)
    assert np.mean(recalls) >= 0.25, f"mean LSH recall too low: {recalls}"


def test_ivf_topk_recall(emb, np_oracle):
    from pagerank_optimization_spark.operators.similarity import ivf_topk

    exact = cosine_topk(emb, QUERIES, k=K).collect()
    approx = ivf_topk(emb, QUERIES, k=K, n_centroids=8, nprobe=3).collect()
    recalls = _recalls(exact, approx)
    # the driver's embeddings are near-uniform on the sphere (top cosine
    # ≈ 0.33, labels uncorrelated with neighbors) — on structureless data
    # any partition-probing ANN has recall ≈ probed fraction (3/8 here).
    # Beating that fraction clearly (metric-aligned probing helps) is the
    # correct expectation; ≥0.9 recall would require clustered data.
    probed_fraction = 3 / 8
    assert np.mean(recalls) >= probed_fraction + 0.05, f"IVF recall {recalls}"


def test_ivf_dim512_clustered_recall(spark):
    """Real-embedding width: dim 512 with 3 Lloyd rounds. The Lloyd step
    aggregates via posexplode + groupBy(cid, pos), so the plan holds O(1)
    expressions regardless of dim — the previous per-dimension F.sum(unit[i])
    formulation was a 512-expression aggregate per round (plan-compile
    blowup at 768-4096, similarity.py). Clustered data so recall is a
    meaningful signal that training actually worked at this width."""
    from pagerank_optimization_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 512, 4, 60
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + 0.15 * rng.normal(size=(per, dim))
        for j, p in enumerate(pts):
            rows.append((c * per + j, [float(x) for x in p]))
    emb512 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = cosine_topk(emb512, QUERIES, k=K).collect()
    approx = ivf_topk(
        emb512, QUERIES, k=K, n_centroids=n_clusters, nprobe=2, iters=3
    ).collect()
    recalls = _recalls(exact, approx)
    assert np.mean(recalls) >= 0.6, f"dim-512 IVF recall too low: {recalls}"


def test_ivf_assign_plans_agree(emb):
    """The data-sized join-argmax assignment plan (production default,
    plan O(1) in k·dim) must reproduce the literal expression-tree plan
    (kept only for the DuckDB-twinned oracle query) row for row — same
    inverted lists, same top-k, same rounded cosines. Float fold order
    differs between the two plans, so agreement here also certifies the
    8-dp rounding absorbs it."""
    from pagerank_optimization_spark.operators.similarity import ivf_topk

    a = sorted(map(tuple, ivf_topk(
        emb, QUERIES, k=K, n_centroids=8, nprobe=3, iters=0, init="min_id",
        assign_plan="literal").collect()))
    b = sorted(map(tuple, ivf_topk(
        emb, QUERIES, k=K, n_centroids=8, nprobe=3, iters=0, init="min_id",
        assign_plan="join").collect()))
    assert a == b


def test_ivf_deterministic(emb):
    from pagerank_optimization_spark.operators.similarity import ivf_topk

    a = sorted(map(tuple, ivf_topk(emb, QUERIES, k=5).collect()))
    b = sorted(map(tuple, ivf_topk(emb, QUERIES, k=5).collect()))
    assert a == b


def test_embedding_neardup_exact_vs_numpy(emb, np_oracle):
    ids, M = np_oracle
    thr = 0.9
    got = {(r.a, r.b) for r in embedding_neardup_pairs(emb, threshold=thr, exact=True).collect()}
    S = M @ M.T
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and S[i, j] >= thr - 1e-12
    }
    assert got == want


def test_lsh_neardup_subset_of_exact(emb):
    thr = 0.9
    exact = {(r.a, r.b) for r in embedding_neardup_pairs(emb, threshold=thr, exact=True).collect()}
    approx = {(r.a, r.b) for r in embedding_neardup_pairs(emb, threshold=thr, n_planes=6).collect()}
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.3  # bucketing keeps decent recall


def test_quantized_topk_recall_vs_exact(spark, emb):
    """int8-quantized cosine top-k keeps high recall@10 vs the exact
    operator (quantization noise ~1/254 per coordinate) and scores stay
    within the quantization error envelope."""
    from pagerank_optimization_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_quantized,
    )

    qids = [0, 3, 9]
    exact = cosine_topk(emb, qids, k=10).collect()
    quant = cosine_topk_quantized(emb, qids, k=10).collect()
    ex = {}
    qu = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in quant:
        qu.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ex) == set(qu) == set(qids)
    recall = sum(len(ex[q] & qu[q]) for q in qids) / sum(len(ex[q]) for q in qids)
    assert recall >= 0.8, recall
    # score agreement on the intersection
    exv = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in quant:
        if (r.query_id, r.neighbor_id) in exv:
            assert abs(r.qcosine - exv[(r.query_id, r.neighbor_id)]) < 0.05
