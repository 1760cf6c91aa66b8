"""Cross-kernel differential: csr-blocks (vectorized Arrow/numpy) vs
join-agg (pure DataFrame) — the reference's REF/TST variant harness
(verify_op.c:196-254) with a deterministic input and a 1e-12 bar
(SURVEY.md §5 item 3).

Every test runs the CSR kernel in BOTH frontier modes: broadcast
(n ≤ BROADCAST_ROW_LIMIT zero-exchange path) and scale
(broadcast_frontier=False — the merge-join + frontier-shuffle path that
engages above 1M vertices on a cluster), so the 100 TB code path has the
same correctness signal as the small-graph one."""

import numpy as np
import pytest

from pagerank_optimization_spark.operators.graph_build import build_graph
from pagerank_optimization_spark.operators.pagerank import pagerank
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts
from tests import oracle

MODES = [True, False]  # broadcast-frontier / scale (merge-join) mode


@pytest.fixture(scope="module")
def graph(spark):
    transcripts = synthesize_transcripts(spark, 150, seed=11).cache()
    vertices, wedges = build_graph(transcripts)
    rows = [r.asDict() for r in transcripts.select("conv_id", "turn_idx", "role", "tool").collect()]
    o_edges = oracle.derive_edges(rows)
    o_vertices = oracle.vertices_of(rows, o_edges)
    return vertices.cache(), wedges.cache(), o_vertices, o_edges


def _d(df):
    return {r[0]: r[1] for r in df.collect()}


@pytest.mark.parametrize("bf", MODES)
def test_csr_kernel_matches_joinagg_fixed_k(graph, bf):
    vertices, wedges, _, _ = graph
    a = _d(pagerank(vertices, wedges, fixed_iters=4, partitions=8, kernel="join-agg").ranks)
    b = _d(
        pagerank(
            vertices, wedges, fixed_iters=4, partitions=8, kernel="csr-blocks",
            csr_broadcast_frontier=bf,
        ).ranks
    )
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], atol=1e-12)


@pytest.mark.parametrize("bf", MODES)
def test_csr_kernel_matches_numpy_converged(graph, bf):
    vertices, wedges, o_vertices, o_edges = graph
    res = pagerank(
        vertices, wedges, tol=1e-6, max_iter=100, partitions=8, kernel="csr-blocks",
        csr_broadcast_frontier=bf,
    )
    assert res.converged
    got = _d(res.ranks)
    want = oracle.pagerank_dense(o_vertices, o_edges, tol=1e-6, max_iter=100)
    ks = sorted(want)
    assert np.allclose([got[k] for k in ks], [want[k] for k in ks], atol=1e-6)


@pytest.mark.parametrize("bf", MODES)
def test_csr_kernel_partition_count_invariance(graph, bf):
    """Physical partitioning must not change the result (the reference's
    OpenMP reorder tolerance was 1e-4 because of float32; float64 bucketed
    sums agree to ~1e-15)."""
    vertices, wedges, _, _ = graph
    a = _d(
        pagerank(
            vertices, wedges, fixed_iters=3, partitions=3, kernel="csr-blocks",
            csr_broadcast_frontier=bf,
        ).ranks
    )
    b = _d(
        pagerank(
            vertices, wedges, fixed_iters=3, partitions=16, kernel="csr-blocks",
            csr_broadcast_frontier=bf,
        ).ranks
    )
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], atol=1e-12)


def test_csr_modes_agree_bitwise_on_personalized(graph):
    """The two frontier modes are the same math in the same FP order
    (vid-sorted/bucketed reductions) — they must agree to 1e-12 even with a
    personalized reset, the feature most likely to diverge across layouts."""
    from pyspark.sql import functions as F

    vertices, wedges, _, _ = graph
    reset = vertices.filter(F.col("entity").startswith("tool:")).withColumn(
        "weight", F.lit(1.0)
    )
    a = _d(
        pagerank(
            vertices, wedges, fixed_iters=5, partitions=8, kernel="csr-blocks",
            reset=reset, csr_broadcast_frontier=True,
        ).ranks
    )
    b = _d(
        pagerank(
            vertices, wedges, fixed_iters=5, partitions=8, kernel="csr-blocks",
            reset=reset, csr_broadcast_frontier=False,
        ).ranks
    )
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], atol=1e-12)
